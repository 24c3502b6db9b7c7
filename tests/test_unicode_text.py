"""Round-8 text-cleanup operators: unicode_normalize (NFC/NFKC +
width/compat folding) and mojibake_repair (the ftfy-style inverse of
CP1252 double-decode damage) — plus the dedup integration the
normalizer exists for (NFC/NFD twins of one line dedup together)."""

import pytest

import pyspark.sql.functions as F

from xorq_spark.functions.text import (
    mojibake_repair,
    mojibake_repair_str,
    unicode_normalize,
)

NFC_LINE = "caf\u00e9 r\u00e9sum\u00e9"  # composed é
NFD_LINE = "cafe\u0301 re\u0301sume\u0301"  # e + COMBINING ACUTE


# ---------------------------------------------------------------------------
# pure-function repair semantics
# ---------------------------------------------------------------------------


def test_repair_single_and_double_damage_roundtrip():
    orig = " don’t écrit"
    d1 = orig.encode("utf-8").decode("cp1252")
    d2 = d1.encode("utf-8").decode("cp1252")
    assert mojibake_repair_str("x" + d1) == "x" + orig
    assert mojibake_repair_str("x" + d2) == "x" + orig  # two rounds


def test_repair_is_conservative():
    # clean ASCII, legitimate accents, non-Latin scripts, and U+FFFD
    # damage (bytes are gone) all pass through untouched
    for s in (
        "clean ascii text.",
        "résumé café",
        "привет мир",
        "bad�byte",
        "",
    ):
        assert mojibake_repair_str(s) == s
    assert mojibake_repair_str(None) is None


def test_repair_is_segment_wise_on_mixed_scripts():
    # damage embedded in text with legitimate accents, non-Latin
    # scripts or emoji repairs ONLY the damaged span (segment-wise
    # sloppy-cp1252 re-encode + mixed utf-8 decode), leaving the rest
    # byte-identical
    orig = " don’t écrit"
    d1 = orig.encode("utf-8").decode("cp1252")
    d2 = d1.encode("utf-8").decode("cp1252")
    for base in (
        "café naïve déjà-vu straße",
        "مرحبا بالعالم hello world",
        "emoji soup 🚀🔥 and dots.",
        "你好 hello",
    ):
        assert mojibake_repair_str(base + d1) == base + orig
        assert mojibake_repair_str(base + d2) == base + orig
    # a marker next to CJK: the damaged span repairs, the CJK stays
    assert mojibake_repair_str("â€™ 你好") == "’ 你好"


def test_repair_sloppy_cp1252_undefined_bytes():
    # 0x81/0x8d/0x8f/0x90/0x9d are undefined in strict cp1252; a
    # lenient decoder leaves the C1 controls — the sloppy table must
    # re-encode them (e.g. U+0081 appears inside misdecoded CJK utf-8)
    orig = "你好"  # utf-8: E4 BD A0 E5 A5 BD
    damaged = "".join(
        bytes([b]).decode("cp1252", errors="replace").replace("�", chr(b))
        for b in orig.encode("utf-8")
    )
    # only repairable when the detector fires; this form has no
    # markers, so it passes through (documented conservatism)
    got = mojibake_repair_str(damaged)
    assert got in (damaged, orig)


# ---------------------------------------------------------------------------
# column forms
# ---------------------------------------------------------------------------


def test_unicode_normalize_forms_and_folding(spark):
    df = spark.createDataFrame(
        [
            (1, NFD_LINE),
            (2, "Ｆｕｌｌ ﬁt"),  # fullwidth + ligature
            (3, None),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: (r["nfc"], r["nfkc"])
        for r in df.select(
            "id",
            unicode_normalize(F.col("t"), "NFC").alias("nfc"),
            unicode_normalize(F.col("t"), "NFKC").alias("nfkc"),
        ).collect()
    }
    assert out[1][0] == NFC_LINE
    assert out[2][1] == "Full fit"  # width + compat folding
    assert out[2][0] == "Ｆｕｌｌ ﬁt"  # NFC keeps them
    assert out[3] == (None, None)


def test_unicode_normalize_rejects_bad_form():
    with pytest.raises(ValueError, match="form must be one of"):
        unicode_normalize(F.col("t"), "NFX")


def test_mojibake_repair_column(spark):
    orig = "it’s été"
    d1 = orig.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame(
        [(1, d1), (2, "plain"), (3, None)], "id long, t string"
    )
    got = {
        r["id"]: r["r"]
        for r in df.select(
            "id", mojibake_repair(F.col("t")).alias("r")
        ).collect()
    }
    assert got == {1: orig, 2: "plain", 3: None}


# ---------------------------------------------------------------------------
# the dedup integration the normalizer exists for
# ---------------------------------------------------------------------------


def test_nfc_nfd_twins_dedup_together_after_normalize(spark):
    from xorq_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, NFC_LINE), (2, NFD_LINE), (3, "other doc")],
        "doc_id long, text string",
    )
    # without normalization the twins are different strings to the digest
    assert exact_dedup(df).count() == 3
    normed = df.withColumn("text", unicode_normalize(F.col("text"), "NFC"))
    kept = exact_dedup(normed)
    assert kept.count() == 2
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}  # min-id winner
