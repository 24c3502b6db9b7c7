"""ZIP ingestion (functions/ziparchive.py): central-directory walk,
DEFLATE + stored members, determinism, errors, Spark explode."""

import pytest

from xorq_spark.functions.ziparchive import zip_build, zip_parse


@pytest.mark.parametrize("deflate", [True, False])
def test_roundtrip(deflate):
    ms = [("docs/a.txt", "hello " * 50), ("docs/b.bin", b"\x00\x01" * 300)]
    out = zip_parse(zip_build(ms, deflate=deflate))
    assert [m["name"] for m in out] == ["docs/a.txt", "docs/b.bin"]
    assert out[0]["payload"] == b"hello " * 50
    if deflate:
        assert out[0]["compressed_size"] < 300  # genuinely compressed


def test_deterministic_bytes():
    ms = [("a.txt", "x" * 100)]
    assert zip_build(ms) == zip_build(ms)


def test_corrupt_and_encrypted_are_clean_errors():
    with pytest.raises(ValueError, match="corrupt zip"):
        zip_parse(b"PK\x03\x04garbage")
    good = bytearray(zip_build([("a.txt", "secret")], deflate=False))
    # flip the encryption flag bit in the local + central headers
    i = good.index(b"PK\x03\x04") + 6
    good[i] |= 1
    j = good.index(b"PK\x01\x02") + 8
    good[j] |= 1
    with pytest.raises(ValueError, match="encrypted"):
        zip_parse(bytes(good))


def test_spark_explode(spark):
    import pyspark.sql.functions as F

    from xorq_spark.functions.ziparchive import (
        parse_zip_members,
        synth_zip_assets,
    )

    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    rows = parse_zip_members(synth_zip_assets(ids)).collect()
    assert len(rows) == sum(1 + i % 4 for i in range(8))
    r = [x for x in rows if x["doc_id"] == 7 and x["member_idx"] == 2][0]
    assert r["name"] == "docs/0007/02.txt"
    assert r["body_text"].startswith("chunk 7-2 ")
