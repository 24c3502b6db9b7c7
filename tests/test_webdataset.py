"""WebDataset tar-shard parsing (functions/webdataset.py): tar walk,
key/ext convention, gzip transport, per-sample pivot, errors."""

import pytest

from xorq_spark.functions.webdataset import (
    split_key_ext,
    wds_build,
    wds_parse,
)


def test_key_ext_convention():
    assert split_key_ext("000/abc.txt") == ("000/abc", "txt")
    assert split_key_ext("000/a.b.jpg") == ("000/a.b", "jpg")
    assert split_key_ext("plain") == ("plain", "")


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    ms = [
        ("00001/000.txt", "hello"),
        ("00001/000.cls", "3"),
        ("00001/001.jpg", b"\x00\x01\xff"),
        ("00001/001.txt", "x" * 1000),  # spans multiple 512-byte blocks
    ]
    out = wds_parse(wds_build(ms, shard_gzip=gz))
    assert [m["name"] for m in out] == [n for n, _ in ms]
    assert out[2]["payload"] == b"\x00\x01\xff"
    assert len(out[3]["payload"]) == 1000


def test_deterministic_bytes():
    ms = [("a/0.txt", "x")]
    assert wds_build(ms) == wds_build(ms)
    assert wds_build(ms, shard_gzip=True) == wds_build(ms, shard_gzip=True)


def test_malformed_is_clean_error():
    with pytest.raises(ValueError, match="WebDataset"):
        wds_parse(b"\x00" * 1024)
    good = wds_build([("a/0.txt", "x" * 600)])
    with pytest.raises(ValueError, match="WebDataset"):
        wds_parse(good[:700])  # truncated mid-member


def test_spark_explode_and_sample_pivot(spark):
    import pyspark.sql.functions as F

    from xorq_spark.functions.webdataset import (
        parse_webdataset,
        synth_wds_assets,
        wds_samples,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    members = parse_webdataset(synth_wds_assets(ids))
    rows = members.collect()
    assert len(rows) == sum(2 * (1 + i % 3) for i in range(6))
    samples = {
        (r["doc_id"], r["sample_key"]): r
        for r in wds_samples(members).collect()
    }
    # every sample is complete: exactly its caption + label pair
    assert all(
        r["n_members"] == 2 and r["exts"] == "cls,txt"
        for r in samples.values()
    )


def test_corrupt_gzip_transport_is_clean_error():
    """Round-8 ADVICE fix: BadGzipFile/zlib.error from the gzip
    transport wrap into the module's 'corrupt WebDataset' ValueError."""
    good = wds_build([("a/0.txt", "x" * 600)], shard_gzip=True)
    bad = bytearray(good)
    bad[10] ^= 0xFF  # corrupt the deflate stream, keep the gzip magic
    with pytest.raises(ValueError, match="corrupt WebDataset"):
        wds_parse(bytes(bad))
