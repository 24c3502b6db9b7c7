"""WARC parsing (functions/warc.py): framing, gzip member splitting,
HTTP extraction, malformed-stream errors, Spark explode."""

import pytest

from xorq_spark.functions.warc import warc_build, warc_parse


def _fixture():
    return [
        {"type": "warcinfo", "body": "software: fixture\r\n"},
        {
            "type": "response",
            "uri": "http://example.com/a",
            "body": "hello <b>world</b>",
            "http_status": 200,
        },
        {"type": "request", "uri": "http://example.com/a",
         "body": "GET /a HTTP/1.1\r\n\r\n"},
        {"type": "response", "uri": "http://example.com/b",
         "body": "x" * 300, "http_status": 404},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    out = warc_parse(warc_build(_fixture(), per_record_gzip=gz))
    assert [r["warc_type"] for r in out] == [
        "warcinfo", "response", "request", "response"
    ]
    assert out[1]["http_status"] == 200
    assert out[1]["body"] == b"hello <b>world</b>"
    assert out[3]["http_status"] == 404 and len(out[3]["body"]) == 300
    assert out[0]["target_uri"] is None
    assert out[2]["body"].startswith(b"GET /a")  # non-response: raw payload


def test_body_may_contain_record_like_bytes():
    # Content-Length framing must win over content sniffing: a body that
    # CONTAINS "WARC/1.0" and blank lines is still one record
    evil = "WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\ntrailing"
    out = warc_parse(warc_build([
        {"type": "response", "uri": "u", "body": evil},
        {"type": "response", "uri": "v", "body": "ok"},
    ]))
    assert len(out) == 2
    assert out[0]["body"].decode() == evil and out[1]["body"] == b"ok"


def test_truncated_and_malformed_errors():
    data = warc_build(_fixture())
    with pytest.raises(ValueError, match="truncated|unterminated"):
        warc_parse(data[: len(data) - 40])
    with pytest.raises(ValueError, match="version line"):
        warc_parse(b"NOT A WARC\r\n\r\n")
    gz = warc_build(_fixture(), per_record_gzip=True)
    with pytest.raises(ValueError, match="gzip"):
        warc_parse(gz[: len(gz) // 2])


def test_spark_explode(spark):
    import pyspark.sql.functions as F

    from xorq_spark.functions.warc import parse_warc_records, synth_warc_assets

    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    recs = parse_warc_records(synth_warc_assets(ids))
    rows = recs.orderBy("doc_id", "rec_idx").collect()
    # 1 warcinfo + 1 + id%3 responses per archive
    assert len(rows) == sum(1 + 1 + i % 3 for i in range(8))
    r = [x for x in rows if x["doc_id"] == 3 and x["rec_idx"] == 1][0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://ex.test/3/0"
    assert r["body_text"].startswith("page 3-0 ")


def test_corrupt_gzip_member_is_clean_error():
    """Round-8 ADVICE fix: a CORRUPT (not merely truncated) gzip member
    wraps zlib.error into the module's 'corrupt WARC' ValueError."""
    gz = bytearray(warc_build(_fixture(), per_record_gzip=True))
    gz[12] ^= 0xFF  # flip a deflate-stream byte inside the first member
    with pytest.raises(ValueError, match="corrupt WARC"):
        warc_parse(bytes(gz))
