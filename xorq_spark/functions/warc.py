"""WARC (Web ARChive, ISO 28500) record parsing — the ingestion format
of Common Crawl and every serious web-scale training corpus.

Pure-stdlib: a WARC file is concatenated records, each
``WARC/1.x\\r\\n`` + header lines + ``\\r\\n`` + Content-Length payload
bytes + ``\\r\\n\\r\\n``; production crawls store one gzip member PER
RECORD (so readers can seek), which stdlib zlib unwraps member-by-
member. Response records carry an HTTP message as payload; the body
after the HTTP header block is what a text pipeline ingests.

Spark-side, `parse_warc_records` explodes binary WARC payloads into
typed record rows inside Arrow-batched mapInPandas — the same worker
shape as the image/audio codecs. At 100 TB the cost is dominated by
payload I/O; each record parse is microseconds of header scanning plus
the gzip inflate the format requires anyway.

A builder (`warc_build`) synthesizes spec-shaped fixtures (plain and
per-record-gzip) so tests and the certified query exercise real parsing
against closed-form oracles, never stored literals.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


# ---------------------------------------------------------------------------
# builder (fixtures + re-archive path)
# ---------------------------------------------------------------------------


def warc_build(records: List[Dict], per_record_gzip: bool = False) -> bytes:
    """Serialize records ({type, uri, body, http_status?, headers?}) as
    a WARC/1.0 byte stream; with `per_record_gzip` each record becomes
    its own gzip member (the Common Crawl layout)."""
    out = bytearray()
    for i, rec in enumerate(records):
        body = rec.get("body", b"")
        if isinstance(body, str):
            body = body.encode("utf-8")
        rtype = rec.get("type", "response")
        if rtype == "response":
            status = int(rec.get("http_status", 200))
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                "Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
        else:
            http = body
        headers = [
            ("WARC-Type", rtype),
            ("WARC-Record-ID", f"<urn:uuid:fixture-{i:08d}>"),
            ("WARC-Date", rec.get("date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(http))),
        ]
        if rec.get("uri"):
            headers.insert(2, ("WARC-Target-URI", rec["uri"]))
        if rtype == "response":
            headers.append(
                ("Content-Type", "application/http; msgtype=response")
            )
        for k, v in (rec.get("headers") or {}).items():
            headers.append((k, v))
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
        ) + b"\r\n"
        record = head + http + b"\r\n\r\n"
        if per_record_gzip:
            buf = io.BytesIO()
            # mtime=0 keeps fixtures byte-deterministic across runs
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out += buf.getvalue()
        else:
            out += record
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _gunzip_members(data: bytes) -> bytes:
    """Inflate concatenated gzip members (one per record in crawl
    archives) into one plain stream."""
    out = bytearray()
    rest = data
    while rest:
        d = zlib.decompressobj(47)  # gzip wrapper
        try:
            out += d.decompress(rest)
            out += d.flush()
        except (zlib.error, OSError, EOFError) as exc:
            raise ValueError(f"corrupt WARC: bad gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("corrupt WARC: truncated gzip member")
        rest = d.unused_data
    return bytes(out)


def warc_parse(data: bytes) -> List[Dict]:
    """Parse a WARC byte stream (plain or per-record gzip) into record
    dicts: (warc_type, target_uri, record_id, content_length,
    http_status, body) — body is the HTTP payload after its header
    block for response records, the raw payload otherwise."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: List[Dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        eol = data.find(b"\r\n", pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"corrupt WARC: expected version line at offset {pos}"
            )
        pos = eol + 2
        headers: Dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("corrupt WARC: unterminated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode("utf-8").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("corrupt WARC: missing/invalid Content-Length")
        payload = data[pos : pos + clen]
        if len(payload) != clen:
            raise ValueError("corrupt WARC: truncated record payload")
        pos += clen
        rtype = headers.get("warc-type", "")
        status: Optional[int] = None
        body = payload
        if rtype == "response" and payload[:5] == b"HTTP/":
            head_end = payload.find(b"\r\n\r\n")
            if head_end >= 0:
                status_line = payload[: payload.find(b"\r\n")]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = payload[head_end + 4 :]
        records.append(
            {
                "warc_type": rtype,
                "target_uri": headers.get("warc-target-uri"),
                "record_id": headers.get("warc-record-id"),
                "content_length": clen,
                "http_status": status,
                "body": body,
            }
        )
    if not records:
        raise ValueError("corrupt WARC: no records")
    return records


WARC_RECORDS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("http_status", IntegerType()),
        StructField("body_chars", LongType()),
        StructField("body_text", StringType()),
    ]
)


def parse_warc_records(
    archives: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Explode binary WARC archives into one row per record
    (doc_id, rec_idx, warc_type, target_uri, http_status, body_chars,
    body_text) — the Common Crawl ingestion step, Arrow-batched."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows: List[Tuple] = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, rec in enumerate(warc_parse(bytes(payload))):
                    text = rec["body"].decode("utf-8", "replace")
                    rows.append(
                        (
                            int(did),
                            i,
                            rec["warc_type"],
                            rec["target_uri"],
                            rec["http_status"],
                            len(text),
                            text,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "rec_idx", "warc_type", "target_uri",
                    "http_status", "body_chars", "body_text",
                ],
            )

    return archives.select(id_col, payload_col).mapInPandas(
        batches, WARC_RECORDS_SCHEMA
    )


def synth_warc_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WARC fixture generator: for each id an archive of
    one warcinfo record plus 1 + id%3 response records; response r has
    uri http://ex.test/{id}/{r}, HTTP status 200 unless (id+r)%5 == 0
    (then 404), and body 'page {id}-{r} ' repeated 3 + (id+r)%4 times.
    Odd ids serialize with per-record gzip members (the Common Crawl
    layout), so both physical layouts are on the certified path."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                recs: List[Dict] = [
                    {"type": "warcinfo", "body": "software: fixture\r\n"}
                ]
                for r in range(1 + i % 3):
                    recs.append(
                        {
                            "type": "response",
                            "uri": f"http://ex.test/{i}/{r}",
                            "http_status": 404 if (i + r) % 5 == 0 else 200,
                            "body": f"page {i}-{r} " * (3 + (i + r) % 4),
                        }
                    )
                payloads.append(
                    warc_build(recs, per_record_gzip=(i % 2 == 1))
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return ids.mapInPandas(batches, "doc_id long, payload binary")
