"""Compressed-payload ingestion — magic-byte sniffing + stdlib
decompression for the three stream formats public corpora actually
ship: gzip (WET/WAT dumps, log shards — including MULTI-MEMBER
streams from appended files), bzip2 (Wikipedia dumps) and xz
(archived corpora, source tarballs). The container tier (warc.py /
webdataset.py / ziparchive.py) handles records-inside-archives; this
tier handles the whole-payload compression wrapped around plain
documents.

Honest scope:
- REAL format detection from magic bytes (``1f 8b`` gzip, ``BZh``
  bzip2, ``fd 37 7a 58 5a 00`` xz) and REAL decompression via stdlib
  gzip/bz2/lzma — all three handle concatenated multi-stream inputs,
  and the gzip fixtures exercise that (two members per payload on
  every sixth asset).
- NAMED GATES: zstd (``28 b5 2f fd``) raises NotImplementedError by
  name — no stdlib decoder in this interpreter; lz4 frame
  (``04 22 4d 18``) likewise. Unknown magic or a truncated/corrupt
  stream raises ValueError naming the defect (a silently-skipped
  payload would under-count a corpus).

Reference parity: the reference reads compressed files only through
format readers; explicit payload-level sniff+decompress is
LLM-pipeline territory (Common Crawl WET shards, dump ingestion).
"""

from __future__ import annotations

import bz2
import gzip
import lzma
from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "sniff_compression",
    "decompress_auto",
    "parse_compressed_docs",
    "synth_compressed_assets",
]


def sniff_compression(data: bytes) -> str:
    """Identify the compression format from magic bytes. Returns one
    of 'gzip' / 'bz2' / 'xz'; zstd and lz4 raise NotImplementedError
    by name; anything else raises ValueError."""
    if data[:2] == b"\x1f\x8b":
        return "gzip"
    if data[:3] == b"BZh":
        return "bz2"
    if data[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if data[:4] == b"\x28\xb5\x2f\xfd":
        raise NotImplementedError(
            "unsupported compression: zstd (no stdlib decoder)"
        )
    if data[:4] == b"\x04\x22\x4d\x18":
        raise NotImplementedError(
            "unsupported compression: lz4 frame (no stdlib decoder)"
        )
    raise ValueError(
        f"unknown compression magic: {data[:6]!r} (not gzip/bz2/xz)"
    )


def decompress_auto(data: bytes) -> Tuple[str, bytes]:
    """Sniff and decompress. All three stdlib decoders accept
    concatenated multi-stream inputs (the appended-file shape).
    Corrupt streams raise ValueError naming the format."""
    fmt = sniff_compression(data)
    try:
        if fmt == "gzip":
            return fmt, gzip.decompress(data)
        if fmt == "bz2":
            return fmt, bz2.decompress(data)
        return fmt, lzma.decompress(data)
    except (OSError, EOFError, lzma.LZMAError) as exc:
        raise ValueError(f"corrupt {fmt} stream: {exc}") from exc


COMPRESSED_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("n_raw_bytes", LongType()),
        StructField("body_text", StringType()),
    ]
)


def parse_compressed_docs(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Sniff + decompress binary payloads into
    (doc_id, fmt, n_raw_bytes, body_text). The fmt column comes from
    the DETECTOR, not from any metadata column — certifying the sniff
    itself. Arrow-batched mapInPandas, no shuffle."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, raw = decompress_auto(bytes(payload))
                rows.append(
                    (int(did), fmt, len(raw), raw.decode("utf-8"))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in COMPRESSED_DOC_SCHEMA]
            )

    return payloads.select(id_col, payload_col).mapInPandas(
        batches, COMPRESSED_DOC_SCHEMA
    )


def synth_compressed_assets(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic compressed fixture generator: doc i carries
    2+i%5 repetitive lines (they genuinely compress), wrapped as
    gzip / bz2 / xz by i%3; every sixth doc's gzip payload is TWO
    concatenated members (the appended-log shape)."""
    import pandas as pd

    def body(i: int) -> str:
        return "".join(
            f"data {i} line {l} " * (1 + (i + l) % 3) + "\n"
            for l in range(2 + i % 5)
        )

    def gz(s: str) -> bytes:
        return gzip.compress(s.encode("utf-8"), mtime=0)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                text = body(i)
                if i % 3 == 0:
                    if i % 6 == 0 and len(text) > 4:
                        half = len(text) // 2
                        payloads.append(gz(text[:half]) + gz(text[half:]))
                    else:
                        payloads.append(gz(text))
                elif i % 3 == 1:
                    payloads.append(bz2.compress(text.encode("utf-8")))
                else:
                    payloads.append(lzma.compress(text.encode("utf-8")))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return ids.mapInPandas(batches, "doc_id long, payload binary")
