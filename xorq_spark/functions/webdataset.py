"""WebDataset shard parsing — the tar-of-samples layout multimodal
training pipelines stream (image/caption/label members grouped by a
shared basename key inside plain .tar shards; the format behind
LAION-scale image-text training).

Pure-stdlib: tar via `tarfile` over a BytesIO, optional whole-shard
gzip via stdlib. A member `dir/key.ext` belongs to sample `dir/key`
with modality `ext` (the WebDataset convention: the LAST dot-suffix is
the modality, everything before it the sample key — keys may contain
dots). Members stream in sample order inside real shards; the parser
does not require it (it groups by key), but emits tar order so
sequential pipelines can assert locality.

Spark-side, `parse_webdataset` explodes binary shards into one row per
member inside Arrow-batched mapInPandas (the warc.py shape), and
`wds_samples` pivots members to one row per sample with a map of
modality -> bytes. A builder synthesizes spec-shaped shards for tests
and the certified query.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zlib
from typing import Dict, Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def wds_build(
    members: List[Tuple[str, bytes]], shard_gzip: bool = False
) -> bytes:
    """Serialize (name, payload) members as a deterministic tar shard
    (zeroed mtime/uid/gid so fixtures are byte-stable); with
    `shard_gzip`, gzip the whole shard (the .tar.gz transport layout)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(payload))
    data = buf.getvalue()
    if shard_gzip:
        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(data)
        return out.getvalue()
    return data


def split_key_ext(name: str) -> Tuple[str, str]:
    """WebDataset naming: the LAST dot-suffix is the modality, the rest
    the sample key ('00012/sample.a.jpg' -> ('00012/sample.a', 'jpg'))."""
    base, dot, ext = name.rpartition(".")
    if not dot:
        return name, ""
    return base, ext


def wds_parse(data: bytes) -> List[Dict]:
    """Parse a (possibly gzipped) tar shard into member dicts
    (name, sample_key, ext, payload) in tar order."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error) as exc:
            # gzip.BadGzipFile subclasses OSError; wrap everything the
            # inflate can raise so callers see ONE corrupt-shard error.
            raise ValueError(
                f"corrupt WebDataset shard: bad gzip transport: {exc}"
            ) from exc
    out: List[Dict] = []
    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
            for info in tf:
                if not info.isfile():
                    continue
                payload = tf.extractfile(info).read()
                key, ext = split_key_ext(info.name)
                out.append(
                    {
                        "name": info.name,
                        "sample_key": key,
                        "ext": ext,
                        "payload": payload,
                    }
                )
    except tarfile.TarError as exc:
        raise ValueError(f"corrupt WebDataset shard: {exc}") from exc
    if not out:
        raise ValueError("corrupt WebDataset shard: no file members")
    return out


WDS_MEMBERS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("member_idx", IntegerType()),
        StructField("sample_key", StringType()),
        StructField("ext", StringType()),
        StructField("n_bytes", LongType()),
        StructField("body_text", StringType()),
    ]
)


def parse_webdataset(
    shards: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Explode binary WebDataset tar shards into one row per member
    (doc_id, member_idx, sample_key, ext, n_bytes, body_text) — text
    members decode UTF-8 (replacement on binary), sizes are exact."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows: List[Tuple] = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, m in enumerate(wds_parse(bytes(payload))):
                    rows.append(
                        (
                            int(did),
                            i,
                            m["sample_key"],
                            m["ext"],
                            len(m["payload"]),
                            m["payload"].decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "member_idx", "sample_key", "ext",
                    "n_bytes", "body_text",
                ],
            )

    return shards.select(id_col, payload_col).mapInPandas(
        batches, WDS_MEMBERS_SCHEMA
    )


def wds_samples(members: DataFrame) -> DataFrame:
    """Pivot member rows to one row per sample:
    (doc_id, sample_key, n_members, exts sorted csv, total_bytes) —
    the per-sample completeness view a loader validates before
    training (a sample missing its .cls/.txt pair is a broken shard)."""
    import pyspark.sql.functions as F

    return members.groupBy("doc_id", "sample_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.array_join(F.array_sort(F.collect_list("ext")), ",").alias("exts"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )


def synth_wds_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WebDataset fixture generator: for each id a shard
    of 1 + id%3 samples; sample s carries members
    {key}.txt = 'caption {id}-{s} ' * (2 + (id+s)%3) and
    {key}.cls = str((id+s) % 10), key = '{id:05d}/{s:03d}'. Odd ids
    gzip the whole shard (.tar.gz transport)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                members: List[Tuple[str, bytes]] = []
                for s in range(1 + i % 3):
                    key = f"{i:05d}/{s:03d}"
                    members.append(
                        (f"{key}.txt",
                         f"caption {i}-{s} " * (2 + (i + s) % 3))
                    )
                    members.append((f"{key}.cls", str((i + s) % 10)))
                payloads.append(wds_build(members, shard_gzip=(i % 2 == 1)))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return ids.mapInPandas(batches, "doc_id long, payload binary")
