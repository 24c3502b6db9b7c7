"""ZIP archive ingestion — the third container format next to WARC
(warc.py) and WebDataset tar shards (webdataset.py): dataset dumps,
Kaggle exports and scraped-document bundles overwhelmingly ship as
.zip.

Pure-stdlib `zipfile` over a BytesIO: central-directory walk (the
authoritative member list — local headers alone under-count when a zip
was appended to), per-member DEFLATE/stored decode, CRC verification
by the stdlib reader. Directory entries are skipped; encrypted members
raise by name (a silently-skipped member would under-count a corpus).

Spark-side, `parse_zip_members` explodes binary archives into one row
per member inside Arrow-batched mapInPandas (the warc.py shape); a
deterministic builder synthesizes fixtures with both stored and
deflated members so the certified query exercises real decompression.
"""

from __future__ import annotations

import io
import zipfile
from typing import Dict, Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def zip_build(members: List[Tuple[str, bytes]], deflate: bool = True) -> bytes:
    """Serialize (name, payload) members as a deterministic zip (fixed
    1980-01-01 timestamps); `deflate` toggles DEFLATE vs stored."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if deflate else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, payload in members:
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, payload)
    return buf.getvalue()


def zip_parse(data: bytes) -> List[Dict]:
    """Parse a zip into member dicts (name, compressed_size, payload)
    in central-directory order; encrypted members raise by name."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            out: List[Dict] = []
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if info.flag_bits & 0x1:
                    raise ValueError(
                        f"unsupported zip: member {info.filename!r} is "
                        "encrypted"
                    )
                out.append(
                    {
                        "name": info.filename,
                        "compressed_size": info.compress_size,
                        "payload": zf.read(info),
                    }
                )
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt zip: {exc}") from exc
    if not out:
        raise ValueError("corrupt zip: no file members")
    return out


ZIP_MEMBERS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("member_idx", IntegerType()),
        StructField("name", StringType()),
        StructField("n_bytes", LongType()),
        StructField("body_text", StringType()),
    ]
)


def parse_zip_members(
    archives: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Explode binary zip archives into one row per member
    (doc_id, member_idx, name, n_bytes, body_text)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows: List[Tuple] = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, m in enumerate(zip_parse(bytes(payload))):
                    rows.append(
                        (
                            int(did),
                            i,
                            m["name"],
                            len(m["payload"]),
                            m["payload"].decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "member_idx", "name", "n_bytes", "body_text"],
            )

    return archives.select(id_col, payload_col).mapInPandas(
        batches, ZIP_MEMBERS_SCHEMA
    )


def synth_zip_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic zip fixture generator: for each id an archive of
    1 + id%4 members; member m is docs/{id:04d}/{m:02d}.txt with body
    'chunk {id}-{m} ' * (2 + (id+m)%5). Even ids DEFLATE (repetitive
    bodies genuinely compress), odd ids store."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                members = [
                    (
                        f"docs/{i:04d}/{m:02d}.txt",
                        f"chunk {i}-{m} " * (2 + (i + m) % 5),
                    )
                    for m in range(1 + i % 4)
                ]
                payloads.append(zip_build(members, deflate=(i % 2 == 0)))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return ids.mapInPandas(batches, "doc_id long, payload binary")
