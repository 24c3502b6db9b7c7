"""Z-order layout: key correctness and the actual pruning effect —
z-ordered parquet files must carry materially tighter per-file min/max
ranges on EVERY clustered column than an unordered write."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

import pyspark.sql.functions as F

from xorq_spark.operators import z_value, zorder_by


def _interleave(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_python_model(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 1023) for y in (0, 3, 512, 1000)],
        "x long, y long",
    )
    rows = df.select(
        "x", "y", z_value([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _interleave(r["x"] & 1023, r["y"] & 1023, 10)


def test_z_value_null_and_overflow_guard(spark):
    df = spark.createDataFrame([(None, 7)], "x long, y long")
    [r] = df.select(z_value([F.col("x"), F.col("y")], bits=10).alias("z")).collect()
    assert r["z"] == _interleave(0, 7, 10)  # NULL ranks as 0
    with pytest.raises(ValueError):
        z_value([F.col("x"), F.col("y")], bits=32)  # 64 bits > 62


def _file_ranges(path: str, col: str):
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append(max(his) - min(los))
    return spans


def test_zorder_write_tightens_file_stats(spark, tmp_path):
    # two independent dimensions, shuffled row order
    df = (
        spark.range(40_000)
        .select(
            (F.col("id") * 48271 % 1021).alias("a"),
            (F.col("id") * 16807 % 1019).alias("b"),
        )
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartition(16).write.parquet(plain)
    # 16 z-range files = a 4x4 quadrant grid: each file should span
    # ~1/4 of the domain in EACH dimension simultaneously
    zorder_by(df, ["a", "b"], bits=10, num_partitions=16).write.parquet(zed)

    for col in ("a", "b"):
        base = sum(_file_ranges(plain, col))
        tight = sum(_file_ranges(zed, col))
        # every file in the unordered write spans ~the full domain; the
        # z-ordered write must cut the summed span at least in half on
        # BOTH dimensions simultaneously (observed ~0.25-0.35)
        assert tight < base / 2, (col, tight, base)


class TestCompactParquet:
    def test_compacts_small_files_atomically(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from xorq_spark.writes import compact_parquet

        path = str(tmp_path / "t")
        spark.range(10000).withColumn("v", F.col("id") * 2).repartition(
            16
        ).write.parquet(path)
        before = sorted(
            r["id"] for r in spark.read.parquet(path).collect()
        )
        stats = compact_parquet(spark, path, target_file_bytes=10**9)
        assert stats["files_before"] == 16 and stats["files_after"] == 1
        # data identical after rewrite
        after = sorted(r["id"] for r in spark.read.parquet(path).collect())
        assert after == before
        # idempotent: second call is a no-op
        stats2 = compact_parquet(spark, path, target_file_bytes=10**9)
        assert stats2["files_after"] == stats2["files_before"] == 1
        import os

        assert not [p for p in os.listdir(tmp_path) if ".old-" in p or ".compact-" in p]

    def test_sorted_compaction_clusters_ranges(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from xorq_spark.writes import compact_parquet

        path = str(tmp_path / "s")
        spark.range(20000).withColumn(
            "k", (F.col("id") * 2654435761 % 1000).cast("long")
        ).repartition(12).write.parquet(path)
        compact_parquet(
            spark, path, target_file_bytes=40_000, sort_by=("k",)
        )
        import os

        import pyarrow.parquet as pq

        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert 1 < len(files) < 12
        # range-partitioned + sorted: per-file k spans must not overlap
        spans = []
        for f in files:
            md = pq.read_metadata(os.path.join(path, f))
            ks = [
                (md.row_group(i).column(1).statistics.min,
                 md.row_group(i).column(1).statistics.max)
                for i in range(md.num_row_groups)
            ]
            spans.append((min(k[0] for k in ks), max(k[1] for k in ks)))
        spans.sort()
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi <= b_lo + 1  # contiguous ranges, no interleave
