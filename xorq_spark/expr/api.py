"""User-facing deferred API (placeholder — real IR lands later this
round; the names exist so `import xorq_spark` works from day one)."""

from __future__ import annotations


def _not_ready(*_a, **_k):
    raise NotImplementedError("xorq_spark.expr IR lands later this round")


_ = None
asc = _not_ready
desc = _not_ready
deferred_read_csv = _not_ready
deferred_read_parquet = _not_ready
literal = _not_ready
memtable = _not_ready
param = _not_ready
table = _not_ready
