"""Cache-flavor namespace (reference parity: ``xorq.caching``).

Reference users write ``from xorq.caching import ParquetCache``
(reference __all__: /root/reference/python/xorq/caching/__init__.py);
the implementations live in :mod:`xorq_spark.cache`.
"""

from xorq_spark.cache import (
    GCSCache,
    ObjectStoreCache,
    ParquetCache,
    ParquetDummySnapshotCache,
    ParquetSnapshotCache,
    ParquetTTLSnapshotCache,
    SourceCache,
    SourceSnapshotCache,
)

__all__ = [
    "ParquetCache",
    "ParquetSnapshotCache",
    "ParquetTTLSnapshotCache",
    "ParquetDummySnapshotCache",
    "SourceCache",
    "SourceSnapshotCache",
    "GCSCache",
    "ObjectStoreCache",
]
