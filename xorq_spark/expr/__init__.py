"""Deferred expression layer: a thin, hashable, serializable IR that
lowers to the PySpark DataFrame API (built out over this round)."""
