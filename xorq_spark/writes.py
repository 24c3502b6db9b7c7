"""Write orchestration: tee (write-through) and write-audit-publish.

Reference: `Table.tee` (vendor/ibis/expr/types/relations.py:3427,
writers in writes/write_through.py:59-467, ADR-0014) and WAP
(writes/wap.py:36-214).

Spark execution is lazy and re-executes plans per action, so a
side-effect write inside a multi-consumer pipeline must be pinned:
`tee` uses write-THEN-read — the downstream expression scans the
written Parquet, guaranteeing exactly-once write semantics and making
the artifact the (reusable) upstream for every consumer. This is the
SURVEY §7 "multi-scan semantics" hard-part resolution.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable, Optional, Sequence

from xorq_spark.expr.core import Expr


def tee(expr: Expr, path: str, spark=None, mode: str = "overwrite") -> Expr:
    """Write `expr` to `path` and return an expression reading it back.
    The returned Expr is the pass-through continuation; the write has
    already happened exactly once."""
    from xorq_spark.expr.api import deferred_read_parquet

    expr.to_parquet(path, spark, mode=mode)
    return deferred_read_parquet(path)


class AuditError(RuntimeError):
    """An audit predicate rejected the staged write."""


def write_audit_publish(
    expr: Expr,
    final_path: str,
    audits: Sequence[Callable[[Expr], bool]],
    spark=None,
    staging_root: Optional[str] = None,
) -> str:
    """WAP: stage -> audit -> atomically publish (reference:
    writes/wap.py:36-214; Parquet flavor — the Iceberg flavor maps to
    branch + fast-forward on a real lakehouse).

    Audits are callables Expr -> bool run against the STAGED data; all
    must pass. Publish is an atomic directory rename; on audit failure
    the staging dir is left for inspection and AuditError raises."""
    from xorq_spark.expr.api import deferred_read_parquet

    staging_root = staging_root or os.path.dirname(final_path.rstrip("/")) or "."
    staging = os.path.join(staging_root, f".wap-staging-{uuid.uuid4().hex[:12]}")
    expr.to_parquet(staging, spark)
    staged = deferred_read_parquet(staging)
    for audit in audits:
        ok = audit(staged)
        if not ok:
            raise AuditError(
                f"audit {getattr(audit, '__name__', repr(audit))} failed; "
                f"staged data kept at {staging}"
            )
    if os.path.exists(final_path):
        retired = final_path.rstrip("/") + f".retired-{uuid.uuid4().hex[:8]}"
        os.rename(final_path, retired)
    os.rename(staging, final_path)
    return final_path
