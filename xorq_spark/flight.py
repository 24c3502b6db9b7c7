"""Arrow Flight serving of expressions.

Reference: `flight_serve(expr)` (expr/relations.py:525) unbinds an
expression and serves it on an Arrow Flight gRPC server; clients stream
input batches through `do_exchange`, the server binds them to the
expression's UnboundTable and streams result batches back
(UnboundExprExchanger, flight/exchanger.py:38,102).

Spark-first: the bound stream becomes a memtable DataFrame in the
serving session, the expression lowers and executes on the cluster, and
the Arrow result streams out. `do_get` additionally serves fully-bound
expressions by name (the Flight-backend table case, flight/backend.py:41).

Gated behind an import-try per environment rules; pyarrow ships flight
in this container.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

try:
    import pyarrow.flight as _fl

    HAVE_FLIGHT = True
except ImportError:  # pragma: no cover
    _fl = None
    HAVE_FLIGHT = False

import pyarrow as pa

from xorq_spark.expr import nodes as N
from xorq_spark.expr.core import Expr


def _require_flight():
    if not HAVE_FLIGHT:  # pragma: no cover
        raise ImportError("pyarrow.flight is not available in this environment")


def unbind(expr: Expr, name: str = "input") -> Expr:
    """Replace every source leaf with one UnboundTable template (the
    reference's unbind step before serving). Single-source graphs only —
    multi-source serving binds by leaf name via `bindings`."""
    import dataclasses

    def rewrite(node: N.RNode) -> N.RNode:
        if isinstance(node, (N.ReadParquet, N.ReadCSV, N.ReadJSON, N.Memtable, N.TableRef)):
            schema = getattr(node, "schema", None) or ""
            return N.UnboundTable(name, schema or "")
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, N.RNode):
                nv = rewrite(v)
                if nv is not v:
                    changes[f.name] = nv
        return dataclasses.replace(node, **changes) if changes else node

    return Expr(rewrite(expr.node), expr._spark)


if HAVE_FLIGHT:

    class ExprFlightServer(_fl.FlightServerBase):
        """Serves expressions over gRPC.

        - do_exchange(command=<expr name>): stream a table in, get the
          expression evaluated over it streamed back.
        - do_get(ticket=<expr name>): run a fully-bound expression.
        """

        def __init__(self, spark, location: str = "grpc://127.0.0.1:0"):
            super().__init__(location)
            self.spark = spark
            self._exprs: Dict[str, Expr] = {}

        # -- registry -------------------------------------------------------
        def register_expr(self, name: str, expr: Expr, unbound_name: str = "input"):
            self._exprs[name] = expr
            self._unbound_name = unbound_name
            return self

        @property
        def endpoint(self) -> str:
            return f"grpc://127.0.0.1:{self.port}"

        # -- RPC handlers ---------------------------------------------------
        def do_exchange(self, context, descriptor, reader, writer):
            name = descriptor.command.decode()
            expr = self._exprs[name]
            in_table = reader.read_all()
            df = self.spark.createDataFrame(in_table.to_pandas())
            out = expr.to_spark(self.spark, bindings={self._unbound_name: df})
            result = out.toArrow()
            writer.begin(result.schema)
            writer.write_table(result)

        def do_get(self, context, ticket):
            name = ticket.ticket.decode()
            expr = self._exprs[name]
            return _fl.RecordBatchStream(expr.to_pyarrow(self.spark))

        def list_flights(self, context, criteria):
            for name, expr in self._exprs.items():
                yield _fl.FlightInfo(
                    pa.schema([]),
                    _fl.FlightDescriptor.for_command(name.encode()),
                    [],
                    -1,
                    -1,
                )


def flight_serve(
    expr: Expr, spark=None, name: str = "expr", location: str = "grpc://127.0.0.1:0",
    unbound_name: str = "input",
):
    """Start a background Flight server for `expr`; returns the server
    (with .endpoint). Caller shuts down with server.shutdown()."""
    _require_flight()
    from xorq_spark.session import get_spark

    server = ExprFlightServer(spark or get_spark(), location)
    server.register_expr(name, expr, unbound_name)
    # the port is bound at construction; serve() only drives the loop
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server


def flight_exchange(endpoint: str, name: str, table: pa.Table) -> pa.Table:
    """Client helper: stream `table` through the served expression."""
    _require_flight()
    client = _fl.connect(endpoint)
    desc = _fl.FlightDescriptor.for_command(name.encode())
    writer, reader = client.do_exchange(desc)
    writer.begin(table.schema)
    writer.write_table(table)
    writer.done_writing()
    out = reader.read_all()
    writer.close()
    client.close()
    return out


def flight_get(endpoint: str, name: str) -> pa.Table:
    """Client helper: fetch a bound expression's full result."""
    _require_flight()
    client = _fl.connect(endpoint)
    out = client.do_get(_fl.Ticket(name.encode())).read_all()
    client.close()
    return out
