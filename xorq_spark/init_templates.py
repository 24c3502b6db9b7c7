"""Project scaffolding for `python -m xorq_spark init`.

Reference: `xorq init` (cli.py + init_templates.py). The reference
clones template repos from GitHub; offline-first here, the templates
are embedded and written locally — same outcome: a runnable starting
script, a profiles note, and a .gitignore'd builds dir.
"""

from __future__ import annotations

from pathlib import Path

TEMPLATES = ("pipeline", "ml")
DEFAULT_TEMPLATE = "pipeline"

_PIPELINE_SCRIPT = '''\
"""Starter pipeline: deferred read -> filter -> aggregate.

Build + run it:

    python -m xorq_spark build pipeline.py -e expr
    python -m xorq_spark run builds/<hash> --format text
"""

import xorq_spark as xo
from xorq_spark import _

# point this at your data (parquet directory or file)
orders = xo.deferred_read_parquet("data/orders.parquet")

expr = (
    orders.filter(_.o_totalprice > 100.0)
    .group_by("o_orderstatus")
    .agg(n=_.o_orderkey.count(), total=_.o_totalprice.sum())
    .order_by("o_orderstatus")
)

if __name__ == "__main__":
    print(expr.execute())
'''

_ML_SCRIPT = '''\
"""Starter ML pipeline: deterministic split -> fit -> score.

    python pipeline_ml.py
"""

import xorq_spark as xo
from xorq_spark import _
from xorq_spark.ml import Step, Pipeline, SimpleLinearRegression, train_test_splits

table = xo.deferred_read_parquet("data/orders.parquet")
train, test = train_test_splits(table, unique_key="o_orderkey", test_sizes=0.25)

pipe = Pipeline([
    Step(SimpleLinearRegression, features=["o_shippriority"], target="o_totalprice"),
])

if __name__ == "__main__":
    fitted = pipe.fit(train)
    print(fitted.predict(test).limit(10).execute())
'''

_PROFILES_NOTE = """\
# Connection profiles

Save connection configs once, load them by alias:

    python -m xorq_spark profile add --backend duckdb --alias warehouse
    python -m xorq_spark profile ls

Secrets must be env references — `password='${MY_PASSWORD}'` — the
profile store refuses plaintext secrets.
"""

_GITIGNORE = "builds/\nspark-warehouse/\n__pycache__/\n"


def init_project(path: str, template: str = DEFAULT_TEMPLATE) -> Path:
    """Scaffold a new project directory; returns its path."""
    if template not in TEMPLATES:
        raise ValueError(f"unknown template {template!r}; options: {TEMPLATES}")
    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)
    (root / "data").mkdir(exist_ok=True)
    script = "pipeline.py" if template == "pipeline" else "pipeline_ml.py"
    body = _PIPELINE_SCRIPT if template == "pipeline" else _ML_SCRIPT
    (root / script).write_text(body)
    (root / "PROFILES.md").write_text(_PROFILES_NOTE)
    (root / ".gitignore").write_text(_GITIGNORE)
    return root
