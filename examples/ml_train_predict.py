"""Deferred train-then-predict in one expression graph: deterministic
hash split, fit on train (applyInPandas UDAF -> pickled model), predict
on test (two-phase expr UDF: model broadcast into a pandas UDF).

    python examples/ml_train_predict.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xorq_spark as xo
from xorq_spark.ml import Step
from xorq_spark.ml.estimators import default_regressor
from xorq_spark.expr.deferred import _
from xorq_spark.ml.split import expr_split_column


def main(sf_dir: str):
    li = xo.deferred_read_parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"
    )
    split = expr_split_column(
        ["l_orderkey", "l_linenumber"], [0.25, 0.75], labels=["test", "train"]
    )
    tagged = li.mutate(split=split)
    train = tagged.filter(_.split == "train").drop("split")
    test = tagged.filter(_.split == "test").drop("split")
    step = Step(
        default_regressor,
        features=["l_quantity", "l_discount"],
        target="l_extendedprice",
        dest="predicted_price",
    )
    fitted = step.fit(train)
    scored = fitted.predict(test)
    pdf = scored.execute()
    mae = (pdf.predicted_price - pdf.l_extendedprice).abs().mean()
    print(f"test rows={len(pdf)}  MAE={mae:.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
