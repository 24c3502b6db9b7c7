"""Journey / growth-analytics walkthrough, composed from this repo's
certified operators — the product-analytics warehouse shape over a raw
event log:

1. Markov transition matrix (`markov_transitions`): where do users go
   next from each state (with entry probabilities),
2. multi-touch attribution (`attribution_credit`): which channels get
   first/last/linear credit for purchases,
3. exact 7-day rolling distinct (`rolling_distinct_exact`): the
   DAU/WAU dashboard without window rescans,
4. Kaplan-Meier weekly survival (`kaplan_meier_weekly`): retention
   with CORRECT censoring — still-active users are not churn,
5. seasonal-naive forecast eval (query-level): the MAE/SMAPE/MASE
   floor any real forecast must beat.

    python examples/journey_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xorq_spark.functions.stats import kaplan_meier_weekly
from xorq_spark.functions.timeseries import (
    attribution_credit,
    markov_transitions,
    rolling_distinct_exact,
)
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="journey_analytics")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    print("== 1. Markov journey transitions (top 10 by probability)")
    markov_transitions(
        ev, "user_id", "ts", "event_type", order_cols=("event_id",)
    ).orderBy("prob_ppm", ascending=False).show(10, truncate=False)

    print("== 2. Multi-touch attribution over a 3-day lookback")
    attribution_credit(
        ev, "user_id", "ts", "event_type",
        conversion_state="purchase",
        touch_states=("view", "click", "signup"),
        lookback_days=3,
        order_cols=("event_id",),
    ).orderBy("channel").show(truncate=False)

    print("== 3. Exact 7-day rolling distinct users (last 10 days)")
    rolling_distinct_exact(ev, "user_id", "ts", 7).orderBy(
        "day", ascending=False
    ).show(10)

    print("== 4. Kaplan-Meier weekly survival by signup cohort")
    kaplan_meier_weekly(
        ev, "user_id", "ts", "event_type", order_cols=("event_id",),
        n_weeks=4, churn_gap_days=7,
    ).orderBy("cohort", "week").show(20)

    print("== 5. Seasonal-naive forecast floor (MAE/SMAPE/MASE)")
    from xorq_spark.queries import QUERIES

    QUERIES["time_forecast_eval"](spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
