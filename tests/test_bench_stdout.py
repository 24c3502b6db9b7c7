"""The driver captures bench.py stdout in a bounded tail window; rounds 5
and 6 shipped a per-query map on stdout that outgrew it and arrived
front-truncated (BENCH_r05/r06.json: ``parsed: null``). These tests pin
the new contract: stdout carries a SHORT headline object regardless of
how many queries the headline grows to, and the full map lives in
BENCH_LAST.json.
"""

import json

import bench


def _fake_result(n_queries):
    timings = {f"query_with_a_long_descriptive_name_{i:04d}": 1.234 for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }


def test_stdout_headline_under_1kb_even_at_500_queries():
    line = json.dumps(bench.stdout_headline(_fake_result(500)))
    assert len(line.encode()) < 1024


def test_stdout_headline_fields():
    head = bench.stdout_headline(_fake_result(68))
    assert head["metric"] == "headline_queries_total_runtime"
    assert head["unit"] == "sec"
    assert head["n_queries"] == 68
    assert head["artifact"] == "BENCH_LAST.json"
    assert head["sf"] == 0.1
    # round-trips through json cleanly
    assert json.loads(json.dumps(head)) == head


def test_headline_names_resolve_in_registry():
    # every bench headline name must be a registered query — a typo here
    # would crash the driver's per-round bench run.
    from xorq_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
