"""Plan-shape regression guards for the headline queries.

PLANS.md documents the intended physical plans; these tests pin the
load-bearing properties (exchange counts bounded, no nested-loop
joins sneaking in where a hash plan is intended, no Python eval nodes
on JVM-only paths) so a refactor that silently degrades a plan fails
CI instead of only showing up in BENCH_r{N}."""

from __future__ import annotations

import pytest

from etl_lens_spark.queries import REGISTRY, _load

_load()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# name -> (max exchanges, forbidden substrings)
EXPECTATIONS = {
    # scan-pipeline queries: no shuffle at all before the limit/agg
    "r_filter_project_limit": (0, ["BroadcastNestedLoopJoin", "ArrowEval"]),
    # single-agg queries: partial + final = bounded exchanges
    "q1_pricing_summary": (2, ["Join", "ArrowEval"]),
    "q6_revenue_forecast": (1, ["Join", "ArrowEval"]),
    "dedup_exact_groups": (2, ["Join", "ArrowEval"]),
    # star joins must stay hash/broadcast — never nested-loop
    "q3_shipping_priority": (4, ["BroadcastNestedLoopJoin", "ArrowEval"]),
    "q5_local_supplier_volume": (8, ["BroadcastNestedLoopJoin", "ArrowEval"]),
    # text analysis is JVM-only by design — a Python eval node here
    # means someone put a UDF on the hot path
    "text_quality_signals": (2, ["ArrowEval", "BatchEvalPython", "MapInPandas"]),
    "text_token_stats": (2, ["ArrowEval", "BatchEvalPython", "MapInPandas"]),
    # contamination: within-doc gram dedup is row-local and the eval
    # side broadcasts — the ONLY gram-carrying hash exchange is the
    # tiny eval-distinct; a SortMergeJoin here means the broadcast
    # regressed and the whole corpus gram stream would shuffle
    "text_contamination_overlap": (5, ["SortMergeJoin", "ArrowEval"]),
    # Q9: filtered part dim + nation broadcast into the lineitem
    # pipeline; fact-fact joins stay hash, never nested-loop
    "q9_product_type_profit": (8, ["BroadcastNestedLoopJoin", "ArrowEval"]),
    # Q20: grouped frame reused at two granularities + semi join;
    # no nested-loop anywhere
    "q20_dominant_suppliers": (8, ["BroadcastNestedLoopJoin", "ArrowEval"]),
}


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_headline_plan_shape(spark, sf_dir, name):
    max_exchanges, forbidden = EXPECTATIONS[name]
    plan = _plan(spark, sf_dir, name)
    n_ex = plan.count("Exchange ")
    assert n_ex <= max_exchanges, (
        f"{name}: {n_ex} exchanges (max {max_exchanges}):\n{plan}"
    )
    for bad in forbidden:
        assert bad not in plan, f"{name}: forbidden node {bad}:\n{plan}"
