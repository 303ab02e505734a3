"""The Greenwald–Khanna live-quantile contract: every emitted
estimate carries rank error ≤ εn against the exact batch ranks, and
the summary stays sketch-sized. (The registry records the query
rows-only — GK update-mode state is not replay-exact — so THIS file
is its correctness gate.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.queries import REGISTRY, all_queries

all_queries()

_EPS = 0.01


@pytest.fixture(scope="module")
def gk_rows(spark, sf_dir):
    return {
        r["event_type"]: r
        for r in REGISTRY["streaming_gk_quantiles_live"]
        .fn(spark, sf_dir)
        .collect()
    }


@pytest.fixture(scope="module")
def exact_values(spark, sf_dir):
    """Per event_type: the sorted exact value list."""
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    )
    return {r["event_type"]: r["vals"] for r in rows}


def _rank_of(sorted_vals, v):
    """Number of elements ≤ v (the rank GK's intervals bound)."""
    import bisect

    return bisect.bisect_right(sorted_vals, v)


def test_gk_rank_error_within_eps(gk_rows, exact_values):
    assert set(gk_rows) == set(exact_values)
    for et, row in gk_rows.items():
        vals = exact_values[et]
        n = len(vals)
        assert row["n_seen"] == n
        for phi, col in ((0.50, "q50"), (0.90, "q90"), (0.99, "q99")):
            import math

            target = max(1, math.ceil(phi * n))
            got = _rank_of(vals, row[col])
            # value must exist in the stream (GK stores real values)
            assert row[col] in vals
            assert abs(got - target) <= _EPS * n + 1, (
                f"{et} {col}: rank {got} vs target {target} (n={n})"
            )


def test_gk_state_is_sketch_sized(gk_rows):
    """O((1/ε)·log(εn)) tuples: capped absolutely, and sublinear once
    n is big enough for 2εn-threshold merges to fire (at ε=0.01 the
    compressor only starts earning its keep past n ≈ 1/ε²·ish; the
    tiny sf0.001 fixture stays under the absolute cap)."""
    for et, row in gk_rows.items():
        assert row["sketch_size"] < 400
        if row["n_seen"] >= 1000:
            assert row["sketch_size"] < row["n_seen"] / 5


def test_gk_quantiles_are_ordered(gk_rows):
    for row in gk_rows.values():
        assert row["q50"] <= row["q90"] <= row["q99"]
