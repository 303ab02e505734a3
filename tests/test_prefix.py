"""Distributed prefix-sum / global-rank operator: byte-equality vs
the single-reducer global window it replaces, across partition counts
and tie patterns, plus the no-unpartitioned-WindowExec plan contract.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_lens_spark.operators.prefix import (
    ordered_global_rank,
    ordered_prefix_sum,
)


def _fixture(spark, n=500, seed=7):
    rng = random.Random(seed)
    # heavy ties in v to exercise tie-break discipline and boundary
    # rows landing adjacent to range-partition edges
    rows = [(i, rng.randint(0, 20), rng.randint(-50, 100)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, x long")


@pytest.mark.parametrize("num_partitions", [1, 3, 8, 64])
def test_prefix_sum_matches_global_window(spark, num_partitions):
    df = _fixture(spark)
    order = [F.desc("v"), F.asc("id")]
    got = {
        (r["id"]): r["cum"]
        for r in ordered_prefix_sum(
            df, order, "x", "cum", num_partitions=num_partitions
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("x").over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_global_rank_matches_row_number(spark, num_partitions):
    df = _fixture(spark, n=300, seed=11)
    order = [F.asc("v"), F.asc("id")]
    got = {
        r["id"]: r["rnk"]
        for r in ordered_global_rank(
            df, order, "rnk", num_partitions=num_partitions
        ).collect()
    }
    want = {
        r["id"]: r["rnk"]
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_no_unpartitioned_window_in_plan(spark):
    df = _fixture(spark, n=100)
    res = ordered_prefix_sum(
        df, [F.asc("v"), F.asc("id")], "x", "cum", num_partitions=4
    )
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__prefix_pid" in line, f"unpartitioned window: {line}"


def test_prefix_sum_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "id long, v long, x long")
    assert (
        ordered_prefix_sum(
            empty, [F.asc("v")], "x", "cum", num_partitions=4
        ).count()
        == 0
    )
    one = spark.createDataFrame([(1, 2, 42)], "id long, v long, x long")
    rows = ordered_prefix_sum(
        one, [F.asc("v")], "x", "cum", num_partitions=4
    ).collect()
    assert rows[0]["cum"] == 42


@pytest.mark.parametrize("num_partitions", [1, 3, 8, 64])
@pytest.mark.parametrize("inclusive", [True, False])
def test_prefix_max_matches_global_window(spark, num_partitions, inclusive):
    from etl_lens_spark.operators.prefix import ordered_prefix_max

    # distinct order keys (key-strictness == row-strictness)
    df = _fixture(spark).groupBy("v").agg(F.max("x").alias("x"))
    got = {
        r["v"]: r["cm"]
        for r in ordered_prefix_max(
            df,
            [F.asc("v")],
            "x",
            "cm",
            inclusive=inclusive,
            num_partitions=num_partitions,
        ).collect()
    }
    end = 0 if inclusive else -1
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
    want = {
        r["v"]: r["cm"]
        for r in df.withColumn("cm", F.max("x").over(w)).collect()
    }
    assert got == want


def test_prefix_max_no_unpartitioned_window(spark):
    from etl_lens_spark.operators.prefix import ordered_prefix_max

    df = _fixture(spark, n=100).groupBy("v").agg(F.max("x").alias("x"))
    res = ordered_prefix_max(
        df, [F.asc("v")], "x", "cm", inclusive=False, num_partitions=4
    )
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__prefix_pid" in line, f"unpartitioned window: {line}"
