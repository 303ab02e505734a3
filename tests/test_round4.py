"""Round-4 additions: banded interval join knob, sharded packing,
quantile scale twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.operators.joins import interval_overlap_join_banded

SF = "/root/testdata/sf0.001"


def _sides(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    promo = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        F.col("o_orderdate").cast("date").alias("a_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("a_e"),
    )
    ordw = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("b_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("b_e"),
    )
    return promo, ordw


def test_band_width_never_changes_output(spark):
    """The band width is a capacity knob, not a semantics knob: every
    width must produce the identical pair set (reference = the literal
    theta join)."""
    promo, ordw = _sides(spark)
    want = sorted(
        (r["promo_id"], r["order_id"])
        for r in promo.join(
            ordw,
            (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")),
        )
        .select("promo_id", "order_id")
        .collect()
    )
    assert want, "fixture selectivity produced no overlaps"
    for band_days in (1, 7, 30, 90):
        got = sorted(
            (r["promo_id"], r["order_id"])
            for r in interval_overlap_join_banded(
                promo, ordw, "a_s", "a_e", "b_s", "b_e", band_days=band_days
            )
            .select("promo_id", "order_id")
            .collect()
        )
        assert got == want, f"band_days={band_days} changed the result"


@pytest.mark.parametrize("band_days", [1, 30])
def test_banded_join_plan_is_equi_not_cartesian(spark, band_days):
    promo, ordw = _sides(spark)
    res = interval_overlap_join_banded(
        promo, ordw, "a_s", "a_e", "b_s", "b_e", band_days=band_days
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
