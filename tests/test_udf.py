"""UDF-surface semantics: applyInPandas zscore vs the window-function
equivalent; grouped-agg pandas UDAF vs JVM aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_lens_spark.functions import udf_surface as us
from etl_lens_spark.sources.tables import load_table


def test_zscore_matches_window_equivalent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    got = {
        r["event_id"]: r["zscore"] for r in us.per_user_zscore(ev).collect()
    }
    w = Window.partitionBy("user_id")
    want_df = ev.select(
        "event_id",
        (
            (F.col("value") - F.avg("value").over(w))
            / F.stddev_pop("value").over(w)
        ).alias("z"),
    )
    want = {r["event_id"]: r["z"] for r in want_df.collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_weighted_mean_udaf_matches_jvm(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    got = {
        r["p_brand"]: r["wm"]
        for r in p.groupBy("p_brand")
        .agg(
            us.weighted_mean_udaf(
                F.col("p_retailprice"), F.col("p_size").cast("double")
            ).alias("wm")
        )
        .collect()
    }
    want = {
        r["p_brand"]: r["wm"]
        for r in p.groupBy("p_brand")
        .agg(
            (
                F.sum(F.col("p_retailprice") * F.col("p_size"))
                / F.sum(F.col("p_size").cast("double"))
            ).alias("wm")
        )
        .collect()
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_hll_mergeable_matches_exact_within_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_lens_spark.queries import all_queries
    from etl_lens_spark.sources.tables import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["sketch_hll_mergeable"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et in exact:
        rel = abs(approx[et] - exact[et]) / max(exact[et], 1)
        assert rel < 0.05, (et, approx[et], exact[et])
    # merging daily sketches must equal sketching the whole column
    whole = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("a")
        )
        .collect()
    )
    assert {r["event_type"]: r["a"] for r in whole} == approx
