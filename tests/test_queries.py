"""Registry-wide smoke: every declared query runs at sf0.001 and
returns a stable schema; oracle coverage matches the contract."""

from __future__ import annotations

import pytest

from etl_lens_spark.queries import REGISTRY, _load

_load()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    # schema must be stable across construction
    df2 = spec.fn(spark, sf_dir)
    assert df.schema == df2.schema


def test_driver_contract():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40
    # SQL-expressible coverage stays high
    assert len(osql) / len(qs) > 0.8


def test_sketch_approx_aggs_error_bounds(spark, sf_dir):
    from etl_lens_spark.queries import all_queries
    from etl_lens_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    approx = {
        r["event_type"]: r
        for r in all_queries()["sketch_approx_aggs"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) / e["users"] < 0.05, et
        # value distribution is dense around the median; accept small
        # absolute-quantile slack from the t-digest-style sketch
        spread = abs(e["median"]) + 1.0
        assert abs(a["approx_median"] - e["median"]) / spread < 0.05, et
