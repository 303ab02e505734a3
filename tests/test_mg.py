"""Misra–Gries mergeable-summary contract: one-sided undercount
bounded by n/k, and no heavy item (count > n/k) can be missed."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.operators.mg import mg_summarize
from etl_lens_spark.queries import REGISTRY, all_queries

all_queries()


def test_mg_bound_and_no_missed_heavy(spark, sf_dir):
    rows = (
        REGISTRY["sketch_mg_heavy_hitters"].fn(spark, sf_dir).collect()
    )
    assert rows and all(r["within_bound"] for r in rows)
    k = 16
    n = rows[0]["n"]
    got = {r["item"] for r in rows}
    exact = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .count()
        .collect()
    )
    heavy = [r for r in exact if r["count"] > n / k]
    assert heavy, "fixture must have guaranteed-heavy items"
    for r in heavy:
        assert r["event_type"] in got, "missed a guaranteed heavy item"


def test_mg_summary_is_sketch_sized(spark, sf_dir):
    sk = mg_summarize(
        spark.read.parquet(f"{sf_dir}/events.parquet").select(
            F.col("event_type").alias("item")
        ),
        "item",
        k=3,
    ).collect()
    assert 0 < len(sk) <= 2


def test_mg_skewed_stream_keeps_the_giant(spark):
    """A planted 60%-frequency item must survive with a tight count."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"item": ["big"] * 600 + [f"s{i}" for i in range(400)]}
    )
    df = spark.createDataFrame(pdf).repartition(8)
    sk = {r["item"]: r["mg_count"] for r in mg_summarize(df, "item", k=10).collect()}
    assert "big" in sk
    assert 600 - 1000 / 10 <= sk["big"] <= 600


def test_streaming_mg_live_theorems(spark, sf_dir):
    """The live sharded summary obeys both MG theorems after the
    cross-shard merge: bounded undercount, and no guaranteed-heavy
    type missed."""
    rows = (
        REGISTRY["streaming_mg_heavy_live"].fn(spark, sf_dir).collect()
    )
    assert rows and all(r["within_bound"] for r in rows)
    n = rows[0]["n"]
    k = 5
    got = {r["item"] for r in rows}
    exact = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("user_id IS NOT NULL")
        .groupBy("event_type")
        .count()
        .collect()
    )
    for r in exact:
        if r["count"] > n / k:
            assert r["event_type"] in got, "missed a guaranteed heavy"
    # with 4 counters over 5 types, decrements must actually fire:
    # at least one survivor is undercounted
    assert any(r["mg_count"] < r["exact"] for r in rows)
