"""KMV bottom-k sketch (operators/kmv.py): merge losslessness, the
small-set exactness degeneration, the standard error envelope, and
cross-engine determinism of the hash value."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_lens_spark.operators import kmv
from etl_lens_spark.sources.tables import load_table

K = 64


def _hashed_events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            kmv.kmv_value(F.col("user_id")).alias("v"),
            "user_id",
        )
    )


def test_kmv_value_matches_reference_md5(spark):
    # the Spark expression must equal the stdlib md5 → first-13-hex
    # integer, or the DuckDB oracle replica diverges
    df = spark.range(0, 50).select(
        "id", kmv.kmv_value(F.col("id")).alias("v")
    )
    for r in df.collect():
        expect = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:13], 16)
        assert r["v"] == expect, r


def test_kmv_merge_is_lossless(spark, sf_dir):
    # k smallest of the union of per-day bottom-k == bottom-k of the
    # whole group (the property that makes daily sketches roll up)
    ev = _hashed_events(spark, sf_dir)
    day_sk = kmv.kmv_topk(ev, ["event_type", "day"], K)
    merged = kmv.kmv_topk(day_sk, ["event_type"], K)
    direct = kmv.kmv_topk(ev, ["event_type"], K)
    assert merged.subtract(direct).count() == 0
    assert direct.subtract(merged).count() == 0


def test_kmv_exact_below_k(spark):
    # fewer than k distinct keys → the sketch IS the set; estimate
    # degenerates to the exact count
    df = spark.range(0, 10).select(
        F.lit("g").alias("g"), kmv.kmv_value(F.col("id")).alias("v")
    )
    sk = kmv.kmv_topk(df, ["g"], K)
    [row] = kmv.kmv_estimate(sk, ["g"], K).collect()
    assert row["est"] == 10.0
    assert row["n_sk"] == 10


def test_kmv_estimate_error_envelope(spark):
    # n = 5000 distinct keys, k = 256: relative error concentrates
    # around 1/sqrt(k-2) ≈ 6.3%; deterministic hashing makes the
    # realized error a fixed fact of the fixture — assert 3 sigma
    k = 256
    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"), kmv.kmv_value(F.col("id")).alias("v")
    )
    sk = kmv.kmv_topk(df, ["g"], k)
    [row] = kmv.kmv_estimate(sk, ["g"], k).collect()
    rel = abs(row["est"] - 5000.0) / 5000.0
    assert rel < 3.0 / (k - 2) ** 0.5, row["est"]
