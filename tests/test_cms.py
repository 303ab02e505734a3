"""Count-min sketch (operators/cms.py): overestimate-only errors,
the standard error bound, exact mergeability, and the heavy-hitter
prefilter identity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_lens_spark.operators.cms import cms_estimate, cms_merge, cms_sketch
from etl_lens_spark.sources.tables import load_table

DEPTH, WIDTH = 5, 1024


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select("o_custkey")


def test_cms_never_underestimates_and_error_bound(spark, sf_dir):
    o = _orders(spark, sf_dir)
    n = o.count()
    sketch = cms_sketch(o, "o_custkey", DEPTH, WIDTH)
    est = cms_estimate(sketch, o.distinct(), "o_custkey", DEPTH, WIDTH)
    exact = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    joined = est.join(exact, "o_custkey").select("o_custkey", "est", "cnt")
    rows = joined.collect()
    assert len(rows) == exact.count()
    eps_bound = math.e / WIDTH * n
    for r in rows:
        assert r["est"] >= r["cnt"], r  # CMS property: no underestimates
        # w.p. 1 - e^-DEPTH per key; deterministic hashing makes this
        # a fixed fact of the fixture, not a flaky draw
        assert r["est"] - r["cnt"] <= eps_bound, r


def test_cms_merge_is_exact(spark, sf_dir):
    o = _orders(spark, sf_dir)
    half_a = o.filter(F.col("o_custkey") % 2 == 0)
    half_b = o.filter(F.col("o_custkey") % 2 == 1)
    merged = cms_merge(
        cms_sketch(half_a, "o_custkey", DEPTH, WIDTH),
        cms_sketch(half_b, "o_custkey", DEPTH, WIDTH),
    )
    whole = cms_sketch(o, "o_custkey", DEPTH, WIDTH)
    # counts are linear → merge is bit-exact, not approximate
    assert merged.subtract(whole).count() == 0
    assert whole.subtract(merged).count() == 0


def test_cms_sketch_size_bounded(spark, sf_dir):
    sketch = cms_sketch(_orders(spark, sf_dir), "o_custkey", DEPTH, WIDTH)
    assert sketch.count() <= DEPTH * WIDTH


def test_cms_absent_key_estimates_small(spark, sf_dir):
    o = _orders(spark, sf_dir)
    sketch = cms_sketch(o, "o_custkey", DEPTH, WIDTH)
    ghosts = spark.range(10_000_000, 10_000_005).select(
        F.col("id").alias("o_custkey")
    )
    est = cms_estimate(sketch, ghosts, "o_custkey", DEPTH, WIDTH)
    n = o.count()
    bound = math.e / WIDTH * n
    for r in est.collect():
        assert 0 <= r["est"] <= bound, r


def test_heavy_hitter_prefilter_identity(spark, sf_dir):
    from etl_lens_spark.queries import all_queries

    got = all_queries()["cms_heavy_hitters"](spark, sf_dir)
    o = _orders(spark, sf_dir)
    plain = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )
    assert got.subtract(plain).count() == 0
    assert plain.subtract(got.drop_duplicates()).count() == 0
