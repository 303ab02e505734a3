"""t-digest (operators/tdigest.py): rank-error bound, multiset
determinism of the merge (partial arrival order cannot change the
digest), bounded centroid count, and two-level distributed agreement."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_lens_spark.operators import tdigest


def test_compress_is_order_insensitive_and_bounded():
    rng = np.random.default_rng(7)
    means = rng.normal(0, 100, size=5000)
    weights = np.ones_like(means)
    m1, w1 = tdigest.compress(means, weights, delta=100)
    perm = rng.permutation(len(means))
    m2, w2 = tdigest.compress(means[perm], weights[perm], delta=100)
    assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
    assert len(m1) <= 2 * 100
    assert abs(float(w1.sum()) - 5000.0) < 1e-6  # weight conserved


def test_quantile_rank_error_bound():
    n = 20000
    rng = np.random.default_rng(11)
    data = rng.exponential(scale=50.0, size=n)  # skewed on purpose
    m, w = tdigest.compress(data, np.ones_like(data), delta=100)
    s = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = tdigest._quantile(m, w, q)
        rank = np.searchsorted(s, est) / n
        assert abs(rank - q) <= 0.01, (q, rank)


def test_distributed_two_level_matches_single_pass(spark):
    rng = np.random.default_rng(3)
    rows = [
        (int(i % 4), float(v))
        for i, v in enumerate(rng.normal(100, 25, size=8000))
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    partials = tdigest.partial_digests(
        df.repartition(16), ["g"], "v", delta=100
    ).localCheckpoint()
    qs = [0.1, 0.5, 0.9]
    a = tdigest.merge_quantiles(partials, ["g"], qs)
    # re-ordering the SAME partial multiset must give the identical
    # digest — the determinism claim that keeps this sketch out of
    # the order-dependent rows-only set
    b = tdigest.merge_quantiles(
        partials.orderBy(F.desc("mean"), F.asc("weight")), ["g"], qs
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # and the estimates respect the rank bound per group
    pdf = df.toPandas()
    for g, q, est, _ in ra:
        vals = np.sort(pdf[pdf.g == g].v.to_numpy())
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - q) <= 0.015, (g, q, rank)


def test_partials_carry_only_bounded_state(spark):
    df = spark.range(0, 50000).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") % 9973).cast("double").alias("v"),
    )
    partials = tdigest.partial_digests(
        df.repartition(8), ["g"], "v", delta=100
    )
    per_part = partials.groupBy("g").count().collect()
    # ≤ 2δ centroids per key per batch; 8 partitions → comfortably
    # under 8 * 2δ rows per key, never O(values)
    for r in per_part:
        assert r["count"] <= 8 * 2 * 100


def test_incremental_fold_rank_accuracy_and_bounded_state():
    """The streaming twin's fold pattern (stream_ops.tdigest_stateful):
    compress(state ∪ batch values) chained across micro-batches. Not
    replay-exact vs the two-level batch digest (centroid boundaries
    depend on batch splits), but the rank-error contract the live
    query pins (1.5%) must hold for any batch slicing, and the
    carried state must stay ≤ ~2δ centroids after every fold."""
    import numpy as np

    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.0, size=30000)
    delta = 100
    for n_batches in (1, 7, 30):
        means = np.empty(0)
        weights = np.empty(0)
        for chunk in np.array_split(vals, n_batches):
            means = np.concatenate([means, chunk])
            weights = np.concatenate(
                [weights, np.ones_like(chunk)]
            )
            means, weights = tdigest.compress(means, weights, delta)
            assert len(means) <= 2 * delta
        assert weights.sum() == len(vals)  # weight conservation
        s = np.sort(vals)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            est = tdigest._quantile(means, weights, q)
            rank = np.searchsorted(s, est) / len(s)
            assert abs(rank - q) <= 0.015, (n_batches, q, rank)
