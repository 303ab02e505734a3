"""Dedup operator semantics: exact keeps min-id; MinHash estimates
track exact Jaccard; SimHash finds planted near-dups; LSH candidate
recall against exact pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.dedup import exact as dx
from etl_lens_spark.dedup import minhash as mh
from etl_lens_spark.dedup import simhash as sh


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")  # one-token edit
    far = "completely different content about spark engines " * 5
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, near),  # near dup of 1
            (4, far),
            (5, "  The  QUICK brown fox jumps over the lazy dog " * 5),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_keeps_min_id(spark):
    out = dx.exact_dedup(_docs(spark))
    kept = sorted(r["doc_id"] for r in out.collect())
    # doc 2 is an exact dup of 1 → dropped; 5 normalizes to the same
    # text as 1 (case/whitespace) → dropped too
    assert kept == [1, 3, 4]


def test_minhash_estimate_tracks_exact_jaccard(spark):
    docs = _docs(spark)
    sig = mh.add_minhash_signature(mh.add_shingles(docs, n=3))
    cands = mh.minhash_lsh_candidates(
        sig, min_est_jaccard=0.3, cache=False
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in cands}
    # exact duplicates estimate 1.0
    assert got[(1, 2)] == 1.0
    assert got[(1, 5)] == 1.0
    # near-dup found with a high estimate
    assert (1, 3) in got and got[(1, 3)] > 0.3
    # unrelated docs never become candidates
    assert not any(4 in pair for pair in got)


def test_minhash_estimate_close_to_exact(spark):
    docs = _docs(spark)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in mh.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0).collect()
    }
    sig = mh.add_minhash_signature(mh.add_shingles(docs, n=3))
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in mh.minhash_lsh_candidates(
            sig, min_est_jaccard=0.0, cache=False
        ).collect()
    }
    for pair, e in est.items():
        assert abs(e - exact.get(pair, 0.0)) < 0.25, (pair, e, exact.get(pair))


def test_simhash_identical_and_near(spark):
    docs = _docs(spark)
    sig = sh.add_simhash(docs)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming_dist"]
        for r in sh.simhash_candidates(sig, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0  # identical → distance 0
    assert pairs[(1, 5)] == 0  # normalization-equal → distance 0
    assert (1, 3) in pairs  # near dup within radius
    assert not any(4 in p for p in pairs)


def test_fingerprint_dedup_counts(spark):
    out = dx.fingerprint_dedup(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep[1] == 3  # docs 1, 2, 5 share a fingerprint
    assert by_keep[3] == 1 and by_keep[4] == 1


def test_minhash_knobs_change_signature_and_banding(spark, sf_dir):
    """spark.etl_lens.minhash.* actually steers the operator: halving
    num_hashes halves the signature the query computes, and an
    indivisible bands setting fails fast instead of silently
    mis-banding."""
    import pytest

    from etl_lens_spark.config import minhash_params
    from etl_lens_spark.dedup import minhash as mh
    from etl_lens_spark.queries import REGISTRY, all_queries
    from etl_lens_spark.sources.tables import load_table

    all_queries()  # populate REGISTRY

    assert minhash_params(spark) == (64, 16, 3)
    spark.conf.set("spark.etl_lens.minhash.num_hashes", "32")
    spark.conf.set("spark.etl_lens.minhash.bands", "8")
    try:
        nh, b, n = minhash_params(spark)
        assert (nh, b, n) == (32, 8, 3)
        docs = load_table(spark, sf_dir, "documents").limit(5)
        sig = mh.add_minhash_signature(
            mh.add_shingles(docs, n=n), num_hashes=nh
        )
        import pyspark.sql.functions as F

        assert sig.select(F.size("minhash")).first()[0] == 32
        # query still runs end-to-end under the non-default knobs
        REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).count()
        spark.conf.set("spark.etl_lens.minhash.bands", "7")
        with pytest.raises(ValueError, match="divisible"):
            minhash_params(spark)
    finally:
        spark.conf.unset("spark.etl_lens.minhash.num_hashes")
        spark.conf.unset("spark.etl_lens.minhash.bands")


def test_lsh_tuner_matches_declared_default_and_monotone():
    """tune_lsh_params(0.5, 64) must reproduce the repo's declared
    banding (16 bands x r=4 — config.py's hand-picked default, now
    derived), and the chosen rows-per-band must grow with the
    threshold (steeper curves for stricter similarity)."""
    from etl_lens_spark.dedup.tuning import (
        lsh_collision_prob,
        tune_lsh_params,
    )

    assert tune_lsh_params(0.5, 64) == (16, 4)
    rows = [tune_lsh_params(t, 64)[1] for t in (0.2, 0.4, 0.6, 0.8)]
    assert rows == sorted(rows)  # r monotone in threshold
    # every returned pair factors the budget exactly
    for t in (0.25, 0.5, 0.75):
        b, r = tune_lsh_params(t, 96)
        assert b * r == 96
    # weighting toward FN-avoidance must not reduce recall at t
    b0, r0 = tune_lsh_params(0.6, 64)
    b1, r1 = tune_lsh_params(0.6, 64, fn_weight=10.0)
    assert lsh_collision_prob(0.6, r1, b1) >= lsh_collision_prob(
        0.6, r0, b0
    )


def test_lsh_tuner_hits_target_recall_on_planted_pairs(spark):
    """Integration: tune for threshold 0.3 / 64 hashes, run the
    banded LSH with the tuned (bands, rows) on a corpus with planted
    near-pairs above threshold and decoys far below — every planted
    pair must surface as a candidate (the S-curve says P >= 0.95 at
    s = 0.3, and our planted pairs sit far above it), no decoy pair
    may."""
    from etl_lens_spark.dedup.tuning import tune_lsh_params

    bands, rows = tune_lsh_params(0.3, 64)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = [(1, base), (2, base.replace("zeta", "zeeta"))]  # near pair
    docs += [(3, base.replace("alpha", "omega"))]
    docs += [
        (10 + i, f"totally unrelated text number {i} " * 8 + "x " * i)
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = mh.add_minhash_signature(
        mh.add_shingles(df, n=3), num_hashes=64
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in mh.minhash_lsh_candidates(
            sig, bands=bands, min_est_jaccard=0.3, cache=False
        ).collect()
    }
    assert (1, 2) in got and (1, 3) in got  # planted pairs recalled
    assert not any(a >= 10 and b >= 10 for a, b in got)  # no decoys


def test_minhash_target_jaccard_derives_bands(spark):
    """spark.etl_lens.minhash.target_jaccard derives bands from the
    S-curve tuner; an explicit bands knob wins if both are set."""
    from etl_lens_spark.config import minhash_params

    try:
        spark.conf.set("spark.etl_lens.minhash.target_jaccard", "0.5")
        assert minhash_params(spark) == (64, 16, 3)  # tuner = default
        spark.conf.set("spark.etl_lens.minhash.target_jaccard", "0.9")
        nh, b, _ = minhash_params(spark)
        assert (nh, b) == (64, 4)  # steeper curve: r=16
        spark.conf.set("spark.etl_lens.minhash.bands", "32")
        assert minhash_params(spark)[1] == 32  # explicit knob wins
    finally:
        spark.conf.unset("spark.etl_lens.minhash.target_jaccard")
        spark.conf.unset("spark.etl_lens.minhash.bands")


def test_pairs_from_bands_incremental_equals_batch(spark):
    """The incremental decomposition the CDF dedup query leans on:
    seed self-join ∪ (delta vs seed index) ∪ delta self-join must
    equal the full-corpus self-join EXACTLY — bands shared via
    banded_rows, so the two paths cannot hash into different
    buckets."""
    from etl_lens_spark.dedup import minhash as mh

    base = "the quick brown fox jumps over the lazy dog again and "
    docs = [(i, base + f"tail {i % 3}") for i in range(12)] + [
        (100 + i, f"completely different text body number {i} "
                  f"with its own words {i * 7}") for i in range(4)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = mh.add_minhash_signature(mh.add_shingles(df, n=3), num_hashes=64)
    banded = mh.banded_rows(sig, "doc_id", "minhash", bands=16)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in mh.pairs_from_bands(banded, min_est_jaccard=0.3).collect()
    }
    seed_b = banded.filter(F.col("__id") % 2 == 0)
    delta_b = banded.filter(F.col("__id") % 2 == 1)
    seed = mh.pairs_from_bands(seed_b, min_est_jaccard=0.3)
    cross = mh.pairs_from_bands(delta_b, seed_b, min_est_jaccard=0.3)
    within = mh.pairs_from_bands(delta_b, min_est_jaccard=0.3)
    inc = {
        (r["doc_a"], r["doc_b"])
        for part in (seed, cross, within)
        for r in part.collect()
    }
    assert full  # the fixture plants real near-dups
    assert inc == full
