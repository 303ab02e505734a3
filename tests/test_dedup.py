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


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_guarded_incremental_matches_scratch(spark):
    """Round-10 review fix (VERDICT r9 item 2): the skew guard rides
    the INCREMENTAL path via per-pair support refcounts, and stays
    exactly equal to guarded from-scratch LSH through threshold
    crossings in BOTH directions — a planted boilerplate bucket
    grows small→over (retract) and shrinks over→small (re-grant).
    The unguarded path would score the full quadratic bucket; the
    pin at the over state proves the guard actually suppressed it."""
    B = 5  # max_bucket, tiny so the planted bucket crosses it
    THETA = 0.3
    boiler = "identical boilerplate footer text repeated verbatim " * 4

    def normal(i):
        return ("a genuinely unique document body about topic %d " % i) * 3

    def banded(rows):
        df = _mk_docs(spark, rows)
        sig = mh.add_minhash_signature(
            mh.add_shingles(df, n=3), num_hashes=64
        )
        return mh.banded_rows(sig, "doc_id", "minhash", bands=16)

    def scratch_keys(all_rows, max_bucket):
        b = banded(all_rows)
        if max_bucket is not None:
            b = mh.guard_banded(b, max_bucket)
        return {
            (r["doc_a"], r["doc_b"])
            for r in mh.pairs_from_bands(
                b, min_est_jaccard=THETA
            ).collect()
        }

    def state_keys(pairs):
        return {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}

    # epoch 0 — seed: 4 boilerplate docs (bucket size 4 <= B) plus
    # two near-dup normal docs
    seed_rows = [(1000 + i, boiler) for i in range(4)] + [
        (1, normal(7)), (2, normal(7).replace("topic", "subject"))
    ]
    seed_banded = banded(seed_rows).localCheckpoint()
    deltas = mh.guarded_insert_support(
        seed_banded, None, max_bucket=B, min_est_jaccard=THETA
    )
    pairs = mh.merge_support(None, deltas).localCheckpoint()
    index = seed_banded
    live = list(seed_rows)
    assert state_keys(pairs) == scratch_keys(live, B)
    assert (1000, 1001) in state_keys(pairs)  # bucket small: granted

    # epoch 1 — insert 6 more boilerplate: the bucket crosses 4→10,
    # support for the 6 old pairs is RETRACTED; plus one new normal
    ins_rows = [(1004 + i, boiler) for i in range(6)] + [(3, normal(9))]
    delta_banded = banded(ins_rows).localCheckpoint()
    deltas = mh.guarded_insert_support(
        delta_banded, index, max_bucket=B, min_est_jaccard=THETA
    )
    pairs = mh.merge_support(pairs, deltas).localCheckpoint()
    index = index.unionByName(delta_banded).localCheckpoint()
    live += ins_rows
    got = state_keys(pairs)
    assert got == scratch_keys(live, B)
    assert not any(a >= 1000 for a, _ in got)  # all boiler suppressed
    # the guard is doing real work: unguarded scratch scores the
    # quadratic bucket (45 boilerplate pairs) the guard suppressed
    assert len(scratch_keys(live, None)) == len(got) + 45

    # epoch 2 — delete 7 boilerplate: bucket shrinks 10→3, pairs
    # among the REMAINING members are re-granted
    gone_rows = [(1000 + i, boiler) for i in range(7)]
    gone_ids = spark.createDataFrame(
        [(r[0],) for r in gone_rows], "__gone long"
    )
    regrants = mh.guarded_delete_support(
        banded(gone_rows), index, gone_ids,
        max_bucket=B, min_est_jaccard=THETA,
    )
    dropped = pairs.join(
        F.broadcast(gone_ids), F.col("doc_a") == F.col("__gone"),
        "left_anti",
    ).join(
        F.broadcast(gone_ids), F.col("doc_b") == F.col("__gone"),
        "left_anti",
    )
    pairs = mh.merge_support(dropped, regrants).localCheckpoint()
    index = index.join(
        F.broadcast(gone_ids), F.col("__id") == F.col("__gone"),
        "left_anti",
    ).localCheckpoint()
    gone_set = {r[0] for r in gone_rows}
    live = [r for r in live if r[0] not in gone_set]
    got = state_keys(pairs)
    assert got == scratch_keys(live, B)
    # the three surviving boilerplate docs pair up again
    assert {(1007, 1008), (1007, 1009), (1008, 1009)} <= got


def test_lsh_live_state_bounded_plan_depth(spark):
    """Round-10 review fix (VERDICT r9 item 3): the live LSH twin's
    in-session state compacts every _LSH_COMPACT_EVERY epochs, so a
    long stream (24 commits here) keeps BOUNDED plan depth — part +
    tombstone lists and the index view's join count stay under the
    compaction threshold instead of growing O(epochs) — while the
    maintained pair set still equals guarded from-scratch LSH over
    the live docs exactly."""
    import io
    from contextlib import redirect_stdout

    from etl_lens_spark.queries.npipe11 import (
        _LSH_COMPACT_EVERY,
        _LSH_MAX_BUCKET,
        _LSH_THETA,
        _lsh_banded,
        _LshLiveState,
    )

    tmpl = (
        "document about subject %d with shared phrasing across the "
        "corpus body section %d and a long enough tail of words "
    )
    import functools

    def _join_count(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue().count("BroadcastHashJoin")

    state = _LshLiveState()
    # the UNCOMPACTED twin of the index view, maintained alongside:
    # same banded parts / tombstones, never folded — what the r9
    # code's plan looked like after the same 24 epochs
    parts_u: list = []
    tombs_u: list = []
    live: dict[int, str] = {}
    next_id = 0
    for epoch in range(24):
        if epoch % 4 == 3 and len(live) > 6:
            # delete two of the oldest live docs
            gone = sorted(live)[:2]
            rows = [(i, live[i]) for i in gone]
            state.apply_deletes(_mk_docs(spark, rows))
            tombs_u.append(
                _mk_docs(spark, rows)
                .select(F.col("doc_id").alias("__gone"))
                .localCheckpoint()
            )
            for i in gone:
                del live[i]
        else:
            # 3 docs; two share a template (near-dups of each other
            # and of earlier epochs' docs using the same template)
            rows = [
                (next_id, tmpl % (epoch % 5, 1)),
                (next_id + 1, tmpl % (epoch % 5, 1) + "extra tail"),
                (next_id + 2, tmpl % (97 + epoch, epoch)),
            ]
            next_id += 3
            state.apply_inserts(_mk_docs(spark, rows))
            parts_u.append(
                _lsh_banded(_mk_docs(spark, rows)).localCheckpoint()
            )
            live.update({i: t for i, t in rows})
        # the real bound: the view is BUILT from these lists, so
        # their size IS the plan depth, epoch-independent
        assert (
            len(state.index_parts) + len(state.tombstones)
            <= _LSH_COMPACT_EVERY + 1
        )
    view = state.index_view()
    view_u = functools.reduce(lambda a, b: a.unionByName(b), parts_u)
    for gone in tombs_u:
        view_u = view_u.join(
            F.broadcast(gone), F.col("__id") == F.col("__gone"),
            "left_anti",
        )
    # Catalyst pushes the anti-joins through the union, so physical
    # join count ~ parts × tombstones: O(epochs²) uncompacted vs a
    # K-bounded constant compacted. Pin the separation, not a
    # plan-format-fragile absolute.
    assert len(parts_u) == 18 and len(tombs_u) == 6
    assert _join_count(view) * 2 <= _join_count(view_u)
    assert view.count() == len(live) * 16  # one row per doc per band
    # and byte-equality of the two views: compaction changed nothing
    assert view_u.exceptAll(view).isEmpty()
    assert view.exceptAll(view_u).isEmpty()
    scratch = mh.pairs_from_bands(
        mh.guard_banded(
            _lsh_banded(
                _mk_docs(spark, sorted(live.items()))
            ),
            _LSH_MAX_BUCKET,
        ),
        min_est_jaccard=_LSH_THETA,
    )
    want = {(r["doc_a"], r["doc_b"]) for r in scratch.collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in state.pairs.collect()}
    assert want  # the fixture plants real near-dups
    assert got == want


def test_optimize_index_table_invisible_to_maintainer(spark, tmp_path):
    """VERDICT r9 item 5: per-epoch appends fragment a maintained
    index table into many small files; OPTIMIZE (data_change:false)
    must be invisible to BOTH consumers — the CDF feed emits nothing
    for the compaction commit, and the maintainer's next epoch
    probes the compacted index to the same pair set the uncompacted
    path yields (equality vs from-scratch still holds)."""
    import pytest

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import (
        _LSH_MAX_BUCKET,
        _LSH_THETA,
        _lsh_banded,
        _lsh_drop_pairs,
        _lsh_insert_deltas,
    )

    tmpl = (
        "shared corpus phrasing about subject %d with a long tail "
        "of section %d words to shingle over "
    )
    docs = {i: tmpl % (i % 3, 1) for i in range(9)}
    docs.update({i: tmpl % (90 + i, i) for i in range(9, 12)})
    bt = str(tmp_path / "opt_index")

    def mk(ids):
        return spark.createDataFrame(
            sorted((i, docs[i]) for i in ids),
            "doc_id long, text string",
        )

    # epoch 0: seed index (first fragment)
    seed_banded = _lsh_banded(mk(range(6))).localCheckpoint()
    seed_banded.write.parquet(f"{bt}/s0")
    lakelog.commit(bt, 0, [{"add": "s0"}])
    pairs = mh.merge_support(
        None, _lsh_insert_deltas(seed_banded)
    ).localCheckpoint()
    # epoch 1: append (second fragment)
    d1 = _lsh_banded(mk(range(6, 9))).localCheckpoint()
    pairs = mh.merge_support(
        pairs, _lsh_insert_deltas(d1, lakelog.read_snapshot(spark, bt))
    ).localCheckpoint()
    d1.write.parquet(f"{bt}/s1")
    lakelog.commit(bt, 1, [{"add": "s1"}])

    before = lakelog.read_snapshot(spark, bt).localCheckpoint()
    res = lakelog.optimize_compact(spark, bt)
    ov = res["version"]
    after = lakelog.read_snapshot(spark, bt)
    # (a) byte-identical index content across the compaction
    assert after.exceptAll(before).isEmpty()
    assert before.exceptAll(after).isEmpty()
    # (b) the CDF feed emits NOTHING for the compaction commit —
    # the range is refused as change-free, Delta's contract for a
    # data_change:false commit (the streaming source shares the same
    # classification and skips it)
    with pytest.raises(ValueError, match="no changes recorded"):
        lakelog.table_changes(spark, bt, ov - 1, ov)
    # (c) the maintainer's next epochs run against the compacted
    # index: insert probe + delete rewrite, equality still exact
    d2 = _lsh_banded(mk(range(9, 12))).localCheckpoint()
    pairs = mh.merge_support(
        pairs, _lsh_insert_deltas(d2, lakelog.read_snapshot(spark, bt))
    ).localCheckpoint()
    d2.write.parquet(f"{bt}/s2")
    lakelog.commit(bt, lakelog.latest_version(bt) + 1, [{"add": "s2"}])
    gone_ids = [1, 9]
    gone = spark.createDataFrame(
        [(i,) for i in gone_ids], "__gone long"
    )
    regrants = mh.guarded_delete_support(
        _lsh_banded(mk(gone_ids)),
        lakelog.read_snapshot(spark, bt),
        gone,
        max_bucket=_LSH_MAX_BUCKET,
        min_est_jaccard=_LSH_THETA,
    )
    pairs = mh.merge_support(
        _lsh_drop_pairs(pairs, gone), regrants
    ).localCheckpoint()
    live = [i for i in docs if i not in gone_ids]
    scratch = mh.pairs_from_bands(
        mh.guard_banded(_lsh_banded(mk(live)), _LSH_MAX_BUCKET),
        min_est_jaccard=_LSH_THETA,
    )
    want = {(r["doc_a"], r["doc_b"]) for r in scratch.collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert want and got == want
    # (d) a stale maintainer pinned at the pre-OPTIMIZE version still
    # reads the SAME logical content (snapshot isolation held)
    pre = lakelog.read_snapshot(spark, bt, ov - 1)
    assert pre.count() == before.count()


def test_lsh_live_state_reinsert_after_delete(spark):
    """Round-10 review regression: a tombstone must fold over only
    the index parts that PRECEDE it — the old view anti-joined every
    tombstone against the whole union, so a doc deleted and later
    re-inserted (routine on a CDF stream) vanished from the index,
    its pairs were never found again, and compaction made the loss
    permanent. Drive delete→re-insert ACROSS a compaction boundary
    and pin equality with from-scratch guarded LSH."""
    from etl_lens_spark.queries.npipe11 import (
        _LSH_COMPACT_EVERY,
        _LSH_MAX_BUCKET,
        _LSH_THETA,
        _lsh_banded,
        _LshLiveState,
    )

    text_a = "a document body with plenty of shared phrasing " * 3
    text_b = text_a.replace("plenty", "lots")
    state = _LshLiveState()
    state.apply_inserts(_mk_docs(spark, [(1, text_a), (2, text_b)]))
    state.apply_deletes(_mk_docs(spark, [(1, text_a)]))
    # re-insert doc 1 with the SAME id after its delete
    state.apply_inserts(_mk_docs(spark, [(1, text_a)]))
    live = [(1, text_a), (2, text_b)]
    # ... and survive a compaction (fold to one part, tombstones gone)
    for i in range(_LSH_COMPACT_EVERY):
        doc = (100 + i, f"filler body number {i} with its own words " * 3)
        state.apply_inserts(_mk_docs(spark, [doc]))
        live.append(doc)
    assert len(state.events) <= _LSH_COMPACT_EVERY + 1
    view = state.index_view()
    assert view.filter(F.col("__id") == 1).count() == 16  # all bands
    scratch = mh.pairs_from_bands(
        mh.guard_banded(_lsh_banded(_mk_docs(spark, live)), _LSH_MAX_BUCKET),
        min_est_jaccard=_LSH_THETA,
    )
    want = {(r["doc_a"], r["doc_b"]) for r in scratch.collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in state.pairs.collect()}
    assert (1, 2) in want  # the near-dup pair exists again
    assert got == want


def test_minhash_vectorized_fold_matches_expression(spark, sf_dir):
    """Round-11 optimization pin: the numpy XXH64 fold inside
    add_minhash_signature and the arrays_zip shingle build are
    BIT-IDENTICAL to the original all-expression formulations
    (aggregate/zip_with fold, per-shingle slice+concat) on fixture
    docs plus degenerate shapes (NULL text, empty text, fewer words
    than n, repeated shingles). A mismatch here means the vectorized
    XXH64 closed forms drifted from Spark's xxhash64 — which would
    silently move every LSH bucket. NULL text is load-bearing: the
    expression fold propagates NULL (NULL signatures drop out of the
    banding join), and round 11's vectorized fold initially emitted
    the all-MaxValue sentinel instead — pairing every NULL-text doc
    with every other at est_jaccard 1.0 (ADVICE r11, fixed r12)."""
    from etl_lens_spark.sources.tables import load_table

    n, k = 3, 64
    fixture = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    edges = spark.createDataFrame(
        [
            (100001, ""),
            (100002, "one"),
            (100003, "one two"),
            (100004, "one two three"),
            (100005, "one two three four"),
            (100006, "  spaced   out   words  "),
            (100007, "dup dup dup dup dup dup"),
            (100008, None),
        ],
        "doc_id long, text string",
    )
    docs = fixture.unionByName(edges)

    # original shingle formulation (pre round-11), verbatim
    words = F.split(
        __import__(
            "etl_lens_spark.dedup.exact", fromlist=["normalized_text"]
        ).normalized_text(F.col("text")),
        " ",
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    old_shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )
    old_sh = docs.withColumn("shingles", old_shingles)

    # original signature formulation (pre round-11), verbatim
    base = F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    init = F.array_repeat(F.lit((1 << 63) - 1), k)
    old_sig = F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.xxhash64(h, i),
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    old = old_sh.select("doc_id", F.col("shingles").alias("sh_a"),
                        old_sig.alias("sig_a"))

    new_df = mh.add_minhash_signature(
        mh.add_shingles(docs, n=n), num_hashes=k
    ).select("doc_id", F.col("shingles").alias("sh_b"),
             F.col("minhash").alias("sig_b"))

    joined = old.join(new_df, "doc_id")
    # NULL-safe comparison: plain != is NULL for NULL operands, which
    # would silently pass a NULL-vs-sentinel divergence
    assert joined.filter(
        ~F.col("sh_a").eqNullSafe(F.col("sh_b"))
    ).count() == 0
    assert joined.filter(
        ~F.col("sig_a").eqNullSafe(F.col("sig_b"))
    ).count() == 0
    # NULL text shingles as [''] exactly like empty text (the original
    # per-index formulation's behavior), so both share one signature
    rows = {
        r["doc_id"]: r
        for r in joined.filter(
            F.col("doc_id").isin(100001, 100008)
        ).collect()
    }
    assert rows[100008]["sh_b"] == [""]
    assert rows[100008]["sig_b"] == rows[100001]["sig_b"]
    assert joined.count() == docs.count()

    # and the vectorized fold itself propagates NULL arrays like the
    # expression fold does (aggregate over NULL is NULL) — reachable
    # by callers that hand add_minhash_signature a NULL shingle column
    null_arr = spark.createDataFrame(
        [(1, None), (2, ["a b c"])],
        "doc_id long, shingles array<string>",
    )
    got = {
        r["doc_id"]: r["minhash"]
        for r in mh.add_minhash_signature(null_arr, num_hashes=k).collect()
    }
    assert got[1] is None
    assert got[2] is not None and len(got[2]) == k
