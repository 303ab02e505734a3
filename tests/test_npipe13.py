"""Round-11 tranche tests: CDF change-type folding for live
maintainers, the lexical index algebra (text/lexical.py), centroid
persistence + torn-read detection, rewrite_minus_ids conflict retry,
and the auto-OPTIMIZE cadence hook.

The registry queries (npipe13) pin the end-to-end contracts against
DuckDB; these tests pin the sharp edges the oracles can't reach —
ordering within a commit, the raise paths, and a deterministic
lost-race interleave.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.sources import sinks


# ---------------------------------------------------------------------------
# split_version_changes: the CDF → maintenance-rule fold
# ---------------------------------------------------------------------------


def _cdf_frame(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, _change_type string"
    )


def test_split_version_changes_upsert_mapping(spark):
    """update_postimage folds to insert, update_preimage to delete —
    an upsert-emitting source maintains the index instead of
    silently corrupting it (round-10 ADVICE, medium)."""
    from etl_lens_spark.streaming.live_index import (
        split_version_changes,
    )

    vdf = _cdf_frame(
        spark,
        [
            (1, "old", "update_preimage"),
            (1, "new", "update_postimage"),
            (2, "fresh", "insert"),
            (3, "dead", "delete"),
        ],
    )
    dels, ins = split_version_changes(vdf)
    assert {(r["doc_id"], r["text"]) for r in dels.collect()} == {
        (1, "old"),
        (3, "dead"),
    }
    assert {(r["doc_id"], r["text"]) for r in ins.collect()} == {
        (1, "new"),
        (2, "fresh"),
    }


def test_split_version_changes_unknown_type_raises(spark):
    from etl_lens_spark.streaming.live_index import (
        split_version_changes,
    )

    vdf = _cdf_frame(spark, [(1, "x", "truncate")])
    with pytest.raises(ValueError, match="truncate"):
        split_version_changes(vdf)


def test_same_version_replace_survives_live_state(spark):
    """A same-key replace expressed as delete+insert in ONE commit
    must keep the new row: deletes apply before inserts, so the
    tombstone folds over the old part only (round-10 ADVICE — the
    insert-first order tombstoned the just-appended rows)."""
    from etl_lens_spark.streaming.live_index import (
        LiveIndexState,
        split_version_changes,
    )

    state = LiveIndexState("doc_id")
    state.append(
        spark.createDataFrame(
            [(1, "v1"), (2, "keep")], "doc_id long, text string"
        ).localCheckpoint()
    )
    vdf = _cdf_frame(
        spark,
        [(1, "v1", "delete"), (1, "v2", "insert")],
    )
    dels, ins = split_version_changes(vdf)
    state.delete(
        dels.select(F.col("doc_id").alias("__gone"))
        .distinct()
        .localCheckpoint()
    )
    state.append(ins.select("doc_id", "text").localCheckpoint())
    got = {
        (r["doc_id"], r["text"]) for r in state.view().collect()
    }
    assert got == {(1, "v2"), (2, "keep")}


# ---------------------------------------------------------------------------
# Lexical index algebra
# ---------------------------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join spark filter"),
            (2, "join the fast join path"),
            (3, "filter only"),
        ],
        "doc_id long, text string",
    )


def test_postings_tf_and_dlen(spark):
    from etl_lens_spark.text import lexical

    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["dlen"])
        for r in lexical.postings(_docs(spark)).collect()
    }
    assert rows[("spark", 1)] == (2, 4)
    assert rows[("join", 1)] == (1, 4)
    assert rows[("join", 2)] == (2, 5)
    assert rows[("filter", 3)] == (1, 2)


def test_bm25_topk_frozen_vs_current_stats(spark):
    """Serving is a pure function of (postings, given stats): the
    same index under two different statistics ranks differently —
    the drift dial's whole premise — and under identical stats is
    deterministic."""
    from etl_lens_spark.text import lexical

    post = lexical.postings(_docs(spark)).localCheckpoint()
    n_docs, avgdl = lexical.corpus_stats(post)
    df_map = lexical.df_stats(post, ["join", "spark"])
    a = lexical.bm25_topk(
        post, ["join", "spark"], n_docs, avgdl, df_map, k=3
    ).collect()
    b = lexical.bm25_topk(
        post, ["join", "spark"], n_docs, avgdl, df_map, k=3
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # doc 1 holds 2 sparks + 1 join, doc 2 holds 2 joins: both beat 3
    assert {r["doc_id"] for r in a[:2]} == {1, 2}
    skewed = lexical.bm25_topk(
        post, ["join", "spark"], n_docs, avgdl,
        {"join": n_docs, "spark": 0},  # join worthless, spark precious
        k=3,
    ).collect()
    assert skewed[0]["doc_id"] == 1


def test_bm25_unseen_term_scores_df_zero(spark):
    """A term missing from the frozen statistics still scores (df=0,
    maximally informative) — new-vocabulary docs appearing in the
    delta are retrievable before the next re-stat."""
    from etl_lens_spark.text import lexical

    post = lexical.postings(_docs(spark))
    n_docs, avgdl = lexical.corpus_stats(post)
    got = lexical.bm25_topk(
        post, ["fast"], n_docs, avgdl, {}, k=3
    ).collect()
    assert [r["doc_id"] for r in got] == [2]
    assert got[0]["score"] > 0


def test_phrase_hits_adjacency(spark):
    from etl_lens_spark.text import lexical

    docs = spark.createDataFrame(
        [
            (1, "a big table scan runs a big table scan"),
            (2, "big scan table"),  # terms present, order wrong
            (3, "the big table scan"),
        ],
        "doc_id long, text string",
    )
    pos = lexical.positional_tokens(docs)
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in lexical.phrase_hits(
            pos, ["big", "table", "scan"]
        ).collect()
    }
    assert got == {1: (2, 2), 3: (1, 2)}


# ---------------------------------------------------------------------------
# Centroid persistence: the swap's torn-read guard
# ---------------------------------------------------------------------------


def test_centroids_roundtrip_and_torn_raise(spark):
    import numpy as np

    from etl_lens_spark.similarity import ivf

    m = np.arange(12, dtype=np.float64).reshape(3, 4)
    df = ivf.centroids_to_df(spark, m, epoch=2)
    back, epoch = ivf.centroids_from_df(df)
    assert epoch == 2 and np.array_equal(back, m)
    torn = df.union(ivf.centroids_to_df(spark, m, epoch=3))
    with pytest.raises(ValueError, match="torn"):
        ivf.centroids_from_df(torn)


# ---------------------------------------------------------------------------
# rewrite_minus_ids: lost race redoes the rewrite against the winner
# ---------------------------------------------------------------------------


def test_rewrite_minus_ids_conflict_retry(spark, monkeypatch):
    """Deterministic interleave: a racer lands a commit between the
    rewrite's snapshot read and its commit. The rewrite must lose
    the O_EXCL race, clean up its stranded rel, and REDO the
    anti-join against the winner's snapshot — so the racer's rows
    survive the delete instead of being silently dropped (round-10
    ADVICE, low)."""
    from etl_lens_spark.operators import lakelog

    t = sinks.scratch_path("rmi_retry")
    shutil.rmtree(t, ignore_errors=True)
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    ).write.parquet(f"{t}/s0")
    lakelog.commit(t, 0, [{"add": "s0"}])

    racer_rows = spark.createDataFrame([(9, 90)], "k long, v long")
    real_commit = lakelog.commit
    fired = {"done": False}

    def racing_commit(table_dir, version, actions):
        if not fired["done"] and table_dir == t:
            fired["done"] = True
            racer_rows.write.parquet(f"{t}/racer")
            real_commit(t, version, [{"add": "racer"}])
        return real_commit(table_dir, version, actions)

    monkeypatch.setattr(lakelog, "commit", racing_commit)
    gone = spark.createDataFrame([(2,)], "g long").select(
        F.col("g").alias("__gone")
    )
    res = lakelog.rewrite_minus_ids(spark, t, gone, "k")
    monkeypatch.setattr(lakelog, "commit", real_commit)

    got = {
        (r["k"], r["v"])
        for r in lakelog.read_snapshot(spark, t).collect()
    }
    # racer's row survives AND the delete applied
    assert got == {(1, 10), (3, 30), (9, 90)}
    # the first attempt's stranded rel was cleaned up
    stranded = [
        d
        for d in os.listdir(t)
        if d.startswith("minus_") and d != res["rel"]
    ]
    assert stranded == []
    shutil.rmtree(t, ignore_errors=True)


# ---------------------------------------------------------------------------
# maybe_optimize: the cadence hook's boundary
# ---------------------------------------------------------------------------


def test_maybe_optimize_threshold(spark):
    from etl_lens_spark.operators import lakelog

    t = sinks.scratch_path("aopt_unit")
    shutil.rmtree(t, ignore_errors=True)
    for i in range(3):
        spark.createDataFrame(
            [(i, i * 10)], "k long, v long"
        ).write.parquet(f"{t}/e{i}")
        lakelog.commit(t, i, [{"add": f"e{i}"}])

    res = lakelog.maybe_optimize(spark, t, max_files=3)
    assert res["triggered"] is False and res["n_files"] == 3
    assert len(lakelog.snapshot_actions(t)) == 3

    res = lakelog.maybe_optimize(spark, t, max_files=2)
    assert res["triggered"] is True
    assert len(lakelog.snapshot_actions(t)) == 1
    got = {
        (r["k"], r["v"])
        for r in lakelog.read_snapshot(spark, t).collect()
    }
    assert got == {(0, 0), (1, 10), (2, 20)}
    shutil.rmtree(t, ignore_errors=True)
