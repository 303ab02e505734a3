"""Round-11 tranche-3 tests: statistics / codebook persistence
round-trips and their torn-read raises, and the stats-member atomic
swap observed through the multi-table log.

The registry queries (npipe14) pin the end-to-end loops against
DuckDB; these pin the raise paths and the version-resolution edge
the oracles can't reach.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.sources import sinks


def test_lexical_stats_roundtrip_and_torn_raise(spark):
    from etl_lens_spark.text import lexical

    df = lexical.stats_to_df(
        spark, 120, 34.5, {"spark": 40, "join": 7}, epoch=1
    )
    n, avgdl, dfm, epoch = lexical.stats_from_df(df)
    assert (n, avgdl, epoch) == (120, 34.5, 1)
    assert dfm == {"spark": 40, "join": 7}
    torn = df.union(
        lexical.stats_to_df(spark, 300, 34.5, {"spark": 90}, epoch=2)
    )
    with pytest.raises(ValueError, match="torn"):
        lexical.stats_from_df(torn)


def test_pq_codebooks_roundtrip_and_torn_raise(spark):
    import numpy as np

    from etl_lens_spark.similarity import pq

    t = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
    df = pq.codebooks_to_df(spark, t, epoch=5)
    back, epoch = pq.codebooks_from_df(df)
    assert epoch == 5 and np.array_equal(back, t)
    torn = df.union(pq.codebooks_to_df(spark, t, epoch=6))
    with pytest.raises(ValueError, match="torn"):
        pq.codebooks_from_df(torn)


def test_stats_member_swap_is_atomic_and_replayable(spark):
    """The re-stat commit swaps ONLY the stats member: the postings
    member is byte-identical across the swap, a reader at the old
    version still deserializes epoch-0 statistics after the swap
    landed, and the new version serves epoch-1 — the
    text_bm25_restats_swap contract at the log level."""
    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.text import lexical

    t = sinks.scratch_path("rstat_unit")
    shutil.rmtree(t, ignore_errors=True)
    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "join join filter")],
        "doc_id long, text string",
    )
    lexical.postings(docs).write.parquet(f"{t}/post/s0")
    lexical.stats_to_df(spark, 2, 2.5, {"join": 2}, epoch=0).coalesce(
        1
    ).write.parquet(f"{t}/stats/c0")
    lakelog.commit(t, 0, [{"add": "post/s0"}, {"add": "stats/c0"}])

    lexical.stats_to_df(spark, 9, 4.0, {"join": 5}, epoch=1).coalesce(
        1
    ).write.parquet(f"{t}/stats/c1")
    lakelog.commit(
        t, 1, [{"remove": "stats/c0"}, {"add": "stats/c1"}]
    )

    n0, _a0, dfm0, e0 = lexical.stats_from_df(
        lakelog.read_table_snapshot(spark, t, "stats", 0)
    )
    n1, _a1, dfm1, e1 = lexical.stats_from_df(
        lakelog.read_table_snapshot(spark, t, "stats", 1)
    )
    assert (n0, e0, dfm0["join"]) == (2, 0, 2)
    assert (n1, e1, dfm1["join"]) == (9, 1, 5)
    p0 = lakelog.read_table_snapshot(spark, t, "post", 0)
    p1 = lakelog.read_table_snapshot(spark, t, "post", 1)
    assert p0.exceptAll(p1).isEmpty() and p1.exceptAll(p0).isEmpty()
    shutil.rmtree(t, ignore_errors=True)


def test_live_postings_delete_then_reinsert_survives(spark):
    """The live lexical maintainer's state transitions: a document
    deleted in one epoch and re-inserted (new text) in a later one
    serves the NEW postings — the ordered-tombstone property on
    postings rows keyed by doc_id."""
    from etl_lens_spark.streaming.live_index import LiveIndexState
    from etl_lens_spark.text import lexical

    state = LiveIndexState("doc_id")
    state.append(
        lexical.postings(
            spark.createDataFrame(
                [(1, "spark spark"), (2, "join")],
                "doc_id long, text string",
            )
        ).localCheckpoint()
    )
    state.delete(
        spark.createDataFrame([(1,)], "g long")
        .select(F.col("g").alias("__gone"))
        .localCheckpoint()
    )
    state.append(
        lexical.postings(
            spark.createDataFrame(
                [(1, "filter")], "doc_id long, text string"
            )
        ).localCheckpoint()
    )
    got = {
        (r["doc_id"], r["term"], r["tf"])
        for r in state.view().collect()
    }
    assert got == {(1, "filter", 1), (2, "join", 1)}


def test_curation_insert_replacement_path(spark):
    """A delta doc with a SMALLER id than the standing keeper must
    evict it (the rule is total even though the registry fixture's
    planted copies all carry larger ids)."""
    from etl_lens_spark.text import curation

    curated = spark.createDataFrame(
        [("h1", 50, 30), ("h2", 7, 40)],
        "fp string, doc_id long, n_tokens long",
    )
    delta = spark.createDataFrame(
        [("h1", 12, 30), ("h1", 90, 30), ("h3", 3, 25)],
        "fp string, doc_id long, n_tokens long",
    )
    adds, replaced = curation.insert_deltas(delta, curated)
    assert {(r["fp"], r["doc_id"]) for r in adds.collect()} == {
        ("h1", 12),
        ("h3", 3),
    }
    assert {(r["fp"], r["doc_id"]) for r in replaced.collect()} == {
        ("h1", 50)
    }


def test_curation_delete_promotion_and_extinction(spark):
    """Deleting a keeper promotes the next-smallest SURVIVING
    duplicate; deleting the last copy removes the fingerprint with
    no promotion."""
    from pyspark.sql import functions as F

    from etl_lens_spark.text import curation

    support = spark.createDataFrame(
        [("h1", 1, 30), ("h1", 9, 30), ("h1", 4, 30), ("h2", 2, 40)],
        "fp string, doc_id long, n_tokens long",
    )
    curated = curation.elect_keepers(support)
    gone = spark.createDataFrame([(1,), (2,)], "g long").select(
        F.col("g").alias("__gone")
    )
    support_after = support.join(
        gone, F.col("doc_id") == F.col("__gone"), "left_anti"
    )
    removed, promoted = curation.delete_deltas(
        support_after, curated, gone
    )
    assert {(r["fp"], r["doc_id"]) for r in removed.collect()} == {
        ("h1", 1),
        ("h2", 2),
    }
    # h1 re-elects its smallest survivor; h2 went extinct
    assert {(r["fp"], r["doc_id"]) for r in promoted.collect()} == {
        ("h1", 4)
    }


def test_curation_gate_is_text_deterministic(spark):
    """Exact duplicates agree on the gate (it is a pure function of
    the text) — the property that keeps the keeper rule total."""
    from etl_lens_spark.text import curation

    good = " ".join(f"w{i}" for i in range(30))  # 30 unique tokens
    docs = spark.createDataFrame(
        [(1, good), (1_000_001, good), (2, "too short")],
        "doc_id long, text string",
    )
    got = curation.gate(docs).collect()
    assert {r["doc_id"] for r in got} == {1, 1_000_001}
    fps = {r["fp"] for r in got}
    assert len(fps) == 1  # identical text, identical fingerprint


def test_neardup_component_merge_and_split(spark):
    """The component structure is NOT pairwise: an arriving doc can
    MERGE two components and a departing doc can SPLIT one — the
    reason the curated member re-derives from the maintained pair
    set instead of being delta-patched."""
    from pyspark.sql import functions as F

    from etl_lens_spark.dedup.embedding import connected_components

    def elect(pairs_rows, gated_ids):
        pairs = spark.createDataFrame(
            pairs_rows, "doc_a long, doc_b long"
        )
        nodes = (
            pairs.select(F.col("doc_a").alias("node"))
            .unionByName(pairs.select(F.col("doc_b").alias("node")))
            .distinct()
        )
        cc = connected_components(
            nodes,
            pairs.select(
                F.col("doc_a").alias("src"),
                F.col("doc_b").alias("dst"),
            ),
        )
        singles = spark.createDataFrame(
            [(i,) for i in gated_ids], "node long"
        ).join(nodes, "node", "left_anti")
        comp = cc.select("node", "component").unionByName(
            singles.select(
                "node", F.col("node").alias("component")
            )
        )
        return {
            (r["doc_id"], r["n_members"])
            for r in comp.groupBy(
                F.col("component").alias("doc_id")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
            .collect()
        }

    ids = [1, 2, 3, 4, 9]
    # two components {1,2} and {3,4} plus singleton 9
    assert elect([(1, 2), (3, 4)], ids) == {(1, 2), (3, 2), (9, 1)}
    # doc 9's pairs MERGE them into one component of 5
    assert elect([(1, 2), (3, 4), (2, 9), (9, 3)], ids) == {(1, 5)}
    # deleting doc 9 (and its pairs) SPLITS back into two + no 9
    assert elect([(1, 2), (3, 4)], [1, 2, 3, 4]) == {(1, 2), (3, 2)}


def test_kmv_contamination_dial_is_exact(spark):
    """A deleted ORDER whose customer still has surviving orders in
    the same group does NOT contaminate the sketch (the distinct-key
    universe did not change); only a key that FULLY left its group
    does. The dial = sketch ∩ (v1-keys EXCEPT head-keys)."""
    from pyspark.sql import functions as F

    from etl_lens_spark.operators import kmv

    def hashes(rows):
        df = spark.createDataFrame(rows, "grp string, o_custkey long")
        return df.select(
            "grp", kmv.kmv_value(F.col("o_custkey")).alias("v")
        ).distinct()

    # v1 state: group A holds customers 1, 2 (cust 1 via two orders)
    v1 = hashes([("A", 1), ("A", 1), ("A", 2)])
    sketch = kmv.kmv_topk(v1, ["grp"], 64).localCheckpoint()
    # delete ONE of cust 1's orders: cust 1 survives, universe same
    head_same = hashes([("A", 1), ("A", 2)])
    gone = v1.exceptAll(head_same)
    assert sketch.join(gone, ["grp", "v"], "left_semi").count() == 0
    # delete BOTH of cust 1's orders: cust 1 fully left -> 1 row
    head_less = hashes([("A", 2)])
    gone2 = v1.exceptAll(head_less)
    assert sketch.join(gone2, ["grp", "v"], "left_semi").count() == 1
