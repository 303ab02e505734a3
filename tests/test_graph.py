"""Embedding near-dup + connected-components semantics: CC on a known
graph, convergence/idempotence, and LSH-blocked pair recall against
the exact plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.dedup import embedding as emb


def test_cc_known_graph(spark):
    # components: {1,2,3,4} (chain), {5,6}, {7} singleton
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (5, 6)], "src long, dst long"
    )
    got = {
        (r.node, r.component)
        for r in emb.connected_components(nodes, edges).collect()
    }
    assert got == {
        (1, 1),
        (2, 1),
        (3, 1),
        (4, 1),
        (5, 5),
        (6, 5),
        (7, 7),
    }


def test_cc_idempotent_on_converged_labels(spark):
    # running CC on a graph whose labels are already the fixpoint
    # changes nothing (second run == first run)
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    edges = spark.createDataFrame([(1, 2), (4, 5)], "src long, dst long")
    first = sorted(
        (r.node, r.component)
        for r in emb.connected_components(nodes, edges).collect()
    )
    second = sorted(
        (r.node, r.component)
        for r in emb.connected_components(nodes, edges).collect()
    )
    assert first == second


def test_lsh_pairs_recall(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b) for r in emb.cosine_pairs(e, 0.35).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in emb.cosine_pairs_lsh(
            e, 0.35, dim=64, n_bits=4, n_bands=16
        ).collect()
    }
    # no false positives: every reported pair really clears tau
    assert approx <= exact
    # recall at the loose test threshold (see graph_q docstring)
    assert len(approx & exact) / len(exact) >= 0.8
