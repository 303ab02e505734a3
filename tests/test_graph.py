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


def test_recursive_closure_terminates_on_cycles(spark):
    """UNION-distinct recursion must reach a fixpoint on cyclic
    graphs (the subtract-before-frontier rule) — here the reachability
    closure of a 3-cycle plus a tail."""
    from etl_lens_spark.operators.fixpoint import recursive_closure

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    ).localCheckpoint(eager=True)
    base = edges.select("src", F.col("dst").alias("reach"))

    def expand(frontier):
        e = edges.select(F.col("src").alias("__s"), F.col("dst").alias("__d"))
        return frontier.join(e, frontier.reach == F.col("__s")).select(
            "src", F.col("__d").alias("reach")
        )

    got = {
        (r["src"], r["reach"])
        for r in recursive_closure(base, expand, max_iter=10).collect()
    }
    # every node in the cycle reaches all of {1,2,3,4}; node 4 reaches nothing
    expected = {(s, r) for s in (1, 2, 3) for r in (1, 2, 3, 4)} | set()
    assert got == expected


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from etl_lens_spark.queries import all_queries
    from etl_lens_spark.sources.tables import load_table

    got = all_queries()["graph_pagerank_bipartite"](spark, sf_dir).collect()
    assert len(got) >= 5  # sf0.001 has 10 suppliers; top-20 truncates

    # numpy reference on the same edge set
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
        .collect()
    )
    edges = [(r["src"], r["dst"]) for r in pairs]
    edges += [(d, s) for s, d in edges]
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(25):  # must match the query's fixed iteration count
        nr = np.full(n, 0.15 / n)
        shares = r / deg
        for s, d in edges:
            nr[idx[d]] += 0.85 * shares[idx[s]]
        r = nr
    ref = sorted(
        ((nodes[i], r[i]) for i in range(n) if nodes[i].startswith("s")),
        key=lambda t: (-t[1], t[0]),
    )[: len(got)]
    got_map = {row["node"]: row["rank"] for row in got}
    assert set(got_map) == {nm for nm, _ in ref}
    for nm, rv in ref:
        assert abs(got_map[nm] - rv) < 1e-5, (nm, got_map[nm], rv)


def test_modularity_merge_improves_q(spark):
    from etl_lens_spark.queries import all_queries

    r = all_queries()["graph_modularity_best_merge"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert r.n_mutual_pairs > 0
    # merging mutual best (positive-gain) pairs must raise modularity
    assert r.q_after_merge > r.q_singletons
    assert -1.0 <= r.q_singletons <= 1.0
    assert -1.0 <= r.q_after_merge <= 1.0
