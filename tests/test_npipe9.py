"""Round-7 tranche contracts: the ANN operating curve's monotonicity
and endpoint guarantees (the parts a rows-only check can't see)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def curve(spark):
    from etl_lens_spark.queries.npipe9 import sim_ann_operating_curve

    rows = sim_ann_operating_curve(
        spark, "/root/testdata/sf0.001"
    ).collect()
    return sorted(rows, key=lambda r: r["nprobe"])


def test_ann_curve_recall_monotone(curve):
    """More probes can only ADD candidate cells, so recall@k is
    nondecreasing in nprobe — the property that makes the curve a
    tuning artifact instead of noise."""
    recalls = [r["recall_at_k"] for r in curve]
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))


def test_ann_curve_candidates_monotone_and_bounded(curve):
    """Scan cost strictly grows with nprobe and never exceeds the
    exhaustive bound (n_queries × (corpus − 1) at nprobe=n_cells,
    when every cell is probed and only self is excluded)."""
    cands = [r["candidates_scanned"] for r in curve]
    assert all(a < b for a, b in zip(cands, cands[1:]))
    n_q, corpus = 20, 500
    assert cands[-1] == n_q * (corpus - 1)


def test_ann_curve_endpoint_is_exact_search(curve):
    """nprobe = n_cells probes every cell — identical candidate set
    to brute force, so recall@k must be exactly 1.0."""
    assert curve[-1]["nprobe"] == 16
    assert curve[-1]["recall_at_k"] == 1.0


def test_ann_curve_shape(curve):
    assert [r["nprobe"] for r in curve] == [1, 2, 4, 8, 16]
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in curve)
    assert all(
        abs(
            r["avg_candidates_per_query"] * 20
            - r["candidates_scanned"]
        )
        < 1e-6
        for r in curve
    )


@pytest.fixture(scope="module")
def lsh_curve(spark):
    from etl_lens_spark.queries.npipe9 import sim_ann_lsh_operating_curve

    rows = sim_ann_lsh_operating_curve(
        spark, "/root/testdata/sf0.001"
    ).collect()
    return sorted(rows, key=lambda r: r["probes"])


def test_lsh_curve_monotone_by_prefix_property(lsh_curve):
    """Probe sets are prefix-ordered (exact bucket, then flips by
    ascending |projection|), so each point's candidate set contains
    the previous one: candidates strictly grow, recall never drops."""
    cands = [r["candidates_scanned"] for r in lsh_curve]
    recalls = [r["recall_at_k"] for r in lsh_curve]
    assert all(a < b for a, b in zip(cands, cands[1:]))
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))


def test_lsh_curve_plateaus_below_exact(lsh_curve):
    """Flip-1 multi-probe never covers all 2^n_bits buckets, so the
    max-probe endpoint must stay below recall 1.0 (the documented
    contrast with the IVF curve's exact endpoint) while still
    improving on single-probe."""
    assert [r["probes"] for r in lsh_curve] == [1, 2, 3, 4, 5]
    assert lsh_curve[-1]["recall_at_k"] < 1.0
    assert lsh_curve[-1]["recall_at_k"] >= lsh_curve[0]["recall_at_k"]
    # scan cost stays a small fraction of exhaustive (20 × 499)
    assert lsh_curve[-1]["candidates_scanned"] < 20 * 499 * 0.5


# ---------------------------------------------------------------------------
# Round 8: multi-table LSH retriever contracts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mt_curve(spark):
    from etl_lens_spark.queries.npipe10 import sim_ann_lsh_multitable

    rows = sim_ann_lsh_multitable(
        spark, "/root/testdata/sf0.001"
    ).collect()
    return sorted(rows, key=lambda r: r["n_tables"])


def test_lsh_multitable_monotone_in_tables(mt_curve):
    """Candidate sets are PREFIX-UNIONS over tables 0..L−1, so both
    recall and post-dedup scan cost are nondecreasing in L by
    construction — the contract that makes the tables axis a tuning
    knob."""
    recalls = [r["recall_at_k"] for r in mt_curve]
    cands = [r["candidates_scored"] for r in mt_curve]
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
    assert all(a <= b for a, b in zip(cands, cands[1:]))


def test_lsh_multitable_l1_equals_single_table_plateau(
    mt_curve, lsh_curve
):
    """The L=1 point IS the single-table curve's plateau point (same
    seed-42 planes, same probes=5 flip-1 depth) — pins the two
    artifacts to one geometry so the tables-axis lift is measured
    from the recorded plateau, not a lookalike."""
    l1 = mt_curve[0]
    plateau = lsh_curve[-1]
    assert l1["n_tables"] == 1 and plateau["probes"] == 5
    assert abs(l1["recall_at_k"] - plateau["recall_at_k"]) < 1e-12
    assert l1["candidates_scored"] == plateau["candidates_scanned"]


def test_lsh_multitable_lifts_the_plateau(mt_curve):
    """The deployment claim the round-7 curve recorded ('deploy
    multiple tables'): more independent tables strictly lift recall
    above the single-table plateau on this fixture."""
    assert mt_curve[-1]["recall_at_k"] > mt_curve[0]["recall_at_k"]
