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
