"""Z-order layout (operators/layout.py): Morton-code arithmetic,
curve locality, and the pruning property the layout exists for —
fewer partitions intersect a single-dimension band under z-order
than under a linear sort on the other dimension."""

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.operators import layout as zl


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    n = 64
    return spark.range(n * n).select(
        (F.col("id") % n).cast("long").alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )


def test_interleave_matches_reference(spark):
    df = spark.range(256).select(
        (F.col("id") % 16).cast("long").alias("x"),
        (F.col("id") / 16).cast("long").alias("y"),
    )
    got = df.withColumn(
        "z", F.expr(zl.interleave_expr("x", "y", 4))
    ).collect()
    for r in got:
        assert r.z == _morton_ref(r.x, r.y, 4)
    assert len({r.z for r in got}) == 256  # bijective on the grid


def test_with_zvalue_scales_to_range(grid):
    z = zl.with_zvalue(grid, "x", "y", bits=6)
    lo, hi = z.agg(F.min("zval"), F.max("zval")).first()
    assert lo == 0 and hi == 64 * 64 - 1  # full 12-bit range, no gaps
    assert z.select("zval").distinct().count() == 64 * 64


def test_zorder_partitions_are_boxes_and_prune(grid):
    """The payoff: each z-order partition covers a compact box, so a
    band predicate on y touches few partitions; a linear sort on x
    gives tall slabs that a y-band intersects ALL of."""
    nparts = 16

    def band_hits(df):
        pid = df.withColumn("pid", F.spark_partition_id())
        spans = pid.groupBy("pid").agg(
            F.min("y").alias("ylo"), F.max("y").alias("yhi")
        )
        return spans.filter(
            (F.col("yhi") >= 0) & (F.col("ylo") < 8)
        ).count()

    zdf = zl.zorder_by(grid, "x", "y", bits=6, num_partitions=nparts)
    xdf = grid.repartitionByRange(nparts, F.col("x"))
    z_hits, x_hits = band_hits(zdf), band_hits(xdf)
    assert x_hits == nparts          # slabs: every partition spans all y
    assert z_hits <= nparts // 2     # boxes: band touches a minority
    # layout is a reshuffle, never a transformation of rows
    assert zdf.count() == 64 * 64


def test_coverage_ledger_has_no_drift():
    """COVERAGE.md must mention every registry query and annotate
    ✓SQL only on real oracle-backed names — the mechanical check the
    round-3 ledger drift (227 vs 230) motivated."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_coverage",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "gen_coverage.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = mod.load_registry()
    with open(mod.COVERAGE) as f:
        problems = mod.drift_report(registry, f.read())
    assert not problems, "\n".join(problems)


def test_hilbert_buckets_tighter_than_zorder(spark):
    from etl_lens_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    hz = all_queries()["lake_hilbert_cluster_stats"](spark, sf).collect()
    zo = all_queries()["zorder_cluster_stats"](spark, sf).collect()
    assert len(hz) == 64 and len(zo) == 64

    def avg_span(rows):
        return sum(r.x_span + r.y_span for r in rows) / len(rows)

    h, z = avg_span(hz), avg_span(zo)
    # Hilbert buckets must not be looser than Morton's on aggregate
    # (same dims, same bucket count; the curve with no seam jumps
    # yields equal-or-tighter bounding boxes)
    assert h <= z * 1.05, (h, z)
    # both bijective layouts cover every row
    assert sum(r.n_rows for r in hz) == sum(r.n_rows for r in zo)


def test_hilbert_value_matches_reference_bitops(spark):
    import random

    from etl_lens_spark.operators.layout import with_hilbert_value

    def xy2d_ref(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(13)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(200)]
    df = spark.createDataFrame(pts, "xk long, yk long")
    # identity scaling: bounds are [0,255] only if present; pin them
    df = df.union(spark.createDataFrame([(0, 0), (255, 255)],
                                        "xk long, yk long"))
    out = {
        (r.xk, r.yk): r.hval
        for r in with_hilbert_value(df, "xk", "yk", bits=8).collect()
    }
    for (x, y), h in out.items():
        assert h == xy2d_ref(256, x, y), (x, y, h)


def test_pruned_2d_read_matches_relational_census(spark, tmp_path):
    """Physical end-to-end for lake_layout_pruning_compare: write a
    Hilbert-bucketed table with 2-D stats in the log, and the
    multi-column pruned read must open exactly the files the
    relational bbox-intersection census predicts — and return
    exactly the box rows."""
    from etl_lens_spark.operators import lakelog

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("xk"), (F.col("id") / 64).cast("long").alias("yk")
    )
    # materialize the curve ONCE: re-optimizing the collapsed
    # unrolled-stage expression tree per bucket write is O(3^bits)
    # plan nodes x 16 jobs — the checkpoint makes each write trivial
    h = zl.with_hilbert_value(df, "xk", "yk", bits=6).localCheckpoint()
    base = str(tmp_path / "t")
    actions = []
    n_buckets = 16
    for b in range(n_buckets):
        rel = f"h{b}"
        h.filter(F.expr(f"hval >> {2 * 6 - 4}") == b).drop(
            "hval"
        ).write.parquet(f"{base}/{rel}")
        stats, nr = lakelog.file_stats_with_count(
            spark, f"{base}/{rel}", ["xk", "yk"]
        )
        actions.append({"add": rel, "stats": stats, "num_records": nr})
    lakelog.commit(base, 0, actions)
    box = {"xk": (10, 20), "yk": (10, 20)}
    pruned, n_total, n_scanned = lakelog.read_snapshot_pruned_2d(
        spark, base, box
    )
    # relational prediction from the same per-bucket boxes
    predicted = sum(
        1
        for a in actions
        if not (
            a["stats"]["xk"][1] < 10
            or a["stats"]["xk"][0] > 20
            or a["stats"]["yk"][1] < 10
            or a["stats"]["yk"][0] > 20
        )
    )
    assert n_total == n_buckets
    assert n_scanned == predicted < n_buckets  # it actually pruned
    got = pruned.filter(
        F.col("xk").between(10, 20) & F.col("yk").between(10, 20)
    ).count()
    assert got == 11 * 11  # every box row survives pruning


def test_layout_compare_curves_beat_scatter(spark, sf_dir):
    """The comparison query's contract: identical answers, fewer
    files — both curves strictly beat the scattered layout and the
    row count is layout-invariant."""
    from etl_lens_spark.queries import REGISTRY, all_queries

    all_queries()
    rows = {
        r["layout"]: r
        for r in REGISTRY["lake_layout_pruning_compare"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert rows["scatter"]["files_scanned"] == rows["scatter"]["n_files"]
    for curve in ("hilbert", "zorder"):
        assert rows[curve]["files_scanned"] < rows["scatter"]["files_scanned"] / 4
        assert rows[curve]["rows_in_box"] == rows["scatter"]["rows_in_box"]
