"""Count-min sketch as a relation — mergeable frequency sketches for
heavy-hitter detection at 100 TB, built entirely from JVM-side
expressions (no Python on the data path).

Representation: a CMS of shape ``depth × width`` is the sparse
relation ``(r, c, cnt)`` — row ``r`` of the sketch, counter column
``c = xxhash64(key, r) mod width``, summed count. The build is ONE
scan + ONE shuffle: each input row explodes to its ``depth``
positions and ``groupBy(r, c).sum`` aggregates them. Spark's partial
(map-side) aggregation bounds every partition's shuffle output at
``depth × width`` rows regardless of partition size — the map-side
hash table literally IS the per-partition sketch, and the shuffle
reduce IS the sketch merge. Counts are linear, so merging two
sketches (union + re-sum) is EXACT, not approximate — only point
estimates carry the standard CMS overestimate, bounded by
``e/width · N`` with probability ``1 - e^-depth``.

Point estimates broadcast the sketch (≤ depth·width rows by
construction, independent of data size) against the candidate keys
and take ``min`` over the ``depth`` rows. A key absent from every
row estimates 0 — CMS never underestimates, which is what makes the
heavy-hitter prefilter exact-identity-safe (see
``cms_heavy_hitters`` in queries/funcs_q.py: survivors are re-counted
exactly, and no true heavy hitter can be filtered out).

Reference parity: like operators/bloom.py, this is [L]/[N]-surface
infrastructure with no direct reference counterpart; SQLite's
(unwired) surface has no sketch aggregates at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, depth: int, width: int) -> list[Column]:
    return [
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(F.xxhash64(key, F.lit(r)), F.lit(width)).alias("c"),
        )
        for r in range(depth)
    ]


def cms_sketch(
    df: DataFrame,
    key: str | Column,
    depth: int = 5,
    width: int = 4096,
) -> DataFrame:
    """Build the sketch relation ``(r, c, cnt)`` over ``df[key]``.

    One scan, one shuffle; map-side combine caps per-partition shuffle
    output at ``depth × width`` rows.
    """
    kc = F.col(key) if isinstance(key, str) else key
    return (
        df.select(
            F.explode(F.array(*_positions(kc, depth, width))).alias("p")
        )
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, key hash).

    Counts are linear: union + re-sum is exactly the sketch of the
    concatenated inputs (bit-identical, test-asserted)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key: str | Column,
    depth: int = 5,
    width: int = 4096,
) -> DataFrame:
    """Estimated count per candidate row: ``min`` over the ``depth``
    hashed counters. Never underestimates. The sketch (≤ depth·width
    rows) broadcasts; candidates stream through unshuffled except the
    final per-key min — grouped on the candidate key, which the
    caller keeps small (heavy-hitter candidates, not the raw data).
    """
    kc = F.col(key) if isinstance(key, str) else key
    name = key if isinstance(key, str) else candidates.select(kc).columns[0]
    pos = (
        candidates.select(
            kc.alias(name),
            F.explode(F.array(*_positions(kc, depth, width))).alias("p"),
        )
        .select(name, "p.r", "p.c")
    )
    return (
        pos.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(name)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
