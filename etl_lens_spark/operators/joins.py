"""Join operators Spark lacks natively: as-of join and point-in-range
join — composed from equi-joins + windows so they scale (SURVEY §2.2
maps SQLite's theta-join surface onto these compositions).

Both avoid the naive theta-join (BroadcastNestedLoop) plan, which is
O(n*m) and falls over at scale:

- ``as_of_join``: the union trick — interleave both sides on the time
  axis, one shuffle on the key, a single ordered window pass carries
  the latest right-side values forward onto left rows. O(n log n)
  within partition, no pair explosion, skew bounded by the hottest
  key (same as any keyed window).
- ``range_join_point``: band the range dimension into fixed-width
  buckets; left intervals explode to their covered buckets, right
  points land in one bucket; an equi-join on (key, bucket) restores
  hash-join locality and the residual predicate trims the edges.
  Bucket width trades explosion factor vs candidate ratio.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str],
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the most recent right
    row with the same key and ``right_time <= left_time`` (backward;
    ties included, right-at-equal-time wins — pandas ``merge_asof``
    semantics, DuckDB ``ASOF JOIN`` semantics).

    Columns of ``left`` are preserved; ``right_payload`` columns are
    appended (NULL when no match). ``tolerance``: optional max age of
    the match as a Column of the same unit as the time columns.
    """
    if direction != "backward":
        raise NotImplementedError("forward as-of: negate the time axis")

    lt = left.withColumn("__t", F.col(left_time)).withColumn(
        "__is_left", F.lit(1)
    )
    rt = right.withColumn("__t", F.col(right_time)).withColumn(
        "__is_left", F.lit(0)
    )
    # align schemas: left keeps its columns; right contributes key,
    # time and payload; union with explicit null padding
    payload_tagged = [f"__r_{c}" for c in right_payload]
    rt = rt.select(
        *on,
        "__t",
        "__is_left",
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    lt = lt.select(
        *left.columns,
        "__t",
        "__is_left",
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
    )
    for c in left.columns:
        if c not in on and c not in ("__t", "__is_left"):
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))

    # right rows sort before left rows at equal time → <= semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumns(
        {
            c: F.last(F.col(c), ignorenulls=True).over(w)
            for c in payload_tagged
        }
    ).withColumn(
        "__match_t",
        F.last(
            F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
        ).over(w),
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        too_old = (F.col("__t") - F.col("__match_t")) > tolerance
        out = out.withColumns(
            {
                c: F.when(too_old, F.lit(None)).otherwise(F.col(c))
                for c in payload_tagged
            }
        )
    return out.select(
        *left.columns,
        *[F.col(f"__r_{c}").alias(f"right_{c}") for c in right_payload],
    )


def range_join_point(
    intervals: DataFrame,
    points: DataFrame,
    on: list[str],
    lo: str,
    hi: str,
    point: str,
    bucket_width: float,
) -> DataFrame:
    """Equi-key + range join: pair each interval row with the point
    rows whose ``point`` falls in [lo, hi] and whose keys match.

    Banded plan: intervals explode to ceil((hi-lo)/width)+1 bucket
    rows; points map to one bucket; hash join on (key..., bucket);
    residual BETWEEN filter. Pick ``bucket_width`` ~ the typical
    interval length so the explosion factor stays ~2.
    """
    b = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / b).cast("long"),
                F.floor(F.col(hi) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point) / b).cast("long"))
    joined = iv.join(pt, [*on, "__bucket"]).filter(
        F.col(point).between(F.col(lo), F.col(hi))
    )
    return joined.drop("__bucket")
