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
    """For each left row, attach the payload of the matched right row
    with the same key (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics; ties at equal time always match):

    - ``backward``: most recent right row with ``right_time <= left_time``
    - ``forward``: earliest right row with ``right_time >= left_time``
    - ``nearest``: whichever of the two is closer in time
      (tie → backward, matching pandas)

    Columns of ``left`` are preserved; ``right_payload`` columns are
    appended as ``right_<name>`` (NULL when no match). All payload
    columns come from the ONE matched row — including that row's own
    NULLs (carried as a single struct, never back-filled from older
    rows). ``tolerance``: optional max |time distance| of the match,
    as a Column in the time columns' unit (µs if they're timestamps).

    Plan: union trick — one shuffle on the key, ordered window pass,
    no pair explosion; O(n log n) per partition at any scale.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")

    # right contributes key + time + ONE struct holding (match time,
    # payload...) so the carry is atomic per matched row
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias("__mt"),
            *[F.col(c) for c in right_payload],
        ).alias("__m"),
    )
    m_type = rt.schema["__m"].dataType
    lt = left.select(
        *left.columns,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(m_type).alias("__m"),
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))

    def _us(col: Column) -> Column:
        # numeric distance: timestamps → epoch µs, numerics as-is
        if dict(left.dtypes)[left_time].startswith("timestamp"):
            return F.unix_micros(col)
        return col

    right_m = F.when(F.col("__is_left") == 0, F.col("__m"))
    # at equal __t, right rows (__is_left=0) precede left rows in both
    # orders → ties always included (<= / >= semantics)
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    if direction == "backward":
        carried = unioned.withColumn(
            "__mf", F.last(right_m, ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        carried = unioned.withColumn(
            "__mf", F.last(right_m, ignorenulls=True).over(w_fwd)
        )
    else:  # nearest: both passes share the one shuffle (same keys)
        b = F.last(right_m, ignorenulls=True).over(w_back)
        fw = F.last(right_m, ignorenulls=True).over(w_fwd)
        carried = unioned.withColumn("__mb", b).withColumn("__mw", fw)
        back_dist = _us(F.col("__t")) - _us(F.col("__mb.__mt"))
        fwd_dist = _us(F.col("__mw.__mt")) - _us(F.col("__t"))
        carried = carried.withColumn(
            "__mf",
            F.when(F.col("__mb").isNull(), F.col("__mw"))
            .when(F.col("__mw").isNull(), F.col("__mb"))
            .when(back_dist <= fwd_dist, F.col("__mb"))  # tie → backward
            .otherwise(F.col("__mw")),
        )

    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        dist = F.abs(_us(F.col("__t")) - _us(F.col("__mf.__mt")))
        out = out.withColumn(
            "__mf", F.when(dist <= tolerance, F.col("__mf"))
        )
    return out.select(
        *left.columns,
        *[F.col("__mf")[c].alias(f"right_{c}") for c in right_payload],
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


def interval_overlap_join_banded(
    left: DataFrame,
    right: DataFrame,
    a_s: str,
    a_e: str,
    b_s: str,
    b_e: str,
    band_days: int = 30,
) -> DataFrame:
    """Non-equi interval-OVERLAP join (half-open [s, e) x [s, e),
    match iff a_s < b_e AND b_s < a_e) banded into an equi join.

    Each interval explodes to the fixed-width calendar bands it
    touches (band id = floor(epoch_day / band_days) — row-local
    arithmetic, ~len/band_days + 1 rows per interval); the band id is
    the EQUI key for a hash join; the exact overlap predicate filters
    band collisions; duplicates from pairs sharing several bands
    collapse. An unconstrained theta join is a cartesian product at
    scale — banding makes the work O(pairs-that-share-a-band).

    ``band_days`` is the capacity knob (VERDICT r3: density per band,
    not correctness): narrow bands cut per-band pair density but fan
    intervals out to more band rows; wide bands do the reverse. The
    result set is band-invariant — only the plan changes — so tune it
    to the observed interval lengths (start at the typical length of
    the LONGER side; see PLANS.md round-4 probe).
    """
    epoch = F.lit("1970-01-01").cast("date")

    def bands(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__band",
            F.explode(
                F.sequence(
                    F.floor(
                        F.datediff(F.col(s), epoch) / band_days
                    ).cast("long"),
                    F.floor(
                        (F.datediff(F.col(e), epoch) - 1) / band_days
                    ).cast("long"),
                )
            ),
        )

    joined = (
        bands(left, a_s, a_e)
        .join(bands(right, b_s, b_e), "__band")
        .filter(
            (F.col(a_s) < F.col(b_e)) & (F.col(b_s) < F.col(a_e))
        )
        .drop("__band")
    )
    return joined.dropDuplicates()
