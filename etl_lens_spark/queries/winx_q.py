"""Window-frame dialect completion: GROUPS mode and EXCLUDE clauses.

SQLite 3.46's window implementation (SURVEY §2.2) includes frame
modes Spark has no syntax for: ``GROUPS BETWEEN`` and ``EXCLUDE
{CURRENT ROW | GROUP | TIES}``. SURVEY §7 listed them as the
dialect gap; these queries CLOSE it by emulation:

- EXCLUDE over RANGE frames: a RANGE frame always contains whole peer
  groups, so the excluded set is expressible with two extra window
  aggregates — frame_sum, peer_sum (partitioned by the order value) —
  and the SQL-standard empty-set→NULL rule via a frame count.
    EXCLUDE CURRENT ROW = frame_sum - v        (NULL if frame = {row})
    EXCLUDE GROUP       = frame_sum - peer_sum (NULL if frame = peers)
    EXCLUDE TIES        = frame_sum - peer_sum + v
  The DuckDB oracle runs *native* EXCLUDE syntax — a genuine
  cross-engine differential for the emulation.

- GROUPS frames: ``GROUPS BETWEEN k PRECEDING AND CURRENT ROW``
  counts peer groups, not rows; emulated as a RANGE frame over
  ``dense_rank()`` of the order value (dense ranks are consecutive
  integers, one per peer group, so integer RANGE offsets = group
  offsets). The oracle reconstructs the same semantics by a
  mechanism-independent route: aggregate per peer group, window over
  the group-level rows, join back.

- EXCLUDE over ROWS frames (``rows_frame_exclude``): the frame is a
  row-offset slice of a TOTAL order, and the excluded peer set is the
  intersection of the current row's peers with that slice. Emulated
  with a row_number total order plus a second window partitioned by
  the peer key and RANGE-framed on row_number (peers are contiguous
  under any order that leads with the peer key, so the restriction IS
  the intersection). Note the semantic fine print native SQL hides:
  a deterministic ROWS frame needs a unique ORDER BY, but a unique
  ORDER BY makes every peer group a singleton — so native EXCLUDE
  GROUP/TIES on ROWS frames is only well-defined in the degenerate
  case. The emulation therefore takes the peer key SEPARATELY from
  the total order (strictly more general than the SQL syntax); the
  declared query runs the degenerate-but-deterministic case against
  DuckDB's native EXCLUDE, and the genuine-ties path is differential-
  tested against an independent Python reference in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


def rows_frame_exclude(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    peer_cols: list[str],
    value_col: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """SUM(value) over ``ROWS BETWEEN lo AND hi`` with all three
    EXCLUDE variants, appended as ``ex_current`` / ``ex_group`` /
    ``ex_ties`` (SQL empty-frame rule: excluded-to-empty → NULL).

    ``order_cols`` must be a total order within partitions (unique
    key last); ``peer_cols`` defines tie groups and must be a prefix
    of the ordering semantics (peers contiguous under order_cols).
    The frame must contain the current row (lo <= 0 <= hi).
    """
    if not (lo <= 0 <= hi):
        raise ValueError("EXCLUDE frame must contain the current row")
    w_rn = Window.partitionBy(*part_cols).orderBy(*order_cols)
    d = df.withColumn("__rn", F.row_number().over(w_rn))
    w_frame = (
        Window.partitionBy(*part_cols)
        .orderBy("__rn")
        .rowsBetween(lo, hi)
    )
    # peers are contiguous in __rn, so RANGE-on-__rn within the peer
    # partition = peers ∩ frame — no second shuffle shape: same keys,
    # finer partitioning piggybacks on the first sort
    w_pif = (
        Window.partitionBy(*part_cols, *peer_cols)
        .orderBy("__rn")
        .rangeBetween(lo, hi)
    )
    v: Column = F.col(value_col)
    d = d.withColumns(
        {
            "__fs": F.sum(v).over(w_frame),
            "__fn": F.count(F.lit(1)).over(w_frame),
            "__ps": F.sum(v).over(w_pif),
            "__pn": F.count(F.lit(1)).over(w_pif),
        }
    )
    return d.withColumns(
        {
            "ex_current": F.when(F.col("__fn") > 1, F.col("__fs") - v),
            "ex_group": F.when(
                F.col("__fn") > F.col("__pn"),
                F.col("__fs") - F.col("__ps"),
            ),
            "ex_ties": F.col("__fs") - F.col("__ps") + v,
        }
    ).drop("__rn", "__fs", "__fn", "__ps", "__pn")


@query(
    "win_exclude_frames",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(price) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE CURRENT ROW) AS DOUBLE) AS ex_current,
           CAST(SUM(price) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE GROUP) AS DOUBLE) AS ex_group,
           CAST(SUM(price) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               EXCLUDE TIES) AS DOUBLE) AS ex_ties
    FROM (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_custkey < 20
    )
    ORDER BY o_orderkey
    """,
)
def win_exclude_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT ROW / GROUP / TIES over a cumulative RANGE
    frame, emulated (see module docstring) and checked against
    DuckDB's native EXCLUDE."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    price = F.col("o_totalprice").cast("decimal(18,2)")
    base = o.select(
        "o_orderkey", "o_orderpriority", "o_orderdate", price.alias("price")
    )
    w_frame = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_peers = Window.partitionBy("o_orderpriority", "o_orderdate")
    with_sums = base.select(
        "o_orderkey",
        "price",
        F.sum("price").over(w_frame).alias("frame_sum"),
        F.count(F.lit(1)).over(w_frame).alias("frame_n"),
        F.sum("price").over(w_peers).alias("peer_sum"),
        F.count(F.lit(1)).over(w_peers).alias("peer_n"),
    )
    ex_current = F.when(
        F.col("frame_n") > 1, F.col("frame_sum") - F.col("price")
    )
    ex_group = F.when(
        F.col("frame_n") > F.col("peer_n"),
        F.col("frame_sum") - F.col("peer_sum"),
    )
    ex_ties = F.col("frame_sum") - F.col("peer_sum") + F.col("price")
    return base.select("o_orderkey").join(
        with_sums.select(
            "o_orderkey",
            ex_current.cast("double").alias("ex_current"),
            ex_group.cast("double").alias("ex_group"),
            ex_ties.cast("double").alias("ex_ties"),
        ),
        "o_orderkey",
    ).orderBy("o_orderkey")


@query(
    "win_exclude_rows_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(price) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               EXCLUDE CURRENT ROW) AS DOUBLE) AS ex_current,
           CAST(SUM(price) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               EXCLUDE GROUP) AS DOUBLE) AS ex_group,
           CAST(SUM(price) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               EXCLUDE TIES) AS DOUBLE) AS ex_ties
    FROM (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_custkey < 20
    )
    ORDER BY o_orderkey
    """,
)
def win_exclude_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT ROW / GROUP / TIES over a sliding ROWS frame
    (``rows_frame_exclude``), checked against DuckDB's native EXCLUDE
    on the deterministic unique-ordering case (module docstring
    explains why native ROWS+EXCLUDE is only well-defined there; the
    genuine-ties emulation path is covered in tests/test_queries)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    out = rows_frame_exclude(
        base,
        part_cols=["o_orderpriority"],
        order_cols=["o_orderdate", "o_orderkey"],
        peer_cols=["o_orderdate", "o_orderkey"],
        value_col="price",
        lo=-3,
        hi=0,
    )
    return out.select(
        "o_orderkey",
        F.col("ex_current").cast("double").alias("ex_current"),
        F.col("ex_group").cast("double").alias("ex_group"),
        F.col("ex_ties").cast("double").alias("ex_ties"),
    ).orderBy("o_orderkey")


@query(
    "win_groups_frame",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_custkey < 20
    ),
    grp AS (
        SELECT o_orderpriority, o_orderdate,
               SUM(price) AS gsum,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_orderdate
               ) AS gidx
        FROM base GROUP BY o_orderpriority, o_orderdate
    ),
    grp_win AS (
        SELECT o_orderpriority, o_orderdate,
               SUM(gsum) OVER (
                   PARTITION BY o_orderpriority ORDER BY gidx
                   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW
               ) AS groups_sum
        FROM grp
    )
    SELECT b.o_orderkey, CAST(g.groups_sum AS DOUBLE) AS groups_sum
    FROM base b JOIN grp_win g
      ON b.o_orderpriority = g.o_orderpriority
     AND b.o_orderdate = g.o_orderdate
    ORDER BY b.o_orderkey
    """,
)
def win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW`` emulated as a
    RANGE frame over ``dense_rank`` of the order value (consecutive
    integers ⇒ integer range offsets count peer groups). The oracle
    rebuilds the semantics by aggregating per peer group and
    windowing the group rows — two independent mechanisms, one
    answer."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    price = F.col("o_totalprice").cast("decimal(18,2)")
    base = o.select(
        "o_orderkey", "o_orderpriority", "o_orderdate", price.alias("price")
    )
    w_rank = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    ranked = base.withColumn("g", F.dense_rank().over(w_rank))
    w_groups = (
        Window.partitionBy("o_orderpriority")
        .orderBy("g")
        .rangeBetween(-1, 0)
    )
    return ranked.select(
        "o_orderkey",
        F.sum("price").over(w_groups).cast("double").alias("groups_sum"),
    ).orderBy("o_orderkey")


@query(
    "win_exclude_groups_frame",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_custkey < 20
    ),
    grp AS (
        SELECT o_orderpriority, o_orderdate,
               SUM(price) AS gsum, COUNT(*) AS gn,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_orderdate
               ) AS gidx
        FROM base GROUP BY o_orderpriority, o_orderdate
    ),
    gw AS (
        SELECT o_orderpriority, o_orderdate, gsum, gn,
               SUM(gsum) OVER (
                   PARTITION BY o_orderpriority ORDER BY gidx
                   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW
               ) AS fs,
               SUM(gn) OVER (
                   PARTITION BY o_orderpriority ORDER BY gidx
                   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW
               ) AS fn
        FROM grp
    )
    SELECT b.o_orderkey,
           CASE WHEN g.fn > 1 THEN CAST(g.fs - b.price AS DOUBLE) END
               AS ex_current,
           CASE WHEN g.fn > g.gn THEN CAST(g.fs - g.gsum AS DOUBLE) END
               AS ex_group,
           CAST(g.fs - g.gsum + b.price AS DOUBLE) AS ex_ties
    FROM base b JOIN gw g
      ON b.o_orderpriority = g.o_orderpriority
     AND b.o_orderdate = g.o_orderdate
    ORDER BY b.o_orderkey
    """,
)
def win_exclude_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT ROW / GROUP / TIES over a ``GROUPS BETWEEN 1
    PRECEDING AND CURRENT ROW`` frame — the last cell of the frame
    dialect matrix (ROWS/RANGE/GROUPS × EXCLUDE). GROUPS frames hold
    whole peer groups, so the RANGE-EXCLUDE formulas apply on the
    dense_rank axis. DuckDB implements no GROUPS mode at all, so the
    oracle reconstructs semantics mechanism-independently (per-group
    aggregate → group-level window → join back), like
    win_groups_frame."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w_rank = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    ranked = base.withColumn("g", F.dense_rank().over(w_rank))
    w_frame = (
        Window.partitionBy("o_orderpriority").orderBy("g").rangeBetween(-1, 0)
    )
    w_peers = Window.partitionBy("o_orderpriority", "o_orderdate")
    d = ranked.withColumns(
        {
            "fs": F.sum("price").over(w_frame),
            "fn": F.count(F.lit(1)).over(w_frame),
            "ps": F.sum("price").over(w_peers),
            "pn": F.count(F.lit(1)).over(w_peers),
        }
    )
    return d.select(
        "o_orderkey",
        F.when(F.col("fn") > 1, F.col("fs") - F.col("price"))
        .cast("double")
        .alias("ex_current"),
        F.when(F.col("fn") > F.col("pn"), F.col("fs") - F.col("ps"))
        .cast("double")
        .alias("ex_group"),
        (F.col("fs") - F.col("ps") + F.col("price"))
        .cast("double")
        .alias("ex_ties"),
    ).orderBy("o_orderkey")


@query(
    "win_rolling_median",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
      FROM events WHERE user_id < 40
    )
    SELECT event_id, user_id,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN 8 PRECEDING AND CURRENT ROW
           ) AS rolling_median
    FROM ev
    ORDER BY user_id, ts_us, event_id
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (robust smoothing) per user: the trailing-9-row
    exact interpolated median of event values — the robust analog of a
    moving average, immune to single spikes. Spark's percentile as a
    window aggregate matches DuckDB's quantile_cont over the same ROWS
    frame. One user-keyed shuffle; frame state is O(9) per row."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select(
            "event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-8, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.percentile("value", F.lit(0.5)).over(w).alias("rolling_median"),
        )
        .orderBy("user_id")
    )


@query(
    "win_rolling_regression",
    oracle="""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0 AS x,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS y
        FROM events WHERE user_id < 10
    ),
    rolled AS (
        SELECT user_id, event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x * x) OVER w AS sxx, SUM(x * y) OVER w AS sxy
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY x, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, n,
           CASE WHEN n >= 5 AND n * sxx - sx * sx <> 0
                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
           END AS slope
    FROM rolled ORDER BY user_id, event_id
    """,
)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS slope over a trailing-20-event window per user —
    the moving-beta / trend-detection window missing from every
    engine's built-in set (regr_slope is aggregate-only): the four
    sufficient-statistic SUMs ride ONE window frame on the user
    shuffle and the slope is closed-form from them — the same
    sufficient-statistics trick as ml_normal_equations, windowed.
    Warm-up guard (n ≥ 5) and a degenerate-variance guard keep the
    division defined identically in both engines."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            (F.unix_micros("ts").cast("double") / 3600000000.0).alias("x"),
            F.col("value").cast("decimal(18,2)").cast("double").alias("y"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x", "event_id")
        .rowsBetween(-19, 0)
    )
    n = F.count(F.lit(1)).over(w).cast("long")
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    denom = n * sxx - sx * sx
    return base.select(
        "user_id",
        "event_id",
        n.alias("n"),
        F.when(
            (n >= 5) & (denom != 0), (n * sxy - sx * sy) / denom
        ).alias("slope"),
    ).orderBy("user_id", "event_id")


@query(
    "win_qualify_filter",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey, 
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS price_c
    FROM orders
    WHERE o_custkey < 200
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
    ) <= 2
    ORDER BY custkey, o_orderkey
    """,
)
def win_qualify_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUALIFY dialect corner: filtering on a window function
    without a subquery is native syntax in DuckDB (the oracle uses it
    verbatim) but absent from Spark SQL — the engine-side emulation
    is the windowed-subquery rewrite QUALIFY desugars to anyway, so
    the plan (one partitioned window + filter) is identical. Top-2
    orders by price per customer, deterministic tie-break."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.col("o_totalprice").cast("decimal(18,2)")),
        F.asc("o_orderkey"),
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("price_c"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") <= 2)
        .drop("__rn")
        .orderBy("custkey", "o_orderkey")
    )


@query(
    "win_running_distinct_count",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type
        FROM events WHERE user_id < 30
    ),
    marked AS (
        SELECT user_id, event_id, event_type,
               CASE WHEN row_number() OVER (
                   PARTITION BY user_id, event_type ORDER BY event_id
               ) = 1 THEN 1 ELSE 0 END AS first_seen
        FROM e
    )
    SELECT user_id, event_id, event_type,
           CAST(SUM(first_seen) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM marked
    ORDER BY user_id, event_id
    """,
)
def win_running_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT — the window aggregate neither engine
    supports natively (COUNT(DISTINCT) OVER is rejected by both), so
    the operator is the first-occurrence-marker rewrite: mark each
    (user, type)'s first event with a per-pair row_number, then a
    plain running SUM of markers IS the running cardinality. Two
    windows riding ONE user-keyed shuffle (the pair-window is a
    finer partitioning of the same exchange); no state grows with
    the value domain — the rewrite that makes running-cardinality
    dashboards viable at 100 TB where a collect_set-based window
    would hold every distinct value per row."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "event_id", "event_type")
    )
    w_pair = Window.partitionBy("user_id", "event_type").orderBy(
        "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn(
            "first_seen",
            (F.row_number().over(w_pair) == 1).cast("int"),
        )
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.sum("first_seen")
            .over(w_run)
            .cast("long")
            .alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "event_id")
    )
