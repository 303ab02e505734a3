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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


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
