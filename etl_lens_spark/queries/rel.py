"""[L] relational surface — joins, aggregations, windows, set ops,
subqueries, scalar functions — over the TPC-H-ish star schema.

This is the latent SQLite-3.46 SQL surface of the reference
(SURVEY.md §2.2; ``/root/reference/src/main.cpp:37`` bundles SQLite but
never wires it), implemented as Spark DataFrame plans so Catalyst
handles pushdown, join strategy, and AQE.

Scale notes inline per query; the recurring ones:
- nation/region are broadcast (no shuffle for the dim side);
- fact-fact joins (lineitem x orders) shuffle on the join key — the
  partitioning a real deployment would bucket on;
- aggregations are partial (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.functions.numeric import exact_sum
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# Aggregation core
# --------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan-heavy grouped aggregation.

    Plan shape: parquet scan with pushed date filter → partial hash
    agg → single shuffle on (returnflag, linestatus) → final agg.
    Cardinality collapses ~60k→6, so the shuffle is negligible at any
    scale; this query is scan-bound, exactly what you want.

    Money sums accumulate in DECIMAL (functions.numeric): exact,
    order-independent, identical across engines and cluster sizes.
    """
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (1 - F.col("l_discount")).cast("decimal(8,2)")
    tax1 = (1 + F.col("l_tax")).cast("decimal(8,2)")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc1).cast("double").alias("sum_disc_price"),
            F.sum(price * disc1 * tax1).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double")
                / cnt
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggs — Spark expands this to a
    two-phase agg (distinct keys shuffled once, then merged), no
    driver involvement."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_having",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, CAST(AVG(c_acctbal) AS DOUBLE) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 100
    ORDER BY c_mktsegment
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("c_acctbal").alias("avg_bal"))
        .filter(F.col("n") > 100)
        .orderBy("c_mktsegment")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(c_acctbal) AS DOUBLE) AS total_bal,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY gid, r_name, n_name
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (a [L] capability
    SQLite lacks — Spark exceeds the dialect here). Both dims are
    broadcast; rollup is one shuffle producing all grouping sets via
    Expand, partial-aggregated map-side."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("total_bal"),
            (F.grouping("r_name") * 2 + F.grouping("n_name"))
            .cast("long")
            .alias("gid"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@query(
    "agg_conditional_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_open,
           CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_filled,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (the scalable form of
    ``.pivot()`` — no second pass to discover pivot values)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))).alias("qty_open"),
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))).alias("qty_filled"),
            F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective dim filter → star join → agg → top-k.

    customer(filtered) is small → broadcast into orders; the surviving
    orders x lineitem join shuffles on orderkey (the natural bucketing
    key). Top-10 is TakeOrderedAndProject — no global sort.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    headline=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-table star join. All dims broadcast
    (supplier/nation/region); only lineitem x orders shuffles."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (no row multiplication, only the left
    columns survive — Catalyst picks broadcast/shuffled-hash semi)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, COALESCE(n_orders, 0) AS n_orders
    FROM customer FULL OUTER JOIN cust_orders ON c_custkey = o_custkey
    ORDER BY c_custkey NULLS FIRST, n_orders
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy(F.col("c_custkey").asc_nulls_first(), F.col("n_orders").asc())
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT a.p_partkey AS p_partkey, a.p_name AS p_name,
           COUNT(*) AS n_cheaper_bigger
    FROM part a
    JOIN part b
      ON b.p_retailprice < a.p_retailprice AND b.p_size > a.p_size
    WHERE a.p_partkey < 50
    GROUP BY 1, 2
    ORDER BY p_partkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join. Spark executes as BroadcastNestedLoop —
    correct but O(n*m); the filtered left side keeps it bounded. At
    scale, band the range key into buckets to restore an equi-join
    prefix (see operators.joins.range_join_banded)."""
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_partkey") < 50).alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
            & (F.col("b.p_size") > F.col("a.p_size")),
        )
        .groupBy(F.col("a.p_partkey").alias("p_partkey"), F.col("a.p_name").alias("p_name"))
        .agg(F.count(F.lit(1)).alias("n_cheaper_bigger"))
        .orderBy("p_partkey")
    )


@query(
    "join_cross_small",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    r1 = r.alias("r1")
    r2 = r.alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") != F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("from_region"),
            F.col("r2.r_name").alias("to_region"),
        )
        .orderBy("from_region", "to_region")
    )


# --------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------


@query(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3 AND o_custkey < 100
    ORDER BY o_custkey, rn
    """,
    headline=True,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: row_number over (key, value desc). One shuffle
    on the partition key; AQE handles group-count skew. The rn filter
    is pushed into the window sort as a group-limit by Catalyst
    (WindowGroupLimit) — no full materialization of every group."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") < 100))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS order_seq
    FROM orders
    WHERE o_custkey < 50
    ORDER BY o_custkey, order_seq
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum("o_totalprice").over(w).alias("running_total"),
            F.count(F.lit(1)).over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           CAST(LAG(o_orderdate) OVER w AS DATE) AS prev_orderdate,
           CAST(LEAD(o_orderdate) OVER w AS DATE) AS next_orderdate,
           COALESCE(CAST(DATE_DIFF('day',
               CAST(LAG(o_orderdate) OVER w AS DATE),
               CAST(o_orderdate AS DATE)) AS BIGINT), -1) AS days_since_prev
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    od = F.col("o_orderdate").cast("date")
    prev = F.lag("o_orderdate").over(w).cast("date")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            od.alias("orderdate"),
            prev.alias("prev_orderdate"),
            F.lead("o_orderdate").over(w).cast("date").alias("next_orderdate"),
            F.coalesce(F.datediff(od, prev).cast("long"), F.lit(-1)).alias(
                "days_since_prev"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_rank_dist",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           RANK() OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS bal_pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS bal_cume_dist
    FROM customer
    WHERE c_custkey < 200
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, bal_rank, c_custkey
    """,
)
def win_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
            F.ntile(4).over(w).cast("long").alias("bal_quartile"),
            F.percent_rank().over(w).alias("bal_pct_rank"),
            F.cume_dist().over(w).alias("bal_cume_dist"),
        )
        .orderBy("c_mktsegment", "bal_rank", "c_custkey")
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT p_partkey, p_size, p_retailprice,
           CAST(AVG(p_retailprice) OVER (
               ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) AS DOUBLE) AS avg_price_similar_size,
           COUNT(*) OVER (
               ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) AS n_similar_size
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window) — full ROWS/RANGE frame support
    per the SQLite-3.25+ window surface (SURVEY §2.2)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    w = Window.orderBy("p_size").rangeBetween(-2, 2)
    return (
        p.select(
            "p_partkey",
            "p_size",
            "p_retailprice",
            F.avg("p_retailprice").over(w).alias("avg_price_similar_size"),
            F.count(F.lit(1)).over(w).alias("n_similar_size"),
        )
        .orderBy("p_partkey")
    )


@query(
    "win_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------


@query(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier WHERE s_acctbal > 9000
    ORDER BY nationkey, side
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    )
    return c.unionByName(s).orderBy("nationkey", "side")


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    ORDER BY nationkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s).orderBy("nationkey")


@query(
    "setop_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT c_nationkey FROM customer WHERE c_acctbal > 9900
    ORDER BY nationkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    # subtract = EXCEPT DISTINCT: removes a left row entirely if it
    # appears on the right at all (exceptAll().distinct() would keep
    # rows whose left multiplicity exceeds the right's)
    return n.subtract(c).orderBy("nationkey")


# --------------------------------------------------------------------
# Subqueries / CTE
# --------------------------------------------------------------------


@query(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.8 FROM customer)
    ORDER BY c_custkey
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via Spark SQL (Catalyst turns it into a
    broadcast of the single-row aggregate — no driver round-trip)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.8 FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery — Catalyst de-correlates it into an
    aggregate + join (the classic rewrite), so it runs as two shuffles
    instead of a nested loop."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
        """
    )


@query(
    "cte_chain",
    oracle="""
    WITH nation_custs AS (
        SELECT n_name, c_custkey, c_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    nation_stats AS (
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(AVG(c_acctbal) AS DOUBLE) AS avg_bal
        FROM nation_custs GROUP BY n_name
    )
    SELECT * FROM nation_stats WHERE n_customers > 40
    ORDER BY n_name
    """,
)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("customer", "nation"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        WITH nation_custs AS (
            SELECT n_name, c_custkey, c_acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ),
        nation_stats AS (
            SELECT n_name, COUNT(*) AS n_customers,
                   CAST(AVG(c_acctbal) AS DOUBLE) AS avg_bal
            FROM nation_custs GROUP BY n_name
        )
        SELECT * FROM nation_stats WHERE n_customers > 40
        ORDER BY n_name
        """
    )


# --------------------------------------------------------------------
# Sort / limit / scalar functions
# --------------------------------------------------------------------


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy + limit compiles to TakeOrderedAndProject
    — per-partition heaps + driver merge of k rows, never a full sort.
    This is the R5/R7 composition at scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_name) AS name_lower,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTR(p_name, 1, 10) AS name_prefix,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trim,
           CAST(STRPOS(p_type, 'BRUSHED') AS BIGINT) AS brushed_pos,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           REVERSE(p_brand) AS brand_rev
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQLite scalar string library (substr/trim/like/replace/
    instr..., SURVEY §2.2) on Spark builtins — all JVM-side codegen."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_name").alias("name_lower"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 10).alias("name_prefix"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
                "brand_trim"
            ),
            F.instr("p_type", "BRUSHED").cast("long").alias("brushed_pos"),
            F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.reverse("p_brand").alias("brand_rev"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ABS(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           CAST(ROUND(l_extendedprice / 7, 2) AS DOUBLE) AS price_h,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(SQRT(l_extendedprice) AS DOUBLE) AS price_sqrt,
           CAST(LN(l_extendedprice) AS DOUBLE) AS price_ln,
           CAST(POWER(l_tax + 1, 2) AS DOUBLE) AS tax_sq,
           CAST(MOD(l_orderkey, 7) AS BIGINT) AS key_mod,
           CAST(GREATEST(l_discount, l_tax) AS DOUBLE) AS max_rate,
           CAST(LEAST(l_discount, l_tax) AS DOUBLE) AS min_rate,
           CAST(SIGN(l_discount - l_tax) AS DOUBLE) AS rate_sign
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.round(F.col("l_extendedprice") / 7, 2).alias("price_h"),
            F.floor("l_quantity").cast("long").alias("qty_floor"),
            F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_k_ceil"),
            F.sqrt("l_extendedprice").alias("price_sqrt"),
            F.log(F.col("l_extendedprice")).alias("price_ln"),
            F.pow(F.col("l_tax") + 1, 2).alias("tax_sq"),
            (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
            F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_ymd,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_1995
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (strftime/julianday analogs,
    SURVEY §2.2) via Spark builtins; formats chosen to agree exactly
    with DuckDB's STRFTIME."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    od = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.year(od).cast("long").alias("order_year"),
            F.month(od).cast("long").alias("order_month"),
            F.dayofmonth(od).cast("long").alias("order_day"),
            F.quarter(od).cast("long").alias("order_quarter"),
            F.date_trunc("month", od).cast("date").alias("order_month_start"),
            (od + F.expr("INTERVAL 90 DAYS")).cast("date").alias("due_date"),
            F.date_format(od, "yyyy-MM-dd").alias("order_ymd"),
            F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_1995"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "case_when_bucketing",
    oracle="""
    SELECT CASE
             WHEN c_acctbal < 0 THEN 'negative'
             WHEN c_acctbal < 3000 THEN 'low'
             WHEN c_acctbal < 7000 THEN 'mid'
             ELSE 'high'
           END AS bal_bucket,
           COUNT(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM customer
    GROUP BY 1
    ORDER BY bal_bucket
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bal_bucket")
    )
    return (
        c.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("bal_bucket")
    )


@query(
    "setop_except_all_bag",
    oracle="""
    SELECT o_orderpriority AS priority
    FROM orders WHERE o_orderkey < 4000
    EXCEPT ALL
    SELECT o_orderpriority
    FROM orders WHERE o_orderkey >= 4000 AND o_orderkey < 5000
    ORDER BY priority
    """,
)
def setop_except_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — BAG semantics (each occurrence subtracts one
    occurrence, duplicates preserved), the set-op corner DISTINCT
    rewrites silently get wrong: Spark's ``exceptAll`` vs DuckDB's
    native EXCEPT ALL. The multiplicity arithmetic must agree
    exactly, not just the distinct membership."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 4000).select(
        F.col("o_orderpriority").alias("priority")
    )
    b = o.filter(
        (F.col("o_orderkey") >= 4000) & (F.col("o_orderkey") < 5000)
    ).select(F.col("o_orderpriority").alias("priority"))
    return a.exceptAll(b).orderBy("priority")


@query(
    "setop_intersect_all_bag",
    oracle="""
    SELECT o_orderpriority AS priority
    FROM orders WHERE o_orderkey < 4000
    INTERSECT ALL
    SELECT o_orderpriority
    FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 6000
    ORDER BY priority
    """,
)
def setop_intersect_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics (min of the two multiplicities
    per value): Spark ``intersectAll`` vs DuckDB native."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 4000).select(
        F.col("o_orderpriority").alias("priority")
    )
    b = o.filter(
        (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 6000)
    ).select(F.col("o_orderpriority").alias("priority"))
    return a.intersectAll(b).orderBy("priority")


@query(
    "distinct_on_latest_order",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey AS custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS odate
    FROM orders
    WHERE o_custkey < 300
    ORDER BY o_custkey, CAST(o_orderdate AS DATE) DESC, o_orderkey
    """,
)
def distinct_on_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTINCT ON dialect corner (Postgres/DuckDB native: first
    row per group under the ORDER BY): each customer's latest order,
    deterministic tie-break by orderkey. Spark has no DISTINCT ON —
    the engine-side desugaring is the row_number window that DISTINCT
    ON compiles to anyway, so the plan is one partitioned window +
    filter. The oracle runs the native syntax."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.col("o_orderdate").cast("date")), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("custkey")
    )
