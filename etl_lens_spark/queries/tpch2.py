"""Third tranche of [L] relational queries: the remaining classic
TPC-H shapes expressible on the fixture's star schema (SURVEY §2.2 —
the latent SELECT surface of the bundled SQLite, exercised through
the canonical decision-support query patterns).

The fixture omits partsupp, l_shipmode and l_commitdate/l_receiptdate,
so Q4/Q12/Q21 substitute the return flag for the late-delivery
predicate, and the partsupp-dependent Q9/Q11/Q20 substitute
deterministic proxies (supply cost = 0.8×p_retailprice; inventory
value = shipped retail value; excess stock = majority of a part's
shipped volume) that preserve each query's plan shape; every
adaptation is noted on its query. With those, all 22 classic TPC-H
shapes are declared and oracle-checked. Float discipline as
everywhere in the registry: money sums accumulate in DECIMAL and cast
to DOUBLE at the output boundary (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.functions.numeric import exact_sum, exact_sum_expr
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))"


@query(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → semi join → count by priority).
    Adaptation: the fixture has no commit/receipt dates, so "late
    line" becomes "returned line" (l_returnflag = 'R') — same plan
    shape: date-pruned orders scan, hash semi join on orderkey."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    ret = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate reaches
    the parquet scan (PushedFilters), zero joins, one partial+final
    agg. The canonical 'is pushdown working' query."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        exact_sum_expr(
            F.col("l_extendedprice"), F.col("l_discount")
        ).alias("revenue")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(1 - l_discount AS DECIMAL(8,2)) AS vol
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by year. The
    two nation dims broadcast; the OR'ed pair predicate lands after
    them, pruning before the big joins aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            exact_sum_expr(
                F.col("l_extendedprice"), 1 - F.col("l_discount")
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(1 - l_discount AS DECIMAL(8,2)) AS vol,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's spend on one part
    type, by year — conditional-aggregate ratio over a 7-table star.
    part/supplier/nation/region broadcast; lineitem⋈orders⋈customer
    carry the volume."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    asia = r.filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,2)")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(asia), F.col("n1_reg") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-merchandise revenue in
    a half-year window. Return-flag filter pushes to the lineitem
    scan; TakeOrderedAndProject caps the final exchange at 20 rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            exact_sum_expr(
                F.col("l_extendedprice"), 1 - F.col("l_discount")
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority-class conditional counts). Adaptation:
    no l_shipmode in the fixture — grouped by l_linestatus instead;
    the pattern under test (join + CASE-bucketed conditional counts)
    is identical."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(100.00 *
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                              CAST(1 - l_discount AS DECIMAL(8,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' share of one month's revenue —
    broadcast part dim, conditional-aggregate ratio."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the max quarterly revenue. The
    scalar-max subquery becomes an unpartitioned window max over the
    (post-aggregate, |suppliers|-sized) frame — no driver round-trip,
    ties preserved exactly like the SQL."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum_expr(
            F.col("l_extendedprice"), 1 - F.col("l_discount")
        ).alias("total_revenue")
    )
    w_all = Window.partitionBy()
    rev = rev.withColumn("__mx", F.max("total_revenue").over(w_all))
    return (
        rev.filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue on below-one-fifth-of-average-quantity
    orders. The correlated AVG becomes a per-part aggregate joined
    back (broadcast — |parts| rows); quantities are integral doubles
    so the avg is exact and engine-order-independent."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(thresh), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (exact_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute predicates across the
    join (the OR-of-ANDs shape that exercises predicate handling
    through a join — Catalyst extracts the common l_partkey equi-key
    and keeps the disjunction as a post-join filter)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def band(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        band("Brand#1", 5, 1, 11)
        | band("Brand#2", 10, 10, 20)
        | band("Brand#3", 15, 20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            exact_sum_expr(
                F.col("l_extendedprice"), 1 - F.col("l_discount")
            ).alias("revenue")
        )
    )


@query(
    "q21_sole_returned_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_0'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS with inequality
    correlation: the only supplier at fault in a multi-supplier
    order). Adaptation: 'late' → 'returned' (no receipt/commit dates
    in the fixture). Both subqueries are hash semi/anti joins on
    orderkey with the suppkey-inequality residual."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_okey"), F.col("l_suppkey").alias("l2_skey")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("l3_okey"),
            F.col("l_suppkey").alias("l3_skey"),
        )
    )
    cand = (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("l2_okey"))
            & (l1.l_suppkey != F.col("l2_skey")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("l3_okey"))
            & (l1.l_suppkey != F.col("l3_skey")),
            "left_anti",
        )
    )
    return (
        cand.join(o, cand.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name, l_year, CAST(SUM(amount) AS DOUBLE) AS profit
    FROM (
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(1 - l_discount AS DECIMAL(8,2)) -
               CAST(p_retailprice AS DECIMAL(18,2)) *
               CAST(0.8 AS DECIMAL(8,2)) *
               CAST(l_quantity AS DECIMAL(8,2)) AS amount
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
    )
    GROUP BY n_name, l_year
    ORDER BY n_name, l_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year; 5-way
    join with a name-pattern part filter). Adaptation: the fixture has
    no partsupp, so supply cost becomes the deterministic proxy
    ``0.8 * p_retailprice`` — the plan shape (filtered part dim
    broadcast into the lineitem scan, then supplier/orders/nation
    joins feeding a two-key agg) is the same. Profit accumulates in
    DECIMAL end-to-end (functions/numeric.py discipline) so both
    engines agree bit-exactly."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
        - F.col("p_retailprice").cast("decimal(18,2)")
        * F.lit(0.8).cast("decimal(8,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("l_year"),
            amount.alias("amount"),
        )
        .groupBy("n_name", "l_year")
        .agg(F.sum("amount").cast("double").alias("profit"))
        .orderBy(F.col("n_name").asc(), F.col("l_year").desc())
    )


@query(
    "q11_important_inventory",
    oracle="""
    WITH inv AS (
        SELECT l_partkey,
               SUM(CAST(p_retailprice AS DECIMAL(18,2)) *
                   CAST(l_quantity AS DECIMAL(8,2))) AS val
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS inv_value
    FROM inv
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) * 2.0 FROM inv)
    ORDER BY inv_value DESC, l_partkey
    """,
)
def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group value > fraction-of-total scalar
    subquery). Adaptation: no partsupp, so a part's "inventory value"
    for NATION_3 suppliers is the retail value they shipped
    (retailprice × quantity summed from lineitem) — same shape: one
    grouped frame consumed twice, once per-key and once as a global
    scalar threshold. Classic Q11 divides its fraction by SF because
    the part count scales with data size; here the threshold is the
    scale-invariant 2x the mean per-part value (selects ~9% at every
    fixture scale). The threshold is a broadcast cross join (no
    driver round-trip, whole plan stays in one AQE run); the compare
    happens on the DECIMAL-exact doubles both engines derive
    identically."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    inv = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                            .select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(p.select("p_partkey", "p_retailprice")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("p_retailprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(8,2)")
            ).alias("val")
        )
    )
    total = inv.agg(
        (F.sum("val").cast("double") / F.count(F.lit(1)) * F.lit(2.0)).alias(
            "thr"
        )
    )
    return (
        inv.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("thr"))
        .select(
            "l_partkey", F.col("val").cast("double").alias("inv_value")
        )
        .orderBy(F.col("inv_value").desc(), F.col("l_partkey").asc())
    )


@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sqty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red %'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    pt AS (
        SELECT l_partkey, SUM(sqty) AS tqty FROM sp GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT sp.l_suppkey FROM sp
        JOIN pt ON sp.l_partkey = pt.l_partkey
        WHERE sp.sqty * 2 > pt.tqty
    )
    ORDER BY s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers qualified through a nested
    per-part quantity threshold, surfaced via semi join). Adaptation:
    no partsupp availqty, so "has excess stock" becomes "shipped more
    than half of that part's 1996 volume" — still a grouped frame
    reused at two granularities plus an IN-subquery semi join into the
    supplier dim. Quantities accumulate in DECIMAL; the ×2 compare is
    decimal-exact in both engines. The per-part total comes from a
    window over the grouped frame — one pass over lineitem instead of
    materializing the (suppkey, partkey) frame twice (the CTE form
    cost 10 exchanges; this is 5)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sp = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sqty"))
    )
    qual = (
        sp.withColumn(
            "tqty", F.sum("sqty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("sqty") * 2 > F.col("tqty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
