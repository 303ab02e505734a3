"""Data-quality validation and descriptive-statistics queries: the
rule-report / drift-detection layer every ETL deployment bolts onto
its tables, plus the classic activity analytics (DAU windows,
new-vs-returning) and robust feature prep (winsorization).

The reference viewer displays whatever the trace contains — a
production pipeline must instead PROVE properties (null rates, ranges,
referential integrity, uniqueness) before publishing. Each rule here
is expressed so one scan per table feeds every rule (conditional
aggregates), with joins only where a rule genuinely spans tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


@query(
    "dq_validation_report",
    oracle="""
    WITH o AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_status,
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nonpos_price,
               CAST(SUM(CASE WHEN o_orderdate < DATE '1990-01-01'
                              OR o_orderdate >= DATE '2010-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS date_oob,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                 AS dup_keys
        FROM orders
    ),
    ri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS orphan_orders
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE c_custkey IS NULL
    )
    SELECT rule, n_violations, n_rows FROM (
        SELECT 'null_status' AS rule, null_status AS n_violations,
               n_rows FROM o
        UNION ALL
        SELECT 'nonpos_price', nonpos_price, n_rows FROM o
        UNION ALL
        SELECT 'date_out_of_bounds', date_oob, n_rows FROM o
        UNION ALL
        SELECT 'duplicate_orderkey', dup_keys, n_rows FROM o
        UNION ALL
        SELECT 'orphan_custkey', ri.orphan_orders, o.n_rows FROM ri, o
    ) t ORDER BY rule
    """,
)
def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based validation report over ``orders``: null rate, value
    range, date bounds, key uniqueness — ALL from one conditional-
    aggregate scan (no per-rule passes) — plus referential integrity
    against ``customer`` via one anti-join. Output is the standard
    (rule, n_violations, n_rows) contract a publish gate consumes.
    At 100 TB the single-scan form is the whole point: k rules cost
    one read, and the RI anti-join is an equi join on the key that
    AQE broadcasts when the dimension allows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck")
    )
    one = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("null_status"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpos_price"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2010-01-01").cast("date")
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("date_oob"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("dup_keys"),
    )
    orphans = (
        orders.join(cust, orders.o_custkey == cust.ck, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_orders"))
    )
    rep = one.crossJoin(orphans).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("null_status").alias("rule"),
                    F.col("null_status").alias("n_violations"),
                    F.col("n_rows"),
                ),
                F.struct(
                    F.lit("nonpos_price").alias("rule"),
                    F.col("nonpos_price").alias("n_violations"),
                    F.col("n_rows"),
                ),
                F.struct(
                    F.lit("date_out_of_bounds").alias("rule"),
                    F.col("date_oob").alias("n_violations"),
                    F.col("n_rows"),
                ),
                F.struct(
                    F.lit("duplicate_orderkey").alias("rule"),
                    F.col("dup_keys").alias("n_violations"),
                    F.col("n_rows"),
                ),
                F.struct(
                    F.lit("orphan_custkey").alias("rule"),
                    F.col("orphan_orders").alias("n_violations"),
                    F.col("n_rows"),
                ),
            )
        ).alias("r")
    )
    return rep.select("r.rule", "r.n_violations", "r.n_rows").orderBy("rule")


@query(
    "events_active_users_7d",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
    ),
    activity AS (
        SELECT DISTINCT CAST(ts AS DATE) AS ad, user_id FROM events
    )
    SELECT days.d,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM days JOIN activity a
      ON a.ad <= days.d AND a.ad > days.d - 7
    GROUP BY days.d ORDER BY days.d
    """,
)
def events_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve). Distinct
    COUNT over a sliding window isn't a window function in any
    engine — the scalable shape is: reduce the raw stream to DISTINCT
    (day, user) pairs first (map-side combine kills the event
    volume), then a 7-day band join against the day spine and one
    distinct-count per day. The band join duplicates each (day, user)
    pair at most 7×, bounded and predictable; the raw event stream is
    never joined."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        F.col("ts").cast("date").alias("ad"), "user_id"
    ).distinct()
    days = ev.select(F.col("ts").cast("date").alias("d")).distinct()
    return (
        days.join(
            activity,
            (F.col("ad") <= F.col("d"))
            & (F.col("ad") > F.date_sub(F.col("d"), 7)),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        .orderBy("d")
    )


@query(
    "events_new_vs_returning",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
        GROUP BY user_id
    ),
    daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    )
    SELECT d.d,
           CAST(SUM(CASE WHEN d.d = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN d.d > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM daily d JOIN firsts f ON d.user_id = f.user_id
    GROUP BY d.d ORDER BY d.d
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning user split per day: a user's first-ever active
    day marks them new, every later active day returning. First-seen
    day is a window MIN riding the user shuffle of the (day, user)
    reduction — no self-join, no second scan; the daily split is then
    one groupBy on the already-reduced pairs."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
    )
    first_day = F.min("d").over(Window.partitionBy("user_id"))
    return (
        daily.withColumn("first_day", first_day)
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("d") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("d") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
        .orderBy("d")
    )


@query(
    "stats_chi_square",
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT seg, pri, CAST(COUNT(*) AS DOUBLE) AS obs
        FROM j GROUP BY seg, pri
    ),
    margins AS (
        SELECT seg, pri, obs,
               SUM(obs) OVER (PARTITION BY seg) AS row_tot,
               SUM(obs) OVER (PARTITION BY pri) AS col_tot,
               SUM(obs) OVER () AS n
        FROM cells
    )
    SELECT seg, pri, CAST(obs AS BIGINT) AS observed,
           row_tot * col_tot / n AS expected,
           (obs - row_tot * col_tot / n)
             * (obs - row_tot * col_tot / n)
             / (row_tot * col_tot / n) AS chi2_term
    FROM margins ORDER BY seg, pri
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence decomposition for the market-segment ×
    order-priority contingency table: observed vs expected count and
    the per-cell χ² term (Σ terms = the test statistic; the per-cell
    view localizes WHICH combinations drive dependence). The fact
    table reduces to k×m cells before any window touches it — margins
    are windows over ≤ k·m rows, so the heavy lifting is one
    map-side-combined groupBy at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("obs"))
    )
    row_tot = F.sum("obs").over(Window.partitionBy("seg"))
    col_tot = F.sum("obs").over(Window.partitionBy("pri"))
    n = F.sum("obs").over(Window.partitionBy())
    exp = (row_tot * col_tot / n).alias("expected")
    return (
        cells.select(
            "seg",
            "pri",
            F.col("obs").cast("long").alias("observed"),
            exp,
            (
                (F.col("obs") - row_tot * col_tot / n)
                * (F.col("obs") - row_tot * col_tot / n)
                / (row_tot * col_tot / n)
            ).alias("chi2_term"),
        )
        .orderBy("seg", "pri")
    )


@query(
    "feature_winsorize",
    oracle="""
    WITH t AS (
        SELECT o_orderpriority AS pri,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_c
        FROM orders
    ),
    lims AS (
        SELECT pri,
               quantile_cont(CAST(price_c AS DOUBLE), 0.05) AS lo,
               quantile_cont(CAST(price_c AS DOUBLE), 0.95) AS hi
        FROM t GROUP BY pri
    )
    SELECT t.pri,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(price_c AS DOUBLE) < lo THEN 1
                         ELSE 0 END) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN CAST(price_c AS DOUBLE) > hi THEN 1
                         ELSE 0 END) AS BIGINT) AS n_clipped_hi,
           (CAST(SUM(CASE WHEN CAST(price_c AS DOUBLE) >= lo
                           AND CAST(price_c AS DOUBLE) <= hi
                          THEN price_c ELSE 0 END) AS DOUBLE)
            + SUM(CASE WHEN CAST(price_c AS DOUBLE) < lo THEN 1
                       ELSE 0 END) * lo
            + SUM(CASE WHEN CAST(price_c AS DOUBLE) > hi THEN 1
                       ELSE 0 END) * hi) / COUNT(*)
             AS mean_winsorized
    FROM t JOIN lims ON t.pri = lims.pri
    GROUP BY t.pri, lo, hi ORDER BY t.pri
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization report: clip order totals at the exact
    interpolated p05/p95 of their priority group, report clip counts
    and the winsorized mean — the robust-feature prep that tames
    heavy tails before model training. Exact percentiles are the
    oracle anchor (group-local, so they ride the group shuffle, not a
    global sort); the 100 TB swap is ``approx_percentile`` — same
    contract, sketch-bounded cutpoints. The limits frame is k rows
    and broadcast back onto the fact scan."""
    t = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
    )
    pd_ = F.col("price_c").cast("double")
    lims = t.groupBy("pri").agg(
        F.percentile(pd_, F.lit(0.05)).alias("lo"),
        F.percentile(pd_, F.lit(0.95)).alias("hi"),
    )
    j = t.join(F.broadcast(lims), "pri")
    # order-free winsorized mean: in-range cents sum exactly as
    # BIGINT, the clipped tails contribute count·limit — only three
    # deterministic double ops remain (the sf0.1 permutation probe
    # caught AVG-of-clipped-doubles flaking with partition order)
    inside = (pd_ >= F.col("lo")) & (pd_ <= F.col("hi"))
    return (
        j.groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(pd_ < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_lo"),
            F.sum(F.when(pd_ > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_hi"),
            (
                (
                    F.sum(
                        F.when(inside, F.col("price_c")).otherwise(0)
                    ).cast("double")
                    + F.sum(
                        F.when(pd_ < F.col("lo"), 1).otherwise(0)
                    )
                    * F.first("lo")
                    + F.sum(
                        F.when(pd_ > F.col("hi"), 1).otherwise(0)
                    )
                    * F.first("hi")
                )
                / F.count(F.lit(1))
            ).alias("mean_winsorized"),
        )
        .orderBy("pri")
    )


@query(
    "stats_ks_drift",
    oracle="""
    WITH pool AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    per_v AS (
        SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
               CAST(SUM(g2) AS BIGINT) AS c2
        FROM pool GROUP BY v
    ),
    cum AS (
        SELECT SUM(c1) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS a1,
               SUM(c2) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS a2
        FROM per_v
    )
    SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM per_v) AS n1,
           (SELECT CAST(SUM(c2) AS BIGINT) FROM per_v) AS n2,
           MAX(abs(CAST(a1 AS DOUBLE)
                     / (SELECT SUM(c1) FROM per_v)
                   - CAST(a2 AS DOUBLE)
                     / (SELECT SUM(c2) FROM per_v))) AS ks_d
    FROM cum
    """,
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the click and
    purchase value distributions — the standard nonparametric drift
    alarm between a reference and a live sample. The raw streams
    reduce to per-distinct-value counts FIRST (map-side combine), the
    two ECDFs are cumulative windows over that reduced series, and
    D = max |F₁−F₂|. Values are exact cents so the ECDF steps align
    identically cross-engine; only the final division is floating.
    Both cumulative counts ride ONE ``ordered_prefix_sums`` pass
    (range-partition on v, per-partition windows in parallel,
    broadcast offsets) — no unpartitioned window anywhere, so even a
    10^9-distinct-value series never funnels through one reducer."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    pool = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("g2"),
    )
    per_v = pool.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
    )
    from etl_lens_spark.operators.prefix import ordered_prefix_sums

    cum = ordered_prefix_sums(
        per_v, [F.asc("v")], {"a1": "c1", "a2": "c2"}
    ).select("a1", "a2")
    totals = per_v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    return cum.crossJoin(F.broadcast(totals)).agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.max(
            F.abs(
                F.col("a1").cast("double") / F.col("n1")
                - F.col("a2").cast("double") / F.col("n2")
            )
        ).alias("ks_d"),
    )


@query(
    "stats_psi_drift",
    oracle="""
    WITH pool AS (
        SELECT CAST(least(greatest(floor(CAST(value AS DOUBLE) / 10.0),
                                   0), 9) AS BIGINT) AS bin,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    bins AS (
        SELECT bin, CAST(SUM(g1) AS BIGINT) AS c1,
               CAST(SUM(g2) AS BIGINT) AS c2
        FROM pool GROUP BY bin
    ),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM bins)
    SELECT bin, c1, c2,
           (CAST(c1 + 1 AS DOUBLE) / (n1 + 10)) AS p,
           (CAST(c2 + 1 AS DOUBLE) / (n2 + 10)) AS q,
           ((CAST(c1 + 1 AS DOUBLE) / (n1 + 10))
            - (CAST(c2 + 1 AS DOUBLE) / (n2 + 10)))
             * ln((CAST(c1 + 1 AS DOUBLE) / (n1 + 10))
                  / (CAST(c2 + 1 AS DOUBLE) / (n2 + 10))) AS psi_term
    FROM bins, tot ORDER BY bin
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index decomposition between the click and
    purchase value distributions over 10 fixed-width bins (clamped,
    Laplace-smoothed so empty bins stay finite): the per-bin
    (p−q)·ln(p/q) terms whose sum is the PSI monitoring metric —
    per-bin so the report localizes WHERE the distribution moved.
    Everything reduces to 10 bin counts map-side; totals broadcast."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    pool = ev.select(
        F.least(
            F.greatest(F.floor(F.col("value").cast("double") / 10.0), F.lit(0)),
            F.lit(9),
        )
        .cast("long")
        .alias("bin"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("g2"),
    )
    bins = pool.groupBy("bin").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
    )
    tot = bins.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    j = bins.crossJoin(F.broadcast(tot))
    p = (F.col("c1") + 1).cast("double") / (F.col("n1") + 10)
    q = (F.col("c2") + 1).cast("double") / (F.col("n2") + 10)
    return j.select(
        "bin",
        "c1",
        "c2",
        p.alias("p"),
        q.alias("q"),
        ((p - q) * F.log(p / q)).alias("psi_term"),
    ).orderBy("bin")


@query(
    "ml_normal_equations",
    oracle="""
    WITH t AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS x2,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS sx1,
               CAST(SUM(x2) AS BIGINT) AS sx2,
               CAST(SUM(x1 * x1) AS BIGINT) AS sx11,
               CAST(SUM(x1 * x2) AS BIGINT) AS sx12,
               CAST(SUM(x2 * x2) AS BIGINT) AS sx22,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
               CAST(SUM(x2 * y) AS BIGINT) AS sx2y
        FROM t
    )
    SELECT n, sx1, sx2, sx11, sx12, sx22, sy, sx1y, sx2y,
           (CAST(sy AS DOUBLE) * (CAST(sx11 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx12 AS DOUBLE))
            - CAST(sx1y AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx2 AS DOUBLE))
            + CAST(sx2y AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx12 AS DOUBLE) - CAST(sx11 AS DOUBLE) * CAST(sx2 AS DOUBLE)))
           /
           (CAST(n AS DOUBLE) * (CAST(sx11 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx12 AS DOUBLE))
            - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx2 AS DOUBLE))
            + CAST(sx2 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx12 AS DOUBLE) - CAST(sx11 AS DOUBLE) * CAST(sx2 AS DOUBLE)))
           AS beta0,
           (CAST(n AS DOUBLE) * (CAST(sx1y AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx2y AS DOUBLE))
            - CAST(sy AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx2 AS DOUBLE))
            + CAST(sx2 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx2y AS DOUBLE) - CAST(sx1y AS DOUBLE) * CAST(sx2 AS DOUBLE)))
           /
           (CAST(n AS DOUBLE) * (CAST(sx11 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx12 AS DOUBLE))
            - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx22 AS DOUBLE) - CAST(sx12 AS DOUBLE) * CAST(sx2 AS DOUBLE))
            + CAST(sx2 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * CAST(sx12 AS DOUBLE) - CAST(sx11 AS DOUBLE) * CAST(sx2 AS DOUBLE)))
           AS beta1
    FROM s
    """,
)
def ml_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear-regression training via normal equations —
    the scalable GLM step: the ONLY cluster work is accumulating the
    k×k sufficient statistics (X'X, X'y) as algebraic sums with
    map-side combine; the k×k solve is O(1) arithmetic afterwards.
    Features (quantity, discount-cents) and target (price-cents) are
    exact integers, so every sufficient statistic is an EXACT BIGINT
    in both engines; the Cramer solve then runs the identical
    double-precision expression on identical inputs — coefficients
    match bit-for-bit. (regr_slope covers k=1 in agg_regression;
    this is the multi-feature generalization.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x2"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("sx22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("sx2y"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    det = (
        d("n") * (d("sx11") * d("sx22") - d("sx12") * d("sx12"))
        - d("sx1") * (d("sx1") * d("sx22") - d("sx12") * d("sx2"))
        + d("sx2") * (d("sx1") * d("sx12") - d("sx11") * d("sx2"))
    )
    det0 = (
        d("sy") * (d("sx11") * d("sx22") - d("sx12") * d("sx12"))
        - d("sx1y") * (d("sx1") * d("sx22") - d("sx12") * d("sx2"))
        + d("sx2y") * (d("sx1") * d("sx12") - d("sx11") * d("sx2"))
    )
    det1 = (
        d("n") * (d("sx1y") * d("sx22") - d("sx12") * d("sx2y"))
        - d("sy") * (d("sx1") * d("sx22") - d("sx12") * d("sx2"))
        + d("sx2") * (d("sx1") * d("sx2y") - d("sx1y") * d("sx2"))
    )
    return s.select(
        "n",
        "sx1",
        "sx2",
        "sx11",
        "sx12",
        "sx22",
        "sy",
        "sx1y",
        "sx2y",
        (det0 / det).alias("beta0"),
        (det1 / det).alias("beta1"),
    )


@query(
    "fk_discovery_profile",
    oracle="""
    WITH pairs AS (
        SELECT 'orders.custkey->customer' AS pair,
               (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS child_d,
               (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS parent_d,
               (SELECT COUNT(*) FROM
                  (SELECT DISTINCT o_custkey FROM orders) c
                  JOIN (SELECT DISTINCT c_custkey FROM customer) p
                    ON c.o_custkey = p.c_custkey) AS contained
        UNION ALL
        SELECT 'lineitem.partkey->part',
               (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
               (SELECT COUNT(DISTINCT p_partkey) FROM part),
               (SELECT COUNT(*) FROM
                  (SELECT DISTINCT l_partkey FROM lineitem) c
                  JOIN (SELECT DISTINCT p_partkey FROM part) p
                    ON c.l_partkey = p.p_partkey)
        UNION ALL
        SELECT 'lineitem.suppkey->supplier',
               (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
               (SELECT COUNT(DISTINCT s_suppkey) FROM supplier),
               (SELECT COUNT(*) FROM
                  (SELECT DISTINCT l_suppkey FROM lineitem) c
                  JOIN (SELECT DISTINCT s_suppkey FROM supplier) p
                    ON c.l_suppkey = p.s_suppkey)
        UNION ALL
        SELECT 'orders.orderkey->customer',
               (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
               (SELECT COUNT(DISTINCT c_custkey) FROM customer),
               (SELECT COUNT(*) FROM
                  (SELECT DISTINCT o_orderkey FROM orders) c
                  JOIN (SELECT DISTINCT c_custkey FROM customer) p
                    ON c.o_orderkey = p.c_custkey)
    )
    SELECT pair, CAST(child_d AS BIGINT) AS child_d,
           CAST(parent_d AS BIGINT) AS parent_d,
           CAST(contained AS BIGINT) AS contained,
           CAST(contained AS DOUBLE) / child_d AS containment
    FROM pairs ORDER BY pair
    """,
)
def fk_discovery_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key discovery — the profiling pass that finds which
    column pairs behave like FK→PK before anyone writes a join:
    per candidate pair, distinct cardinalities and VALUE CONTAINMENT
    (child distincts present in the parent). True FKs score
    containment 1.0; the deliberate negative control
    (orderkey→custkey) scores near zero. Each side reduces to its
    DISTINCT key set first, so the containment join compares key
    sets, never the fact tables."""

    def profile(pair, child_df, child_col, parent_df, parent_col):
        c = child_df.select(F.col(child_col).alias("k")).distinct()
        p = parent_df.select(F.col(parent_col).alias("k")).distinct()
        return (
            c.join(p.withColumn("_hit", F.lit(1)), "k", "left")
            .agg(
                F.lit(pair).alias("pair"),
                F.count(F.lit(1)).cast("long").alias("child_d"),
                F.sum("_hit").cast("long").alias("contained"),
            )
            .crossJoin(
                F.broadcast(
                    p.agg(F.count(F.lit(1)).cast("long").alias("parent_d"))
                )
            )
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    rows = (
        profile("orders.custkey->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(
            profile("lineitem.partkey->part", li, "l_partkey", pt, "p_partkey")
        )
        .unionByName(
            profile(
                "lineitem.suppkey->supplier", li, "l_suppkey", s, "s_suppkey"
            )
        )
        .unionByName(
            profile(
                "orders.orderkey->customer", o, "o_orderkey", c, "c_custkey"
            )
        )
    )
    return rows.select(
        "pair",
        "child_d",
        "parent_d",
        F.coalesce(F.col("contained"), F.lit(0)).alias("contained"),
        (
            F.coalesce(F.col("contained"), F.lit(0)).cast("double")
            / F.col("child_d")
        ).alias("containment"),
    ).orderBy("pair")


# ---------------------------------------------------------------------------
# Trained quality classifier: distributed logistic regression.
# The fastText-style quality-filter step of a pretraining pipeline
# (score docs with a trained linear model), with the TRAINING loop
# itself distributed: each gradient-descent iteration is one
# aggregation whose map-side combine reduces every partition to a
# d-vector before the exchange — the treeAggregate shape MLlib's
# LogisticRegression uses. Weights round to 6 decimals per iteration
# (the same cross-engine determinism anchor as similarity/kmeans.py)
# so the DuckDB oracle's unrolled CTE chain walks identical states.
# ---------------------------------------------------------------------------

_LR_ITERS = 3
_LR_ETA = 1.0

_LR_FEAT_SQL = """
    feat AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0,
               n_chars / 500.0 AS x1,
               len(string_split(trim(regexp_replace(lower(text), '\\s+',
                   ' ', 'g')), ' ')) / 50.0 AS x2,
               n_chars / (len(string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ')) * 10.0) AS x3
        FROM documents
    )
"""


def _lr_oracle() -> str:
    dims = range(4)
    parts = [_LR_FEAT_SQL]
    parts.append(
        ", w0 AS (SELECT "
        + ", ".join(f"0.0 AS b{j}" for j in dims)
        + ")"
    )
    for t in range(1, _LR_ITERS + 1):
        z = " + ".join(f"w.b{j} * f.x{j}" for j in dims)
        parts.append(
            f""",
    g{t} AS (
        SELECT {', '.join(
            f'AVG((1.0/(1.0+exp(-({z}))) - f.y) * f.x{j}) AS g{j}'
            for j in dims)}
        FROM feat f CROSS JOIN w{t - 1} w
    ),
    w{t} AS (
        SELECT {', '.join(
            f'round(w.b{j} - {_LR_ETA} * g.g{j}, 6) AS b{j}'
            for j in dims)}
        FROM w{t - 1} w CROSS JOIN g{t} g
    )"""
        )
    z = " + ".join(f"w.b{j} * f.x{j}" for j in range(4))
    return f"""
    WITH {''.join(parts)}
    SELECT {', '.join(f'w.b{j}' for j in range(4))},
           AVG(-(f.y * ln(1.0/(1.0+exp(-({z}))))
                 + (1.0 - f.y) * ln(1.0 - 1.0/(1.0+exp(-({z})))))
              ) AS train_loss,
           AVG(CASE WHEN (CASE WHEN 1.0/(1.0+exp(-({z}))) >= 0.5
                               THEN 1.0 ELSE 0.0 END) = f.y
                    THEN 1.0 ELSE 0.0 END) AS train_acc,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM feat f CROSS JOIN w{_LR_ITERS} w
    GROUP BY {', '.join(f'w.b{j}' for j in range(4))}
    """




def _lr_feat(docs, *extra_cols):
    """The shared feature projection of the quality-filter family:
    y = [lang='en'], bias, and the three length/token-shape features.
    One definition — ml_logreg_quality, ml_logreg_score_filter, and
    ml_active_learning_batch must train the IDENTICAL chain."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    return docs.select(
        *extra_cols,
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 500.0).alias("x1"),
        (F.size(toks) / F.lit(50.0)).alias("x2"),
        (F.col("n_chars") / (F.size(toks) * F.lit(10.0))).alias("x3"),
    )


def _lr_z(w, prefix=""):
    return sum(
        (F.lit(w[j]) * F.col(f"{prefix}x{j}") for j in range(1, 4)),
        F.lit(w[0]) * F.col(f"{prefix}x0"),
    )


def _lr_train(feat):
    """Batch-GD training loop (3 epochs, lr=1.0, zero init, weights
    rounded to 6 decimals per epoch — the cross-engine contract the
    oracle replays). Ships d=4 partial sums per partition per epoch."""
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_LR_ITERS):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w)))
        grads = feat.agg(
            *[F.avg((p - F.col("y")) * F.col(f"x{j}")) for j in range(4)]
        ).first()
        w = [round(w[j] - _LR_ETA * grads[j], 6) for j in range(4)]
    return w


@query("ml_logreg_quality", oracle=_lr_oracle())
def ml_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training (batch GD, 3 epochs,
    lr=1.0, zero init) predicting lang='en' from length/token-shape
    features, plus final train loss/accuracy. Per iteration the
    cluster ships exactly d=4 partial sums per partition; the weight
    update is O(d) driver arithmetic — row-count independent."""
    feat = _lr_feat(load_table(spark, sf_dir, "documents"))
    w = _lr_train(feat)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w)))
    pred = F.when(p >= 0.5, 1.0).otherwise(0.0)
    return feat.agg(
        *[F.lit(w[j]).alias(f"b{j}") for j in range(4)],
        F.avg(
            -(
                F.col("y") * F.log(p)
                + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
            )
        ).alias("train_loss"),
        F.avg(
            F.when(pred == F.col("y"), 1.0).otherwise(0.0)
        ).alias("train_acc"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def _lr_score_oracle() -> str:
    base = _lr_oracle()
    # reuse the training chain, but emit per-doc scores instead of the
    # final metrics row: swap the tail SELECT for a scoring join.
    head = base[: base.rindex("SELECT")]
    z = " + ".join(f"w.b{j} * f.x{j}" for j in range(4))
    return f"""
    {head}
    , doc AS (
        SELECT d.doc_id, d.lang,
               CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0, d.n_chars / 500.0 AS x1,
               len(string_split(trim(regexp_replace(lower(d.text), '\\s+',
                   ' ', 'g')), ' ')) / 50.0 AS x2,
               d.n_chars / (len(string_split(trim(regexp_replace(
                   lower(d.text), '\\s+', ' ', 'g')), ' ')) * 10.0) AS x3
        FROM documents d
    )
    SELECT f.doc_id, round(1.0/(1.0+exp(-({z}))), 6) AS score,
           (1.0/(1.0+exp(-({z}))) >= 0.5) AS keep
    FROM doc f CROSS JOIN w{_LR_ITERS} w
    ORDER BY f.doc_id
    """


@query("ml_logreg_score_filter", oracle=_lr_score_oracle())
def ml_logreg_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply side of the trained quality filter: score every
    document with the 3-epoch weights and emit the keep decision —
    one broadcast of d=4 literals into a row-local expression, the
    filter pass that runs over the full 100 TB corpus."""
    feat = _lr_feat(load_table(spark, sf_dir, "documents"), "doc_id")
    w = _lr_train(feat)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w)))
    return feat.select(
        "doc_id",
        F.round(p, 6).alias("score"),
        (p >= 0.5).alias("keep"),
    ).orderBy("doc_id")


@query(
    "ml_eval_auc_rank",
    oracle="""
    WITH scored AS (
        SELECT n_chars AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    per_score AS (
        SELECT score,
               CAST(SUM(label) AS BIGINT) AS p_s,
               CAST(SUM(1 - label) AS BIGINT) AS n_s
        FROM scored GROUP BY score
    ),
    cum AS (
        SELECT score, p_s, n_s,
               COALESCE(SUM(n_s) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS neg_below
        FROM per_score
    ),
    tot AS (
        SELECT SUM(p_s) AS pos, SUM(n_s) AS neg FROM per_score
    )
    SELECT CAST(t.pos AS BIGINT) AS n_pos,
           CAST(t.neg AS BIGINT) AS n_neg,
           CAST(SUM(c.p_s * (2 * c.neg_below + c.n_s)) AS BIGINT)
               AS u2_stat,
           CAST(SUM(c.p_s * (2 * c.neg_below + c.n_s)) * 1000000
                // (2 * t.pos * t.neg) AS BIGINT) AS auc_ppm
    FROM cum c, tot t
    GROUP BY t.pos, t.neg
    """,
)
def ml_eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC by the rank/Mann-Whitney identity (the
    evaluation half of the trained-quality-filter family): AUC =
    P(score_pos > score_neg) + P(=)/2, computed distributed as ONE
    per-score aggregation plus a cumulative window — never the
    quadratic pos x neg pair join. Scores are the integer n_chars
    feature predicting lang='en', so ties are exact and the whole
    statistic stays in BIGINT arithmetic (auc_ppm = parts-per-
    million, integer floor both engines): no float rank drift can
    flip the hash.

    Scale: per-score partial aggregates combine map-side (score
    cardinality bounds the shuffle, not row count); the cumulative
    window runs over the distinct-score table. The same shape
    evaluates a real classifier at 100 TB - swap n_chars for the
    model score bucketed to fixed precision."""
    from pyspark.sql import Window

    scored = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    per_score = scored.groupBy("score").agg(
        F.sum("label").cast("long").alias("p_s"),
        F.sum(1 - F.col("label")).cast("long").alias("n_s"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("n_s").over(w), F.lit(0))
    )
    return cum.agg(
        F.sum("p_s").cast("long").alias("n_pos"),
        F.sum("n_s").cast("long").alias("n_neg"),
        F.sum(
            F.col("p_s") * (2 * F.col("neg_below") + F.col("n_s"))
        )
        .cast("long")
        .alias("u2_stat"),
    ).select(
        "n_pos",
        "n_neg",
        "u2_stat",
        F.expr("u2_stat * 1000000 div (2 * n_pos * n_neg)").alias(
            "auc_ppm"
        ),
    )


@query(
    "privacy_k_anonymity",
    oracle="""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'low'
                    ELSE 'high' END AS bal_bucket
        FROM customer
    ),
    grp AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT bal_bucket) AS BIGINT) AS l_diversity
        FROM qi GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size, l_diversity,
           CAST(group_size >= 5 AS BIGINT) AS k_anonymous_5,
           CAST(l_diversity >= 2 AS BIGINT) AS l_diverse_2
    FROM grp
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate a dataset
    release (or a training corpus with user-derived rows) runs before
    publication: group by the quasi-identifier tuple
    (nation, segment), measure each group's size (k-anonymity: a
    group smaller than k re-identifies its members) and the
    diversity of the sensitive attribute inside it (l-diversity: a
    uniform sensitive value leaks even in a large group; sensitive
    here = bucketed account balance). Rows in groups failing either
    flag are the ones to suppress or generalize.

    One hash aggregation with map-side combine; the report is
    |QI-domain| rows regardless of input size — the audit costs one
    shuffle of group partials at any scale. count(DISTINCT) inside
    the group rides Spark's expand-rewrite, still partial-aggregated.
    The oracle recomputes both metrics relationally."""
    qi = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("bal_bucket").cast("long").alias("l_diversity"),
    )
    return grp.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        "l_diversity",
        (F.col("group_size") >= 5).cast("long").alias("k_anonymous_5"),
        (F.col("l_diversity") >= 2).cast("long").alias("l_diverse_2"),
    ).orderBy("c_nationkey", "c_mktsegment")


@query(
    "ml_eval_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT n_chars AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    )
    SELECT LEAST(CAST(score // 50 AS BIGINT), 19) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           ROUND(AVG(CAST(label AS DOUBLE)), 6) AS observed_rate,
           CAST(MIN(score) AS BIGINT) AS score_lo,
           CAST(MAX(score) AS BIGINT) AS score_hi
    FROM scored
    GROUP BY 1 ORDER BY 1
    """,
)
def ml_eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins — the calibration half of classifier
    evaluation next to ml_eval_auc_rank's discrimination half: bucket
    the score axis (fixed-width, clamped tail), and per bin report
    support, positives, and the observed positive rate a calibration
    curve plots against the bin's score range. One hash aggregation
    with map-side combine; the report is |bins| rows at any scale —
    the same swap as AUC applies at 100 TB (bucket a real model's
    score to fixed precision)."""
    scored = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    return (
        scored.groupBy(
            F.least(
                (F.col("score") / 50).cast("long"), F.lit(19)
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("label").cast("long").alias("n_pos"),
            F.round(F.avg(F.col("label").cast("double")), 6).alias(
                "observed_rate"
            ),
            F.min("score").cast("long").alias("score_lo"),
            F.max("score").cast("long").alias("score_hi"),
        )
        .orderBy("bin")
    )


@query(
    "dataset_group_split_no_leakage",
    oracle="""
    WITH assigned AS (
        SELECT user_id, event_id,
               CASE
                 WHEN ('0x' || substring(md5('gsplit'
                        || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        % 10000 < 8000 THEN 'train'
                 WHEN ('0x' || substring(md5('gsplit'
                        || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        % 10000 < 9000 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM events
    ),
    leak AS (
        SELECT COUNT(*) AS leaked_users FROM (
            SELECT user_id FROM assigned
            GROUP BY user_id HAVING COUNT(DISTINCT split) > 1
        )
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users,
           CAST(MAX(l.leaked_users) AS BIGINT) AS leaked_users
    FROM assigned a CROSS JOIN leak l
    GROUP BY a.split
    ORDER BY a.split
    """,
)
def dataset_group_split_no_leakage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUP-AWARE train/val/test split — the leakage-safe variant of
    the row-level split: the hash is taken on user_id, so every event
    of a user lands in the same side (evaluating on a user whose
    other events were trained on is the classic leak). Deterministic
    md5-bucket assignment, no RNG; the query also AUDITS the
    guarantee — leaked_users counts users observed in more than one
    split, which the construction forces to 0 and the oracle
    verifies independently. One row-local projection + one
    aggregation; the leak audit groups by user (map-side combined)
    — the same cost as any per-user stat at 100 TB."""
    from etl_lens_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    b = hash_bucket(F.col("user_id"), "gsplit")
    assigned = ev.withColumn(
        "split",
        F.when(b < 8000, "train")
        .when(b < 9000, "val")
        .otherwise("test"),
    )
    leak = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_users"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .crossJoin(F.broadcast(leak))
        .select(
            "split",
            "n_events",
            "n_users",
            F.col("leaked_users").cast("long"),
        )
        .orderBy("split")
    )


@query(
    "dq_benford_digit_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
        GROUP BY digit
    ),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT o.digit, o.n,
           ROUND(CAST(o.n AS DOUBLE) / t.total, 6) AS observed_p,
           ROUND(log10(1.0 + 1.0 / o.digit), 6) AS benford_p,
           ROUND(POWER(CAST(o.n AS DOUBLE) / t.total
                 - log10(1.0 + 1.0 / o.digit), 2)
                 / log10(1.0 + 1.0 / o.digit) * t.total, 6)
             AS chi2_term
    FROM obs o CROSS JOIN tot t
    ORDER BY o.digit
    """,
)
def dq_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit — the forensic data-quality
    screen for fabricated or truncated numeric columns: leading
    digits of naturally-occurring amounts follow log10(1 + 1/d), and
    a per-digit chi-square decomposition localizes WHERE a
    distribution deviates (a spike at one digit is a price-floor or
    synthetic-data fingerprint; TPC-H's uniform-ish prices deviate
    by construction, which the report makes visible). Pure JVM: one
    leading-digit projection (integer truncation then first
    character — no float formatting ambiguity), one 9-row hash
    aggregation, broadcast total; the audit costs one combine pass
    at any scale. The oracle recomputes digit extraction,
    proportions, and the chi-square terms identically — with an
    explicit floor() before the integer cast on BOTH sides, because
    the bare double→bigint cast TRUNCATES in Spark but ROUNDS in
    DuckDB (found by this very hash: one 8999.99 price crossed
    digits)."""
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    bp = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(p, 6).alias("observed_p"),
            F.round(bp, 6).alias("benford_p"),
            F.round(
                F.pow(p - bp, F.lit(2)) / bp * F.col("total"), 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "stats_tail_index_hill",
    oracle="""
    WITH ranked AS (
        SELECT o_totalprice AS x,
               row_number() OVER (ORDER BY o_totalprice DESC,
                                  o_orderkey) AS r
        FROM orders
    ),
    topk AS (SELECT x, r FROM ranked WHERE r <= 200),
    xk AS (SELECT x AS x_k FROM topk WHERE r = 200)
    SELECT CAST(200 AS BIGINT) AS k,
           ROUND(MAX(x_k), 2) AS threshold,
           ROUND(AVG(ln(t.x / k2.x_k)), 6) AS hill_inv_alpha,
           ROUND(1.0 / AVG(ln(t.x / k2.x_k)), 6) AS tail_index_alpha
    FROM topk t CROSS JOIN xk k2
    WHERE t.r < 200
    """,
)
def stats_tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-tail audit via the HILL ESTIMATOR (the peaks-over-
    threshold workhorse): 1/α̂ = mean of ln(x_i / x_(k)) over the top
    k−1 order statistics — the number that says whether a value
    column (payments, token counts, file sizes) is power-law enough
    to break mean-based capacity planning (α ≤ 2 → infinite
    variance). The only ordered structure needed is the global TOP-K
    (TakeOrdered — a per-partition heap then a k-row merge, never a
    full sort), after which the estimator is one tiny aggregate over
    k rows; the oracle recomputes the identical order statistics and
    log-mean. Deterministic tie-break on the key column keeps the
    k-th order statistic unambiguous cross-engine."""
    k = 200
    topk = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
        .withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(
                    F.col("o_totalprice").desc(), F.col("o_orderkey")
                )
            ),
        )
    )
    xk = topk.filter(F.col("r") == k).select(
        F.col("o_totalprice").alias("x_k")
    )
    body = topk.filter(F.col("r") < k).crossJoin(F.broadcast(xk))
    inv_alpha = F.avg(F.log(F.col("o_totalprice") / F.col("x_k")))
    return body.agg(
        F.lit(k).cast("long").alias("k"),
        F.round(F.max("x_k"), 2).alias("threshold"),
        F.round(inv_alpha, 6).alias("hill_inv_alpha"),
        F.round(1.0 / inv_alpha, 6).alias("tail_index_alpha"),
    )


@query(
    "stats_js_divergence_drift",
    oracle="""
    WITH halves AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'p' ELSE 'q'
               END AS half
        FROM events
    ),
    counts AS (
        SELECT event_type, half, CAST(COUNT(*) AS BIGINT) AS n
        FROM halves GROUP BY event_type, half
    ),
    tot AS (SELECT half, SUM(n) AS t FROM counts GROUP BY half),
    probs AS (
        SELECT c.event_type,
               MAX(CASE WHEN c.half = 'p' THEN c.n / t.t END) AS p,
               MAX(CASE WHEN c.half = 'q' THEN c.n / t.t END) AS q
        FROM counts c JOIN tot t ON c.half = t.half
        GROUP BY c.event_type
    ),
    terms AS (
        SELECT event_type, p, q, (p + q) / 2 AS m,
               0.5 * p * ln(p / ((p + q) / 2))
               + 0.5 * q * ln(q / ((p + q) / 2)) AS jsd_term
        FROM probs
    )
    SELECT event_type, ROUND(p, 6) AS p, ROUND(q, 6) AS q,
           ROUND(jsd_term, 6) AS jsd_term,
           ROUND(SUM(jsd_term) OVER (), 6) AS jsd_total
    FROM terms
    ORDER BY event_type
    """,
)
def stats_js_divergence_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jensen-Shannon divergence between the first and second half of
    the month's event-type mix — the BOUNDED, SYMMETRIC member of
    the drift family next to KS (continuous) and PSI (binned): JSD ∈
    [0, ln 2], defined even when a category vanishes from one side,
    which is exactly where raw KL blows up. Reported per category
    (the decomposition says WHICH type drifted) plus the total. Two
    aggregations over the category domain — the drift monitor costs
    a |categories|-row shuffle at any scale; the window for the
    total runs over that reduced frame. Both engines compute the
    identical ln-based terms to 6 decimals."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "p"
        )
        .otherwise("q")
        .alias("half"),
    )
    counts = ev.groupBy("event_type", "half").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = counts.groupBy("half").agg(F.sum("n").alias("t"))
    probs = (
        counts.join(tot, "half")
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("half") == "p", F.col("n") / F.col("t"))
            ).alias("p"),
            F.max(
                F.when(F.col("half") == "q", F.col("n") / F.col("t"))
            ).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = 0.5 * F.col("p") * F.log(F.col("p") / m) + 0.5 * F.col(
        "q"
    ) * F.log(F.col("q") / m)
    w = Window.partitionBy()
    return (
        probs.withColumn("jsd_term", term)
        .select(
            "event_type",
            F.round("p", 6).alias("p"),
            F.round("q", 6).alias("q"),
            F.round("jsd_term", 6).alias("jsd_term"),
            F.round(F.sum("jsd_term").over(w), 6).alias("jsd_total"),
        )
        .orderBy("event_type")
    )


@query(
    "dq_uniqueness_entropy_profile",
    oracle="""
    WITH cols AS (
        SELECT 'o_orderpriority' AS col, o_orderpriority AS v
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL
        SELECT 'o_orderkey_mod', CAST(o_orderkey % 100 AS VARCHAR)
        FROM orders
    ),
    vc AS (
        SELECT col, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM cols GROUP BY col, v
    ),
    tot AS (SELECT col, SUM(c) AS n FROM vc GROUP BY col)
    SELECT v.col,
           CAST(MAX(t.n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(SUM(-1.0 * v.c / t.n * ln(v.c / CAST(t.n AS DOUBLE))),
                 6) AS entropy_nats,
           ROUND(SUM(-1.0 * v.c / t.n * ln(v.c / CAST(t.n AS DOUBLE)))
                 / ln(CAST(COUNT(*) AS DOUBLE)), 6)
             AS entropy_ratio
    FROM vc v JOIN tot t ON v.col = t.col
    GROUP BY v.col
    ORDER BY v.col
    """,
)
def dq_uniqueness_entropy_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLUMN-ENTROPY profiling — the information-theoretic uniqueness
    signal NDV counting misses: two columns can both have 100
    distinct values while one is uniform (entropy ratio ≈ 1, a good
    join/partition key) and the other 99%-skewed to one value
    (ratio ≈ 0 — a key that would put 99% of a 100 TB shuffle in one
    reducer). Reported per column: distinct count, Shannon entropy,
    and the ratio to its maximum ln(NDV) — the normalized number a
    partitioning advisor thresholds on. Value-frequency reduction
    per column (map-side combined) then a |columns|-bounded
    aggregation; the unpivoted multi-column scan reads the table
    once on the Spark side."""
    orders = load_table(spark, sf_dir, "orders")
    cols = (
        orders.select(
            F.lit("o_orderpriority").alias("col"),
            F.col("o_orderpriority").alias("v"),
        )
        .unionAll(
            orders.select(
                F.lit("o_orderstatus"), F.col("o_orderstatus")
            )
        )
        .unionAll(
            orders.select(
                F.lit("o_orderkey_mod"),
                (F.col("o_orderkey") % 100).cast("string"),
            )
        )
    )
    vc = cols.groupBy("col", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = vc.groupBy("col").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    ent = F.sum(-1.0 * p * F.log(F.col("c") / F.col("n").cast("double")))
    return (
        vc.join(F.broadcast(tot), "col")
        .groupBy("col")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(ent, 6).alias("entropy_nats"),
            F.round(
                ent / F.log(F.count(F.lit(1)).cast("double")), 6
            ).alias("entropy_ratio"),
        )
        .orderBy("col")
    )


@query(
    "dq_referential_orphan_rate",
    oracle="""
    WITH loaded AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0
    ),
    li AS (
        SELECT l_orderkey,
               date_trunc('month', l_shipdate) AS month
        FROM lineitem
    )
    SELECT CAST(li.month AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lo.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans,
           ROUND(AVG(CASE WHEN lo.o_orderkey IS NULL
                     THEN 1.0 ELSE 0.0 END), 6) AS orphan_rate
    FROM li LEFT JOIN loaded lo ON li.l_orderkey = lo.o_orderkey
    GROUP BY li.month
    ORDER BY li.month
    """,
)
def dq_referential_orphan_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REFERENTIAL-INTEGRITY monitoring over time — the nightly
    check that catches a broken upstream load: fact rows whose
    dimension key resolves to nothing ('orphans'), reported as a
    rate per ship-month so a partial dim load shows up as a step in
    the time series, not a single buried total. The dimension here
    simulates a 1% load failure (every 97th order missing) so the
    report is non-degenerate and the oracle pins exact orphan
    counts. Plan shape: LEFT join against the loaded key set (AQE
    picks broadcast when the dim fits, SMJ at scale), existence
    check folded into the aggregation — one pass, no second
    anti-join scan."""
    loaded = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 != 0)
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.trunc("l_shipdate", "month").alias("month")
    )
    j = li.join(
        loaded, li.l_orderkey == loaded.o_orderkey, "left"
    )
    orphan = F.col("o_orderkey").isNull()
    return (
        j.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(orphan.cast("int")).cast("long").alias("n_orphans"),
            F.round(F.avg(orphan.cast("double")), 6).alias(
                "orphan_rate"
            ),
        )
        .orderBy("month")
    )


@query(
    "profile_fd_discovery",
    oracle="""
    WITH pairs AS (
      SELECT 'orders' AS tbl, 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
             CAST(o_orderkey AS VARCHAR) AS a,
             CAST(o_custkey AS VARCHAR) AS b
      FROM orders
      UNION ALL
      SELECT 'orders', 'o_custkey', 'o_orderpriority',
             CAST(o_custkey AS VARCHAR), o_orderpriority
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'l_partkey', 'l_suppkey',
             CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_returnflag', 'l_linestatus',
             l_returnflag, l_linestatus
      FROM lineitem
    ),
    ab AS (
      SELECT tbl, lhs, rhs, a, b, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY tbl, lhs, rhs, a, b
    ),
    grp AS (
      SELECT tbl, lhs, rhs, a,
             CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(MAX(cnt) AS BIGINT) AS keep
      FROM ab GROUP BY tbl, lhs, rhs, a
    )
    SELECT tbl, lhs, rhs,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(SUM(total) AS BIGINT) AS n_rows,
           CAST(SUM(total - keep) AS BIGINT) AS violation_rows,
           1.0 - CAST(SUM(total - keep) AS DOUBLE)
               / CAST(SUM(total) AS DOUBLE) AS determinism,
           SUM(total - keep) = 0 AS holds
    FROM grp
    GROUP BY tbl, lhs, rhs
    ORDER BY tbl, lhs, rhs
    """,
)
def profile_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs
    (the HyFD/Metanome profiling primitive, g3-error variant): for
    each LHS → RHS candidate, the violation count is the minimum
    number of rows to delete before the FD holds — per LHS group,
    everything except the plurality RHS value. Emits determinism
    (1 − violation rate) and an exact holds flag; o_orderkey →
    o_custkey is the planted true FD (key ⇒ everything), the other
    three candidates quantify HOW false they are, which is the
    useful profiling output.

    Scale posture: each candidate is two map-side-combining groupBys
    — (lhs, rhs) value-pair counts, then LHS-group plurality — on
    well-distributed value keys; candidates union into ONE plan so
    the table scans are shared per source table, and no row ever
    carries more than (tag, a, b). No windows, no driver loops."""
    fd_candidates = [
        ("orders", "o_orderkey", "o_custkey"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_partkey", "l_suppkey"),
        ("lineitem", "l_returnflag", "l_linestatus"),
    ]
    parts = []
    for tbl, lhs, rhs in fd_candidates:
        t = load_table(spark, sf_dir, tbl)
        parts.append(
            t.select(
                F.lit(tbl).alias("tbl"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col(lhs).cast("string").alias("a"),
                F.col(rhs).cast("string").alias("b"),
            )
        )
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.unionByName(p)
    ab = pairs.groupBy("tbl", "lhs", "rhs", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    grp = ab.groupBy("tbl", "lhs", "rhs", "a").agg(
        F.sum("cnt").cast("long").alias("total"),
        F.max("cnt").cast("long").alias("keep"),
    )
    viol = F.sum(F.col("total") - F.col("keep")).cast("long")
    return (
        grp.groupBy("tbl", "lhs", "rhs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lhs_groups"),
            F.sum("total").cast("long").alias("n_rows"),
            viol.alias("violation_rows"),
            (
                F.lit(1.0)
                - F.sum(F.col("total") - F.col("keep")).cast("double")
                / F.sum("total").cast("double")
            ).alias("determinism"),
            (F.sum(F.col("total") - F.col("keep")) == 0).alias("holds"),
        )
        .orderBy("tbl", "lhs", "rhs")
    )


@query(
    "ml_eval_ndcg_rank",
    oracle="""
    WITH rel AS (
      SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
             CAST(SUM(l.l_quantity) AS BIGINT) AS rel
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    pop AS (
      SELECT l_partkey AS partkey, CAST(COUNT(*) AS BIGINT) AS popularity
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT r.custkey, r.rel,
             row_number() OVER (
               PARTITION BY r.custkey
               ORDER BY p.popularity DESC, r.partkey) AS pred_rank,
             row_number() OVER (
               PARTITION BY r.custkey
               ORDER BY r.rel DESC, r.partkey) AS ideal_rank
      FROM rel r JOIN pop p ON r.partkey = p.partkey
    ),
    per_cust AS (
      SELECT custkey,
             SUM(CASE WHEN pred_rank <= 10 THEN
                 CAST(rel AS DOUBLE) / log2(CAST(pred_rank AS DOUBLE) + 1.0)
                 ELSE 0.0 END) AS dcg,
             SUM(CASE WHEN ideal_rank <= 10 THEN
                 CAST(rel AS DOUBLE) / log2(CAST(ideal_rank AS DOUBLE) + 1.0)
                 ELSE 0.0 END) AS idcg
      FROM ranked GROUP BY custkey
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           AVG(p.dcg / p.idcg) AS mean_ndcg_at_10
    FROM per_cust p JOIN customer c ON p.custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def ml_eval_ndcg_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation: nDCG@10 of a popularity ranker
    against observed per-customer purchase quantities — completes the
    offline-eval family next to ml_eval_auc_rank (AUC) and
    ml_eval_calibration_bins. Predicted order = global item
    popularity (the no-personalization baseline every recommender is
    measured against); relevance = the customer's actual quantity;
    ideal order = relevance itself. Both rankings tie-break on
    partkey so the metric is deterministic cross-engine.

    Scale posture: relevance and popularity are two map-side-
    combining aggregates; the rank windows partition BY CUSTOMER
    (bounded groups, no global sort); the popularity join runs on the
    well-distributed partkey. idcg > 0 always (each customer has ≥ 1
    purchased part with rel ≥ 1), so the ratio is total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rel = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("rel"))
    )
    pop = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.count(F.lit(1)).cast("long").alias("popularity")
    )
    w_pred = Window.partitionBy("custkey").orderBy(
        F.col("popularity").desc(), F.col("partkey")
    )
    w_ideal = Window.partitionBy("custkey").orderBy(
        F.col("rel").desc(), F.col("partkey")
    )
    ranked = (
        rel.join(pop, "partkey")
        .select(
            "custkey",
            "rel",
            F.row_number().over(w_pred).alias("pred_rank"),
            F.row_number().over(w_ideal).alias("ideal_rank"),
        )
    )
    gain = lambda rank_col: F.when(  # noqa: E731 — tiny local shape
        F.col(rank_col) <= 10,
        F.col("rel").cast("double")
        / F.log2(F.col(rank_col).cast("double") + F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    per_cust = ranked.groupBy("custkey").agg(
        F.sum(gain("pred_rank")).alias("dcg"),
        F.sum(gain("ideal_rank")).alias("idcg"),
    )
    return (
        per_cust.join(c, per_cust["custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.avg(F.col("dcg") / F.col("idcg")).alias("mean_ndcg_at_10"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Active-learning batch selection (uncertainty sampling)
# ---------------------------------------------------------------------------

_AL_K = 16


def _al_oracle() -> str:
    base = _lr_oracle()
    head = base[: base.rindex("SELECT")]
    z = " + ".join(f"w.b{j} * f.x{j}" for j in range(4))
    return f"""
    {head}
    , doc AS (
        SELECT d.doc_id,
               1.0 AS x0, d.n_chars / 500.0 AS x1,
               len(string_split(trim(regexp_replace(lower(d.text), '\\s+',
                   ' ', 'g')), ' ')) / 50.0 AS x2,
               d.n_chars / (len(string_split(trim(regexp_replace(
                   lower(d.text), '\\s+', ' ', 'g')), ' ')) * 10.0) AS x3
        FROM documents d
    ),
    sc AS (
        SELECT f.doc_id, round(1.0/(1.0+exp(-({z}))), 6) AS score,
               1.0/(1.0+exp(-({z}))) AS p_raw
        FROM doc f CROSS JOIN w{_LR_ITERS} w
    ),
    rk AS (
        SELECT doc_id, score, ABS(score - 0.5) AS uncertainty,
               round(-(p_raw * ln(p_raw)
                       + (1.0 - p_raw) * ln(1.0 - p_raw)), 6) AS entropy,
               row_number() OVER (
                   ORDER BY ABS(score - 0.5), doc_id) AS al_rank
        FROM sc
    )
    SELECT CAST(al_rank AS BIGINT) AS al_rank, doc_id, score,
           uncertainty, entropy
    FROM rk WHERE al_rank <= {_AL_K}
    ORDER BY al_rank
    """


@query("ml_active_learning_batch", oracle=_al_oracle())
def ml_active_learning_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] Active-learning batch selection by uncertainty sampling:
    the {_AL_K} documents the trained quality filter (the 3-epoch
    batch-GD logistic model of ml_logreg_quality, identical training
    chain) is LEAST sure about — |p − ½| minimal, deterministic
    doc_id tie-break — plus the predictive entropy each carries.
    This is the labeling-budget allocator of a data-curation loop:
    human labels go to the batch the current filter can't decide,
    the filter retrains, repeat.

    100 TB posture: training ships d=4 partial sums per partition
    per epoch (row-count independent driver state); scoring is a
    broadcast of 4 literals into row-local expressions; the top-k by
    uncertainty compiles to WindowGroupLimit, so each task forwards
    k rows and the corpus never sorts globally. The oracle replays
    the identical training recurrence and selection."""
    feat = _lr_feat(load_table(spark, sf_dir, "documents"), "doc_id")
    w = _lr_train(feat)
    p_raw = F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w)))
    score = F.round(p_raw, 6)
    from pyspark.sql import Window as _W

    sc = feat.select(
        "doc_id",
        score.alias("score"),
        F.abs(score - 0.5).alias("uncertainty"),
        F.round(
            -(
                p_raw * F.log(p_raw)
                + (F.lit(1.0) - p_raw) * F.log(F.lit(1.0) - p_raw)
            ),
            6,
        ).alias("entropy"),
    )
    wd = _W.orderBy("uncertainty", "doc_id")
    return (
        sc.withColumn("al_rank", F.row_number().over(wd))
        .filter(F.col("al_rank") <= _AL_K)
        .select(
            F.col("al_rank").cast("long").alias("al_rank"),
            "doc_id",
            "score",
            "uncertainty",
            "entropy",
        )
        .orderBy("al_rank")
    )
