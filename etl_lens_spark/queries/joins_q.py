"""As-of and range join queries (operators.joins) with DuckDB oracles
(ASOF JOIN / theta join respectively) — the compositions SQLite users
write with correlated subqueries, executed shuffle-efficiently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.operators import joins as oj
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


@query(
    "asof_join_last_click",
    oracle="""
    WITH errors AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'error'
    ),
    clicks AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'
    )
    SELECT e.event_id, e.user_id, e.ts_us,
           c.event_id AS right_event_id,
           c.ts_us AS right_ts_us
    FROM errors e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts_us <= e.ts_us
    ORDER BY e.event_id
    """,
    headline=True,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'error' event, the most recent 'click' by
    the same user at or before it (union-trick window plan — one
    shuffle on user_id, no pair explosion; operators.joins.as_of_join).
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    out = oj.as_of_join(
        errors,
        clicks,
        on=["user_id"],
        left_time="ts_us",
        right_time="ts_us",
        right_payload=["event_id", "ts_us"],
    )
    return out.orderBy("event_id")


@query(
    "asof_join_forward",
    oracle="""
    WITH errors AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'error'
    ),
    clicks AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'
    )
    SELECT e.event_id, e.user_id, e.ts_us,
           c.event_id AS right_event_id,
           c.ts_us AS right_ts_us
    FROM errors e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts_us >= e.ts_us
    ORDER BY e.event_id
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every 'error' event, the EARLIEST
    'click' by the same user at or after it (the attribution
    direction: what did the user do next). Same union-trick window
    plan as backward, with the time axis ordered descending."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    out = oj.as_of_join(
        errors,
        clicks,
        on=["user_id"],
        left_time="ts_us",
        right_time="ts_us",
        right_payload=["event_id", "ts_us"],
        direction="forward",
    )
    return out.orderBy("event_id")


@query(
    "asof_join_nearest",
    oracle="""
    WITH errors AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'error'
    ),
    clicks AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'
    ),
    cand AS (
        SELECT e.event_id,
               c.event_id AS c_id, c.ts_us AS c_ts,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY abs(c.ts_us - e.ts_us),
                            CASE WHEN c.ts_us <= e.ts_us THEN 0 ELSE 1 END
               ) AS rn
        FROM errors e JOIN clicks c ON c.user_id = e.user_id
    )
    SELECT e.event_id, e.user_id, e.ts_us,
           cand.c_id AS right_event_id,
           cand.c_ts AS right_ts_us
    FROM errors e LEFT JOIN cand
      ON e.event_id = cand.event_id AND cand.rn = 1
    ORDER BY e.event_id
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: the click closest in time to each error,
    either side; tie at equal distance → backward wins (pandas
    merge_asof direction='nearest'). One shuffle, two in-partition
    window sorts — the oracle's quadratic candidate join is exactly
    what this plan avoids."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    out = oj.as_of_join(
        errors,
        clicks,
        on=["user_id"],
        left_time="ts_us",
        right_time="ts_us",
        right_payload=["event_id", "ts_us"],
        direction="nearest",
    )
    return out.orderBy("event_id")


@query(
    "range_join_clicks_before_purchase",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           COUNT(c.ts_us) AS n_clicks_1h
    FROM purchases p
    LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND c.ts_us BETWEEN p.ts_us - 3600000000 AND p.ts_us
    GROUP BY p.event_id, p.user_id
    ORDER BY p.event_id
    """,
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-range join: clicks within the hour before each
    purchase, counted per purchase. Banded equi-join plan
    (operators.joins.range_join_point) — hash join on
    (user_id, hour-bucket) instead of a nested-loop theta join."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    hour_us = 3_600_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("p_ts"),
        (F.col("ts_us") - hour_us).alias("lo"),
        F.col("ts_us").alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_ts")
    )
    joined = oj.range_join_point(
        purchases,
        clicks,
        on=["user_id"],
        lo="lo",
        hi="hi",
        point="c_ts",
        bucket_width=float(hour_us),
    )
    # left-join semantics for the count: purchases with no clicks in
    # range must appear with 0 — recover them with a left anti union
    counts = joined.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h")
    )
    all_p = purchases.select("event_id", "user_id")
    zeros = all_p.join(counts.select("event_id"), "event_id", "left_anti").withColumn(
        "n_clicks_1h", F.lit(0).cast("long")
    )
    return counts.unionByName(zeros).orderBy("event_id")


@query(
    "bloom_prefilter_join",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact join (operators/bloom.py): urgent orders'
    key set reduces to its bloom positions (≤ m_bits rows, always
    broadcast-able); lineitem drops ~4/5 of its rows via two
    broadcast-semi position probes BEFORE the exact join ships
    anything. False positives are cleaned up by the exact join, so
    the result is identical to the plain join — which is exactly what
    the oracle asserts."""
    from etl_lens_spark.operators import bloom

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = bloom.bloom_positions(o, "o_orderkey")
    li_pruned = bloom.bloom_prefilter(li, pos, "l_orderkey")
    return (
        li_pruned.join(o, li_pruned.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "interval_overlap_join",
    oracle="""
    WITH promo AS (
        SELECT o_orderkey AS promo_id,
               CAST(o_orderdate AS DATE) AS a_s,
               CAST(o_orderdate AS DATE) + 30 AS a_e
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    ord AS (
        SELECT o_orderkey AS order_id,
               CAST(o_orderdate AS DATE) AS b_s,
               CAST(o_orderdate AS DATE) + 7 AS b_e
        FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT p.promo_id, o.order_id
    FROM promo p JOIN ord o
      ON p.a_s < o.b_e AND o.b_s < p.a_e
    ORDER BY promo_id, order_id
    """,
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with NO equi key: 30-day promo windows
    against 7-day order windows, all pairs whose half-open intervals
    intersect. The oracle runs the literal theta join; the Spark plan
    must not — an unconstrained non-equi join is a cartesian product
    at scale. ``interval_overlap_join_banded`` explodes each interval
    to the fixed-width calendar bands it touches (row-local
    arithmetic), hash-joins on the band id, and filters band
    collisions with the exact predicate. ``band_days`` is a declared
    CAPACITY KNOB (was a hard-coded month): the result is
    band-invariant (tests sweep 1/7/30/90 days) while per-band pair
    density — the thing that saturates at real scale — moves with the
    width; the round-4 probe in PLANS.md tabulates the tradeoff."""
    from etl_lens_spark.operators.joins import interval_overlap_join_banded

    orders = load_table(spark, sf_dir, "orders")
    promo = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        F.col("o_orderdate").cast("date").alias("a_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("a_e"),
    )
    ordw = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("b_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("b_e"),
    )
    return (
        interval_overlap_join_banded(
            promo, ordw, "a_s", "a_e", "b_s", "b_e", band_days=30
        )
        .select("promo_id", "order_id")
        .orderBy("promo_id", "order_id")
    )


@query(
    "geo_grid_nearest_join",
    oracle="""
    WITH cust AS (
        SELECT c_custkey,
               ('0x' || substring(md5('lat' || CAST(c_custkey AS VARCHAR)),
                                  1, 8))::BIGINT % 10000001 AS lat,
               ('0x' || substring(md5('lon' || CAST(c_custkey AS VARCHAR)),
                                  1, 8))::BIGINT % 10000001 AS lon
        FROM customer
    ),
    sup AS (
        SELECT s_suppkey,
               ('0x' || substring(md5('slat' || CAST(s_suppkey AS VARCHAR)),
                                  1, 8))::BIGINT % 10000001 AS lat,
               ('0x' || substring(md5('slon' || CAST(s_suppkey AS VARCHAR)),
                                  1, 8))::BIGINT % 10000001 AS lon
        FROM supplier
    ),
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon) AS d2,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY (c.lat - s.lat) * (c.lat - s.lat)
                            + (c.lon - s.lon) * (c.lon - s.lon),
                            s.s_suppkey) AS rn
        FROM cust c JOIN sup s
          ON (s.lat // 1000000)
               BETWEEN (c.lat // 1000000) - 1 AND (c.lat // 1000000) + 1
         AND (s.lon // 1000000)
               BETWEEN (c.lon // 1000000) - 1 AND (c.lon // 1000000) + 1
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, d2
    FROM cand WHERE rn = 1 ORDER BY c_custkey
    """,
)
def geo_grid_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial nearest-neighbor join via grid banding: deterministic
    synthetic coordinates (md5-uniform integer microdegrees in a
    10°×10° box — the fixture has no geo columns, and integer-squared
    distance keeps every compare exact cross-engine), suppliers
    indexed by their 1° grid cell, each customer probing its 3×3
    neighborhood — an EQUI join on the cell pair instead of the
    all-pairs distance join the oracle's BETWEEN predicate expresses.
    Contract: nearest within the neighborhood (grid-bounded kNN —
    the standard two-level spatial-join reduction; at planetary scale
    cell size trades candidate fan-in against multi-cell probes, and
    the haversine swap-in only changes the distance expression).
    Probe-side explode is 9 row-local structs; the argmin is one
    window on the customer key riding the join's partitioning."""
    uni = lambda salt, col: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(col).cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000001
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        uni("lat", "c_custkey").alias("lat"),
        uni("lon", "c_custkey").alias("lon"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        uni("slat", "s_suppkey").alias("slat"),
        uni("slon", "s_suppkey").alias("slon"),
    ).withColumn("cx", F.expr("slat div 1000000")).withColumn(
        "cy", F.expr("slon div 1000000")
    )
    probes = cust.select(
        "c_custkey",
        "lat",
        "lon",
        F.explode(
            F.expr(
                "transform(sequence(0, 8), i -> "
                "struct((lat div 1000000) + (i div 3) - 1 AS cx, "
                "(lon div 1000000) + (i % 3) - 1 AS cy))"
            )
        ).alias("cell"),
    ).select("c_custkey", "lat", "lon", "cell.cx", "cell.cy")
    d2 = (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat")) + (
        F.col("lon") - F.col("slon")
    ) * (F.col("lon") - F.col("slon"))
    cand = probes.join(sup, ["cx", "cy"]).select(
        "c_custkey", "s_suppkey", d2.alias("d2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey", F.col("s_suppkey").alias("nearest_suppkey"), "d2"
        )
        .orderBy("c_custkey")
    )
