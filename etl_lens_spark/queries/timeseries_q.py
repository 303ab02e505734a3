"""Time-series analytics over the event log: regular-grid resampling
with gap filling (forward fill), and ordered funnel conversion — the
two event-stream analyses the reference's trace viewer invites but
never implements (its ETW trace IS a timestamped event stream,
``src/main.cpp:143``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.operators.staging import stage


def _floor_div_us(col: str, divisor_us: int):
    """Exact integer FLOOR division of ``unix_micros(col)`` by a µs
    divisor — ``(x - pmod(x, d)) div d`` stays in bigint arithmetic
    (no 53-bit double mantissa ceiling) and floors toward -inf for
    pre-1970 timestamps, matching DuckDB's ``//`` semantics where
    Spark's bare ``div`` would truncate toward zero."""
    return F.expr(
        f"(unix_micros({col}) - pmod(unix_micros({col}), {divisor_us}))"
        f" div {divisor_us}"
    )


@query(
    "ts_gapfill_ffill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('hour', MIN(ts)) AS t0,
               date_trunc('hour', MAX(ts)) AS t1
        FROM events WHERE user_id < 8 GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events WHERE user_id < 8 GROUP BY 1, 2
    )
    SELECT g.user_id,
           epoch_us(CAST(g.h AS TIMESTAMP)) AS hour_us,
           h.v IS NOT NULL AS observed,
           CAST(COALESCE(h.v, LAST_VALUE(h.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           )) AS DOUBLE) AS v_filled
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.h = h.h
    ORDER BY g.user_id, hour_us
    """,
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill: per-user hourly grid
    (``sequence`` — row-local expansion, no shuffle) left-joined with
    the hourly aggregate, gaps filled by ``last_value(ignoreNulls)``
    over an ordered window. The standard IoT/metrics densification;
    grid stays keyed by user so the fill window shards naturally."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("t0"),
            F.date_trunc("hour", F.max("ts")).alias("t1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return joined.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.col("v").isNotNull().alias("observed"),
        F.coalesce("v", F.last("v", ignorenulls=True).over(w))
        .cast("double")
        .alias("v_filled"),
    ).orderBy("user_id", "hour_us")


@query(
    "win_rolling_time_sum",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_sum,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_1h_n
    FROM events
    WHERE user_id < 10
    ORDER BY event_id
    """,
)
def win_rolling_time_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling time-window aggregate: per-user trailing-1-hour sum and
    count via a RANGE frame over the µs epoch — the sliding-window
    shape that doesn't quantize to fixed buckets (vs the tumbling/
    hopping ``F.window`` aggregates). One shuffle on user_id; frame
    evaluation is a per-partition ordered scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("rolling_1h_n"),
    ).orderBy("event_id")


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition matrix (what follows what, per
    user): LEAD over the per-user ordered stream folded to
    (from, to) counts — the first-order Markov view of the event log
    (session-path analysis, anomaly baselines). One shuffle on
    user_id for the window, one on the pair for the count; the
    event_id tiebreak makes same-timestamp ordering deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "next_type")
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_signup,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS s_click,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS s_purchase
        FROM events GROUP BY user_id
    ),
    flags AS (
        SELECT user_id,
               s_signup IS NOT NULL AS did_signup,
               s_signup IS NOT NULL AND s_click IS NOT NULL
                   AND s_click > s_signup AS did_click,
               s_signup IS NOT NULL AND s_click IS NOT NULL
                   AND s_click > s_signup AND s_purchase IS NOT NULL
                   AND s_purchase > s_click AS did_purchase
        FROM stages
    )
    SELECT COUNT(*) FILTER (did_signup) AS n_signup,
           COUNT(*) FILTER (did_click) AS n_click_after,
           COUNT(*) FILTER (did_purchase) AS n_purchase_after,
           CAST(COUNT(*) FILTER (did_purchase) AS DOUBLE)
               / COUNT(*) FILTER (did_signup) AS conversion
    FROM flags
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → later click → later purchase) per
    user, folded to stage counts + conversion rate. One shuffle: the
    per-user min-per-stage conditional aggregation; the ordering
    constraints are then row-local."""
    ev = load_table(spark, sf_dir, "events")

    def stage_min(name: str):
        return F.min(
            F.when(F.col("event_type") == name, F.unix_micros("ts"))
        )

    stages = ev.groupBy("user_id").agg(
        stage_min("signup").alias("s_signup"),
        stage_min("click").alias("s_click"),
        stage_min("purchase").alias("s_purchase"),
    )
    did_signup = F.col("s_signup").isNotNull()
    did_click = (
        did_signup
        & F.col("s_click").isNotNull()
        & (F.col("s_click") > F.col("s_signup"))
    )
    did_purchase = (
        did_click
        & F.col("s_purchase").isNotNull()
        & (F.col("s_purchase") > F.col("s_click"))
    )
    flags = stages.select(
        did_signup.alias("did_signup"),
        did_click.alias("did_click"),
        did_purchase.alias("did_purchase"),
    )
    return flags.agg(
        F.count(F.when(F.col("did_signup"), 1)).alias("n_signup"),
        F.count(F.when(F.col("did_click"), 1)).alias("n_click_after"),
        F.count(F.when(F.col("did_purchase"), 1)).alias("n_purchase_after"),
        (
            F.count(F.when(F.col("did_purchase"), 1)).cast("double")
            / F.count(F.when(F.col("did_signup"), 1))
        ).alias("conversion"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ),
    f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
    SELECT CAST(f.cohort_wk AS BIGINT) AS cohort_wk,
           CAST(e.wk - f.cohort_wk AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM e JOIN f USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_wk, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week,
    counted distinct in every later week they return — the standard
    product-analytics retention matrix.

    Shape: the cohort week rides along via a partition-only window
    MIN (same shuffle key as the event stream's user_id, no join
    back), then one distinct-count aggregate on (cohort, offset).
    Week indices are integer µs division in BOTH engines — never raw
    ns timestamps (events parquet is TIMESTAMP_NS)."""
    week_us = 604_800_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        _floor_div_us("ts", week_us).alias("wk"),
    )
    cohort = F.min("wk").over(Window.partitionBy("user_id"))
    return (
        ev.select(
            "user_id",
            cohort.alias("cohort_wk"),
            (F.col("wk") - cohort).alias("week_offset"),
        )
        .groupBy("cohort_wk", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
        .orderBy("cohort_wk", "week_offset")
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
                    AS BIGINT) AS month_idx,
               l_extendedprice AS px,
               l_quantity,
               datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                   * 1000000000000
                   + l_orderkey * 100 + l_linenumber AS ord
        FROM lineitem
    )
    SELECT l_returnflag, month_idx,
           arg_min(px, ord) AS open,
           MAX(px) AS high,
           MIN(px) AS low,
           arg_max(px, ord) AS close,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_trades
    FROM t
    GROUP BY 1, 2
    ORDER BY l_returnflag, month_idx
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: irregular per-line prices folded to
    monthly open/high/low/close/volume bars per return flag — the
    financial downsampling primitive, as ONE declarative aggregate.

    Open/close are `min_by`/`max_by` over a deterministic composite
    order key (ship day, orderkey, linenumber packed into one
    BIGINT), so first/last never depend on partition layout and both
    engines agree exactly. Single shuffle; min_by/max_by combine
    map-side like any algebraic aggregate, so 100 TB of lines still
    reduces to (flags x months) rows. The packed key reserves 1e12
    per day slot — wide enough for TPC-H orderkeys through sf100;
    repack (or order by a struct) beyond that."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("month_idx"),
        F.col("l_extendedprice").alias("px"),
        "l_quantity",
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
            .cast("long")
            * F.lit(1_000_000_000_000)
            + F.col("l_orderkey") * 100
            + F.col("l_linenumber")
        ).alias("ord"),
    )
    return (
        t.groupBy("l_returnflag", "month_idx")
        .agg(
            F.min_by("px", "ord").alias("open"),
            F.max("px").alias("high"),
            F.min("px").alias("low"),
            F.max_by("px", "ord").alias("close"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
            F.count(F.lit(1)).cast("long").alias("n_trades"),
        )
        .orderBy("l_returnflag", "month_idx")
    )


@query(
    "ts_gapfill_linear",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE user_id < 8
    ),
    bounds AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM bounds
    ),
    hourly AS (
        SELECT user_id, h, CAST(SUM(v) AS DOUBLE) AS v
        FROM ev GROUP BY user_id, h
    ),
    joined AS (
        SELECT g.user_id, g.h, o.v IS NOT NULL AS observed, o.v,
               LAST_VALUE(o.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_v,
               LAST_VALUE(CASE WHEN o.v IS NOT NULL THEN g.h END
                          IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_h,
               FIRST_VALUE(o.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_v,
               FIRST_VALUE(CASE WHEN o.v IS NOT NULL THEN g.h END
                           IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_h
        FROM grid g LEFT JOIN hourly o ON g.user_id = o.user_id AND g.h = o.h
    )
    SELECT user_id, h AS hour_idx, observed,
           CAST(CASE
             WHEN observed THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v)
                 * (CAST(h - prev_h AS DOUBLE)
                    / CAST(next_h - prev_h AS DOUBLE))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v END AS DOUBLE) AS v_lin
    FROM joined ORDER BY user_id, hour_idx
    """,
)
def ts_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid densification with LINEAR interpolation: per-user
    hourly sums on an integer epoch-hour grid; each gap hour takes the
    time-weighted blend of its nearest observed anchors (flat fill at
    the series edges). The grid is row-local ``sequence`` expansion
    and both anchor scans are windows riding the ONE user-keyed
    shuffle — interpolation at 100 TB is exactly the forward-fill
    plan plus a mirrored window, not a join. Integer hour arithmetic
    keeps the blend fraction exact cross-engine."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 8)
        .select(
            "user_id",
            _floor_div_us("ts", 3600000000).alias("h"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    hourly = ev.groupBy("user_id", "h").agg(
        F.sum("v").cast("double").alias("v")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
        )
    )
    j = grid.join(hourly, ["user_id", "h"], "left").withColumn(
        "observed", F.col("v").isNotNull()
    )
    back = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_h = F.when(F.col("observed"), F.col("h"))
    j = (
        j.withColumn("prev_v", F.last("v", ignorenulls=True).over(back))
        .withColumn("prev_h", F.last(obs_h, ignorenulls=True).over(back))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("next_h", F.first(obs_h, ignorenulls=True).over(fwd))
    )
    frac = (F.col("h") - F.col("prev_h")).cast("double") / (
        F.col("next_h") - F.col("prev_h")
    ).cast("double")
    v_lin = (
        F.when(F.col("observed"), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
    )
    return j.select(
        "user_id",
        F.col("h").alias("hour_idx"),
        "observed",
        v_lin.cast("double").alias("v_lin"),
    ).orderBy("user_id", "hour_idx")


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, hour_idx, n,
               AVG(CAST(n AS DOUBLE)) OVER w AS mean24,
               STDDEV_SAMP(CAST(n AS DOUBLE)) OVER w AS std24,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_hist
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_idx, n, mean24, std24,
           CASE WHEN std24 > 0 THEN (CAST(n AS DOUBLE) - mean24) / std24
                END AS z,
           CAST(CASE WHEN n_hist >= 12 AND std24 > 0
                      AND abs((CAST(n AS DOUBLE) - mean24) / std24) > 3.0
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM scored ORDER BY event_type, hour_idx
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags on the hourly event-rate series
    per type: each hour scored against the trailing 24 hours
    (exclusive — the candidate must not contaminate its own
    baseline), flagged at |z|>3 with a 12-observation warm-up guard.
    The aggregate reduces map-side to one row per (type, hour) before
    the single type-keyed window shuffle — monitoring at 100 TB
    scores the REDUCED series, never the raw stream."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            _floor_div_us("ts", 3600000000).alias("hour_idx"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(-24, -1)
    )
    nd = F.col("n").cast("double")
    scored = hourly.select(
        "event_type",
        "hour_idx",
        "n",
        F.avg(nd).over(w).alias("mean24"),
        F.stddev_samp(nd).over(w).alias("std24"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_hist"),
    )
    z = F.when(
        F.col("std24") > 0, (nd - F.col("mean24")) / F.col("std24")
    )
    return scored.select(
        "event_type",
        "hour_idx",
        "n",
        "mean24",
        "std24",
        z.alias("z"),
        F.when(
            (F.col("n_hist") >= 12)
            & (F.col("std24") > 0)
            & (F.abs(z) > 3.0),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_anomaly"),
    ).orderBy("event_type", "hour_idx")


@query(
    "events_multitouch_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, epoch_us(ts) AS pus,
               CAST(value AS DECIMAL(18,2)) AS val
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS cid, user_id, epoch_us(ts) AS cus,
               CAST(extract(hour FROM ts) AS BIGINT) AS click_hour
        FROM events WHERE event_type = 'click'
    ),
    touches AS (
        SELECT p.pid, CAST(p.val AS DOUBLE) AS val, c.click_hour,
               exp(-CAST(p.pus - c.cus AS DOUBLE) / 1800000000.0) AS w
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.cus <= p.pus
                     AND c.cus > p.pus - 3600000000
    ),
    shares AS (
        SELECT click_hour,
               val * w / SUM(w) OVER (PARTITION BY pid) AS credit
        FROM touches
    )
    SELECT click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit) AS DOUBLE) AS credit_value
    FROM shares GROUP BY click_hour ORDER BY click_hour
    """,
)
def events_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-touch attribution with exponential time decay: each
    purchase's value splits across the same user's clicks in the
    preceding hour, weighted exp(−Δt/30 min) and normalized per
    purchase, then credited to the CLICK's hour-of-day — "which click
    times actually drive purchase value". The touch join is the
    bounded interval self-join (same shape as the as-of family); the
    per-purchase normalization is one window on the purchase key
    riding the join output. Decay weights divide within a purchase,
    so cross-engine float drift cancels in the shares."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.unix_micros("ts").alias("pus"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("val"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.unix_micros("ts").alias("cus"),
        F.hour("ts").cast("long").alias("click_hour"),
    )
    touches = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cus") <= F.col("pus"))
        & (F.col("cus") > F.col("pus") - 3600000000),
    ).select(
        "pid",
        "val",
        "click_hour",
        F.exp(-(F.col("pus") - F.col("cus")).cast("double") / 1800000000.0)
        .alias("w"),
    )
    from pyspark.sql import Window

    share = F.col("val") * F.col("w") / F.sum("w").over(
        Window.partitionBy("pid")
    )
    return (
        touches.select("click_hour", share.alias("credit"))
        .groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("credit").alias("credit_value"),
        )
        .orderBy("click_hour")
    )


@query(
    "ts_ema_smoothing",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               row_number() OVER w AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    scaled AS (
        SELECT user_id, value, rn, n_events,
               value * pow(2.0, rn) AS t,
               SUM(value * pow(2.0, rn)) OVER (
                   PARTITION BY user_id ORDER BY rn
                   ROWS UNBOUNDED PRECEDING
               ) AS big_t,
               FIRST_VALUE(value * pow(2.0, rn)) OVER (
                   PARTITION BY user_id ORDER BY rn
               ) AS t1
        FROM seq
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           value AS last_value,
           (big_t + t1) * pow(2.0, -rn - 1) AS ema_final
    FROM scaled WHERE rn = n_events
    ORDER BY user_id
    """,
)
def ts_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average per user (the exponential-smoothing
    member of the time-series family, next to gapfill/anomaly/OHLC):
    EMA_n = a*x_n + (1-a)*EMA_(n-1), seeded EMA_1 = x_1, a = 1/2.
    The sequential recurrence becomes ONE window pass via the scaling
    identity EMA_n = 2^(-n-1) * (T_n + t_1) with t_i = x_i * 2^i and
    T the running sum — and because a = 1/2, every scale factor is an
    exact power of two, so both engines' floating-point agrees term
    for term (the reason this is oracle-checkable at hash precision;
    an arbitrary alpha would drift in the last ulp). Emits each
    user's final smoothed level.

    Scale: one user-keyed window (hash-partitioned, no global sort);
    series length only enters as pow(2, n), safe to n ~ 1000 per
    partition — longer series re-seed per calendar window, same as
    any production EMA job."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wp = Window.partitionBy("user_id")
    staged = ev.select(
        "user_id",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_events"),
        (F.col("value") * F.pow(F.lit(2.0), F.row_number().over(wo)))
        .alias("t"),
    )
    wr = Window.partitionBy("user_id").orderBy("rn")
    wrs = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaled = staged.select(
        "user_id",
        "value",
        "rn",
        "n_events",
        F.sum("t").over(wrs).alias("big_t"),
        F.first("t").over(wr).alias("t1"),
    )
    return (
        scaled.filter(F.col("rn") == F.col("n_events"))
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value").alias("last_value"),
            (
                (F.col("big_t") + F.col("t1"))
                * F.pow(F.lit(2.0), -F.col("rn") - 1)
            ).alias("ema_final"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, AVG(CAST(n AS DOUBLE)) AS mu,
               stddev_pop(CAST(n AS DOUBLE)) AS sd
        FROM hourly GROUP BY event_type
    ),
    z AS (
        SELECT h.event_type, h.h,
               (h.n - s.mu) / s.sd - 0.5 AS zk
        FROM hourly h JOIN stats s ON h.event_type = s.event_type
        WHERE s.sd > 0
    ),
    cum AS (
        SELECT event_type, h,
               SUM(zk) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS c
        FROM z
    ),
    cusum AS (
        SELECT event_type, h, c,
               c - LEAST(0.0, MIN(c) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) AS s_plus
        FROM cum
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(MAX(s_plus), 6) AS max_cusum,
           CAST(MIN(CASE WHEN s_plus > 5.0 THEN h END) AS BIGINT)
             AS first_alarm_hour
    FROM cusum
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (Page 1954) on the hourly
    event-rate series per type — the sequential-monitoring companion
    of the rolling z-score: standardize each hour against the
    per-type baseline, subtract the slack k = 0.5, and track the
    one-sided cumulative-sum statistic. The textbook RECURSION
    S⁺_t = max(0, S⁺_{t−1} + z_t − k) looks inherently sequential,
    but the closed form S⁺_t = cum_t − min(0, min_{j≤t} cum_j) turns
    it into ONE running sum and ONE running min over the same
    type-keyed window — so the detector that seems to demand a
    stateful scan is two window expressions over the map-side-reduced
    series (the same 100 TB discipline as every monitor here: window
    the REDUCED table, never the stream). Alarm = first hour the
    statistic clears h = 5.

    Windows are evaluated in identical deterministic order by both
    engines, so the float chain (mean, stddev_pop, cumsum, min)
    agrees to well past the 6-decimal hash."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            _floor_div_us("ts", 3600000000).alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_pop(F.col("n").cast("double")).alias("sd"),
    )
    z = (
        hourly.join(F.broadcast(stats.filter(F.col("sd") > 0)), "event_type")
        .select(
            "event_type",
            "h",
            ((F.col("n") - F.col("mu")) / F.col("sd") - 0.5).alias("zk"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # INCLUSIVE frame: the closed form needs min over j ≤ t (with
    # the empty prefix's 0), else S⁺ dips negative where the
    # recursion clamps at 0
    w_min = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        z.withColumn("c", F.sum("zk").over(w_cum))
        .withColumn(
            "s_plus",
            F.col("c")
            - F.least(F.lit(0.0), F.min("c").over(w_min)),
        )
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.round(F.max("s_plus"), 6).alias("max_cusum"),
            F.min(F.when(F.col("s_plus") > 5.0, F.col("h")))
            .cast("long")
            .alias("first_alarm_hour"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_seasonal_baseline_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    keyed AS (
        SELECT event_type, h, n, h % 24 AS hod FROM hourly
    ),
    base AS (
        SELECT event_type, hod,
               AVG(CAST(n AS DOUBLE)) AS mu,
               stddev_pop(CAST(n AS DOUBLE)) AS sd,
               var_pop(CAST(n AS DOUBLE))
                 / NULLIF(AVG(CAST(n AS DOUBLE)), 0) AS dispersion
        FROM keyed GROUP BY event_type, hod
    )
    SELECT k.event_type, k.hod,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(MAX(b.mu), 6) AS seasonal_mu,
           ROUND(MAX(b.dispersion), 6) AS dispersion,
           CAST(SUM(CASE WHEN b.sd > 0
                     AND abs(k.n - b.mu) / b.sd > 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM keyed k JOIN base b
      ON k.event_type = b.event_type AND k.hod = b.hod
    GROUP BY k.event_type, k.hod
    ORDER BY k.event_type, k.hod
    """,
)
def ts_seasonal_baseline_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONALITY-AWARE anomaly baseline — the complement of the
    trailing-window z-score (which flags every rush hour as an
    anomaly when traffic is diurnal): each (type, hour-of-day) slot
    gets its own mean/σ baseline from the month, deviations score
    against the SLOT's distribution, and the per-slot DISPERSION
    (variance/mean — 1 for Poisson, ≫1 overdispersed) reports
    whether a count model is even appropriate before anyone
    thresholds on σ. Two aggregations over reduced frames (hourly
    series, then 24×|types| slots) — the monitoring discipline holds
    at any scale."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            _floor_div_us("ts", 3600000000).alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("hod", F.col("h") % 24)
    )
    base = hourly.groupBy("event_type", "hod").agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_pop(F.col("n").cast("double")).alias("sd"),
        (
            F.var_pop(F.col("n").cast("double"))
            / F.nullif(F.avg(F.col("n").cast("double")), F.lit(0))
        ).alias("dispersion"),
    )
    return (
        hourly.join(base, ["event_type", "hod"])
        .groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.round(F.max("mu"), 6).alias("seasonal_mu"),
            F.round(F.max("dispersion"), 6).alias("dispersion"),
            F.sum(
                F.when(
                    (F.col("sd") > 0)
                    & (
                        F.abs(F.col("n") - F.col("mu")) / F.col("sd")
                        > 3
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies"),
        )
        .orderBy("event_type", "hod")
    )


@query(
    "ts_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    split AS (
        SELECT *, extract(dow FROM d) AS dow,
               d >= DATE '2024-01-24' AS is_test
        FROM daily
    ),
    model AS (
        SELECT event_type, dow, AVG(CAST(n AS DOUBLE)) AS dow_mean
        FROM split WHERE NOT is_test GROUP BY event_type, dow
    )
    SELECT s.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(abs(s.n - m.dow_mean) / s.n), 6) AS mape,
           ROUND(AVG(s.n - m.dow_mean), 6) AS bias,
           ROUND(AVG(abs(s.n - m.dow_mean)), 6) AS mae
    FROM split s JOIN model m
      ON s.event_type = m.event_type AND s.dow = m.dow
    WHERE s.is_test
    GROUP BY s.event_type
    ORDER BY s.event_type
    """,
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTESTING — the evaluation loop every demand
    forecast lives inside: train a seasonal-naive model (weekday
    means) on the first ~3 weeks, forecast the final week, score
    MAPE / MAE / signed bias per series against actuals. The model
    is deliberately the naive baseline — the thing a real model must
    BEAT, so the backtest harness (time-based split, per-series
    scoring) is the durable artifact, not the model. Reduced daily
    frame, broadcast-sized model table, one scoring join — the
    backtest costs the same as the daily aggregation at any scale.
    Cross-engine pin includes the dow convention (both engines:
    0 = Sunday for this range via extract(dow))."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("dow", F.dayofweek("d") - 1)
        .withColumn(
            "is_test", F.col("d") >= F.lit("2024-01-24").cast("date")
        )
    )
    model = (
        daily.filter(~F.col("is_test"))
        .groupBy("event_type", "dow")
        .agg(F.avg(F.col("n").cast("double")).alias("dow_mean"))
    )
    err = F.col("n") - F.col("dow_mean")
    return (
        daily.filter(F.col("is_test"))
        .join(F.broadcast(model), ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.avg(F.abs(err) / F.col("n")), 6).alias("mape"),
            F.round(F.avg(err), 6).alias("bias"),
            F.round(F.avg(F.abs(err)), 6).alias("mae"),
        )
        .orderBy("event_type")
    )


@query(
    "survival_kaplan_meier",
    oracle="""
    WITH bounds AS (SELECT MAX(ts) AS tmax FROM events),
    per_user AS (
        SELECT e.user_id,
               MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS first_us,
               MIN(CASE WHEN e.event_type = 'purchase'
                   THEN epoch_us(CAST(e.ts AS TIMESTAMP)) END)
                 AS purch_us,
               MAX(epoch_us(CAST(b.tmax AS TIMESTAMP))) AS tmax_us
        FROM events e CROSS JOIN bounds b
        GROUP BY e.user_id
    ),
    obs AS (
        SELECT user_id,
               CASE WHEN purch_us IS NOT NULL
                    THEN (purch_us - first_us) // 86400000000
                    ELSE (tmax_us - first_us) // 86400000000
               END AS t_days,
               CAST(purch_us IS NOT NULL AS INT) AS is_event
        FROM per_user
    ),
    times AS (
        SELECT t_days,
               CAST(SUM(is_event) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS leaving
        FROM obs GROUP BY t_days
    ),
    risk AS (
        SELECT t_days, d, leaving,
               (SELECT COUNT(*) FROM obs) -
               COALESCE(SUM(leaving) OVER (
                   ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS n_risk
        FROM times
    ),
    km AS (
        SELECT t_days, d, n_risk,
               exp(SUM(CASE WHEN d > 0 AND d < n_risk
                       THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                       WHEN d > 0 THEN ln(1e-12)
                       ELSE 0 END) OVER (
                   ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) AS s
        FROM risk
    )
    SELECT CAST(t_days AS BIGINT) AS t_days, d,
           CAST(n_risk AS BIGINT) AS n_risk,
           ROUND(s, 6) AS km_survival
    FROM km
    ORDER BY t_days
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival estimation with right-censoring — the
    time-to-event family (conversion latency, churn, time-to-failure)
    none of the moment-based stats cover: each user's time from
    first activity to first purchase, censored at corpus end for
    never-purchasers (throwing censored users away — the naive
    mistake — biases survival DOWN; KM keeps them in the risk set
    until their censor time). The estimator's running product
    Π(1 − d/n) computes as exp of a running SUM of logs — the same
    window-algebra trick as the CUSUM closed form — over the reduced
    event-time table; the at-risk count is the complement of a
    lagged cumulative departure sum. Everything after the per-user
    reduction is |distinct times| rows. Day-0 purchases and the
    final-time d = n boundary (ln 0 → pinned epsilon, identical on
    both engines) are handled explicitly."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    tmax = ev.agg(F.max(F.unix_micros("ts")).alias("tmax_us"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase",
                    F.unix_micros("ts"),
                )
            ).alias("purch_us"),
        )
        .crossJoin(F.broadcast(tmax))
    )
    day = 86400000000
    obs = per_user.select(
        F.when(
            F.col("purch_us").isNotNull(),
            F.expr(f"(purch_us - first_us) div {day}"),
        )
        .otherwise(F.expr(f"(tmax_us - first_us) div {day}"))
        .alias("t_days"),
        F.col("purch_us").isNotNull().cast("int").alias("is_event"),
    )
    total = obs.count()
    times = obs.groupBy("t_days").agg(
        F.sum("is_event").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    w_prev = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = times.withColumn(
        "n_risk",
        F.lit(total)
        - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)),
    )
    term = (
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")),
        )
        .when(F.col("d") > 0, F.log(F.lit(1e-12)))
        .otherwise(F.lit(0.0))
    )
    return (
        risk.withColumn("s", F.exp(F.sum(term).over(w_cum)))
        .select(
            F.col("t_days").cast("long"),
            "d",
            "n_risk",
            F.round("s", 6).alias("km_survival"),
        )
        .orderBy("t_days")
    )


# ---------------------------------------------------------------------------
# Holt–Winters additive triple smoothing, per series
# ---------------------------------------------------------------------------

_HW_ALPHA = 0.3
_HW_BETA = 0.1
_HW_GAMMA = 0.2
_HW_M = 7  # weekly additive season
# 1-x precomputed ONCE in Python and repr()-embedded in the SQL so
# both engines use the bit-identical double constant (1.0 - 0.3 in
# double is NOT the same double as the literal 0.7)
_HW_OMA = 1.0 - _HW_ALPHA
_HW_OMB = 1.0 - _HW_BETA
_HW_OMG = 1.0 - _HW_GAMMA


def _hw_oracle(per_series: bool = False) -> str:
    m = _HW_M
    v = lambda i: f"v{i}"  # noqa: E731
    init_sum1 = " + ".join(v(i) for i in range(m))
    init_sum2 = " + ".join(v(i) for i in range(m, 2 * m))
    pivots = ", ".join(
        f"MAX(CASE WHEN t = {i} THEN y END) AS v{i}"
        for i in range(2 * m)
    )
    s_init = ", ".join(f"v{i} - l0 AS s{i}" for i in range(m))
    s_cur = (
        "CASE " + " ".join(
            f"WHEN (w.t % {m}) = {i} THEN w.s{i}" for i in range(m)
        ) + " END"
    )
    s_next = ", ".join(
        f"CASE WHEN (w.t % {m}) = {i} THEN "
        f"{_HW_GAMMA!r} * (d.y - ({_HW_ALPHA!r} * (d.y - ({s_cur})) "
        f"+ {_HW_OMA!r} * (w.l + w.b))) + {_HW_OMG!r} * w.s{i} "
        f"ELSE w.s{i} END AS s{i}"
        for i in range(m)
    )
    s_fin = (
        "CASE " + " ".join(
            f"WHEN (w.t % {m}) = {i} THEN w.s{i}" for i in range(m)
        ) + " END"
    )
    s_cols = ", ".join(f"s{i}" for i in range(m))
    return f"""
    WITH RECURSIVE base AS (
      SELECT c_nationkey AS nk,
             CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
               AS t,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(t) AS dmax FROM base),
    nkmx AS (SELECT nk, MAX(t) AS dmax FROM base GROUP BY nk),
    nks AS (SELECT DISTINCT nk FROM base),
    cal AS (SELECT CAST(unnest(range(0, (SELECT dmax + 1 FROM mx)))
                        AS BIGINT) AS t),
    grid AS (
      SELECT nks.nk, cal.t FROM nks CROSS JOIN cal __PSF__
    ),
    dense AS MATERIALIZED (
      SELECT g.nk, g.t, COALESCE(b.y, 0.0) AS y
      FROM grid g
      LEFT JOIN base b ON b.nk = g.nk AND b.t = g.t
    ),
    head AS (
      SELECT nk, {pivots} FROM dense WHERE t < {2 * m} GROUP BY nk
    ),
    init0 AS (
      SELECT nk, ({init_sum1}) / {float(m)!r} AS l0,
             (({init_sum2}) / {float(m)!r}
              - ({init_sum1}) / {float(m)!r}) / {float(m)!r} AS b0,
             {", ".join(f"v{i}" for i in range(m))}
      FROM head
    ),
    init AS (SELECT nk, l0, b0, {s_init} FROM init0),
    walk AS (
      SELECT nk, CAST({m} AS BIGINT) AS t, l0 AS l, b0 AS b,
             {s_cols}, CAST(0.0 AS DOUBLE) AS sse,
             CAST(0 AS BIGINT) AS n_err
      FROM init
      UNION ALL
      SELECT w.nk, w.t + 1,
             {_HW_ALPHA!r} * (d.y - ({s_cur}))
               + {_HW_OMA!r} * (w.l + w.b) AS l,
             {_HW_BETA!r} * (({_HW_ALPHA!r} * (d.y - ({s_cur}))
               + {_HW_OMA!r} * (w.l + w.b)) - w.l)
               + {_HW_OMB!r} * w.b AS b,
             {s_next},
             w.sse + (d.y - (w.l + w.b + ({s_cur})))
                   * (d.y - (w.l + w.b + ({s_cur}))) AS sse,
             w.n_err + 1
      FROM walk w JOIN dense d ON d.nk = w.nk AND d.t = w.t
    ),
    fin AS (
      SELECT w.* FROM walk w JOIN __FJ__
    )
    SELECT n.n_name, f.t AS n_days, f.l AS level, f.b AS trend,
           SQRT(f.sse / f.n_err) AS rmse,
           f.l + f.b + ({"CASE " + " ".join(
               f"WHEN (f.t % {m}) = {i} THEN f.s{i}" for i in range(m)
           ) + " END"}) AS forecast_next
    FROM fin f JOIN nation n ON f.nk = n.n_nationkey
    ORDER BY n.n_name
    """.replace(
        " __PSF__",
        (
            " JOIN nkmx ON nkmx.nk = nks.nk AND cal.t <= nkmx.dmax"
            if per_series
            else ""
        ),
    ).replace(
        "__FJ__",
        (
            "nkmx ON w.nk = nkmx.nk AND w.t = nkmx.dmax + 1"
            if per_series
            else "mx ON w.t = mx.dmax + 1"
        ),
    )


@query("ts_holt_winters_fit", oracle=_hw_oracle(), headline=True)
def ts_holt_winters_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters triple exponential smoothing (level +
    trend + weekly season) fitted per nation over the dense daily
    revenue series, with in-sample one-step-ahead RMSE and the h=1
    forecast — the classic operational forecaster one tier up from
    ts_ema_smoothing (level only) and ts_seasonal_baseline_anomaly
    (season only).

    Execution model: smoothing is sequential BY DEFINITION within a
    series, so each series runs as one ordered pandas loop inside
    applyInPandas — parallel ACROSS the thousands/millions of series
    a real deployment fits (here 25 nations), which is exactly the
    grouped-map contract. The oracle replays the identical recursion
    as a DuckDB recursive CTE; every smoothing coefficient (including
    each 1−x complement) is a shared repr()'d double literal, so the
    two engines walk bit-identical state and the final level/trend/
    RMSE hash-match after ~2400 sequential updates — a stringent
    float-determinism pin, not a tolerance check.

    Scale posture: the corpus collapses to (series, day) aggregates
    in one exchange; the dense-calendar fill is a broadcast cross
    join; per-series state is O(m). The only Python is the Arrow-
    batched per-series loop, amortized across series."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1995-01-01").cast("date"),
            )
            .cast("long")
            .alias("t"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
        # referenced THREE times below (dmax scan, distinct series, and
        # the dense-grid fill) — materialize the (series, day) rollup
        # once instead of re-running the orders⋈customer aggregate per
        # reference (guide §5: persist only what is reused AND
        # expensive to recompute; this is O(series × days), tiny next
        # to the corpus at any scale)
    )
    base = stage(base, "hw_series_day_rollup")
    mx = base.agg(F.max("t").alias("dmax"))
    nks = base.select("nk").distinct()
    cal = (
        nks.crossJoin(F.broadcast(mx))
        .select(
            "nk",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("dmax"))
            ).alias("t"),
        )
    )
    dense = cal.join(base, ["nk", "t"], "left").select(
        "nk", "t", F.coalesce(F.col("y"), F.lit(0.0)).alias("y")
    )

    m = _HW_M
    al, be, ga = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    oma, omb, omg = _HW_OMA, _HW_OMB, _HW_OMG

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y = pdf["y"].to_numpy()
        nk = int(pdf["nk"].iloc[0])
        acc1 = 0.0
        for i in range(m):
            acc1 = acc1 + float(y[i])
        acc2 = 0.0
        for i in range(m, 2 * m):
            acc2 = acc2 + float(y[i])
        l = acc1 / float(m)
        b = (acc2 / float(m) - acc1 / float(m)) / float(m)
        s = [float(y[i]) - l for i in range(m)]
        sse, n_err = 0.0, 0
        for t in range(m, len(y)):
            yt = float(y[t])
            shat = s[t % m]
            err = yt - (l + b + shat)
            l_new = al * (yt - shat) + oma * (l + b)
            b_new = be * (l_new - l) + omb * b
            s[t % m] = ga * (yt - l_new) + omg * shat
            sse = sse + err * err
            n_err += 1
            l, b = l_new, b_new
        t_fin = len(y)
        return pd.DataFrame(
            [
                {
                    "nk": nk,
                    "n_days": t_fin,
                    "level": l,
                    "trend": b,
                    "rmse": (sse / n_err) ** 0.5,
                    "forecast_next": l + b + s[t_fin % m],
                }
            ]
        )

    out = dense.groupBy("nk").applyInPandas(
        fit,
        "nk int, n_days long, level double, trend double, "
        "rmse double, forecast_next double",
    )
    # materialize the 25-row fit result before the name join + global
    # sort: the range exchange's sampling pass otherwise re-executes
    # the per-series pandas fit stage a second time
    out = stage(out, "hw_fit")
    return (
        out.join(
            F.broadcast(nation), out.nk == nation.n_nationkey
        )
        .select(
            "n_name", "n_days", "level", "trend", "rmse", "forecast_next"
        )
        .orderBy("n_name")
    )
