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
