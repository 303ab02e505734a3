"""[R] reference-surface queries over the ``events`` table.

Each query mirrors a behavior the reference actually implements
(SURVEY.md §2.1), re-expressed on the driver's ``events`` fixture:
catalog build with first-seen dedup + schema inference (R2/R3), the
interactive filter→project→limit query (R4/R5/R6), multi-key sort with
the non-zero coalesce tie-break (R7/R11), enum decode with raw
fallback (R8), ragged-row conformance (R13), plus the JSON scalar
surface and the batch analogs of the streaming windows.

ns-precision note: ``events.ts`` is ns in parquet; Spark truncates to
µs on read while DuckDB keeps ns — so no query emits raw ``ts``;
they emit ``unix_micros``-style BIGINTs or second-truncated strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark import catalog as cat
from etl_lens_spark.functions.numeric import exact_sum
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.operators.staging import stage


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "r_catalog_build",
    oracle="""
    WITH ranked AS (
        SELECT event_type, epoch_us(ts) AS ts_us, event_id, props,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY epoch_us(ts), event_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_events,
               MIN(epoch_us(ts)) OVER (PARTITION BY event_type) AS first_ts_us
        FROM events
    )
    SELECT event_type, first_ts_us, event_id AS first_event_id,
           array_to_string(json_keys(props), ',') AS schema_keys, n_events
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
    headline=True,
)
def r_catalog_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1: startup catalog scan — one row per event type with the
    first-seen event and its inferred schema (JSON keys), reproducing
    the reference's first-record-wins catalog insert
    (``src/main.cpp:255-321``) deterministically via min_by over
    (ts, event_id).

    Single shuffle on event_type with map-side partial min_by/count;
    output cardinality = #types (tiny) at any scale.
    """
    ev = _events(spark, sf_dir)
    order_key = F.struct(F.unix_micros("ts").alias("us"), F.col("event_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_ts_us"),
            F.min_by("event_id", order_key).alias("first_event_id"),
            F.array_join(
                F.min_by(F.json_object_keys("props"), order_key), ","
            ).alias("schema_keys"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "r_filter_project_limit",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id,
           CAST(value AS DOUBLE) AS value,
           json_extract_string(props, '$.k') AS prop_k
    FROM events
    WHERE event_type = 'click'
    ORDER BY ts_us, event_id
    LIMIT 100
    """,
    headline=True,
)
def r_filter_project_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2: the reference's interactive query — equality filter on the
    catalog key, project/decode, LIMIT 100 with early-out
    (``src/main.cpp:399-401``, ``380-387``, ``1073``).

    The event_type predicate reaches the parquet scan (PushedFilters);
    the limit runs as TakeOrderedAndProject on the deterministic
    (ts, event_id) order.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "click")
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "value",
            F.get_json_object("props", "$.k").alias("prop_k"),
        )
        .orderBy("ts_us", "event_id")
        .limit(100)
    )


@query(
    "r_multikey_sort",
    oracle="""
    SELECT event_type, n_events, n_users, total_value
    FROM (
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type
    )
    ORDER BY n_users DESC, total_value ASC, event_type
    """,
)
def r_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: multi-key sort with per-column direction + deterministic
    trailing tie-break (``src/main.cpp:1169-1195``)."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum(F.col("value")).alias("total_value"),
    )
    return cat.multi_key_sort(
        agg,
        [("n_users", False), ("total_value", True)],
        tiebreak=["event_type"],
    )


@query(
    "r_enum_decode",
    oracle="""
    SELECT event_type,
           CASE event_type
               WHEN 'click' THEN 'UI interaction'
               WHEN 'view' THEN 'UI passive'
               WHEN 'purchase' THEN 'Commerce'
               ELSE event_type
           END AS event_type_decoded,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def r_enum_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: enum/map decode with raw-value fallback on miss — the
    reference's TdhGetEventMapInformation lookup with numeric fallback
    (``src/main.cpp:697-734``, ``796-803``). Literal-map lookup stays
    JVM-side; no join, no shuffle beyond the aggregation."""
    ev = _events(spark, sf_dir)
    mapping = {
        "click": "UI interaction",
        "view": "UI passive",
        "purchase": "Commerce",
    }
    decoded = cat.enum_decode(ev, "event_type", mapping, "event_type_decoded")
    return (
        decoded.groupBy("event_type", "event_type_decoded")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "r_first_seen_dedup",
    oracle="""
    SELECT event_type, user_id, event_id AS first_event_id, epoch_us(ts) AS ts_us
    FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1 AND user_id < 20
    ORDER BY event_type, user_id
    """,
)
def r_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 generalized: deterministic first-seen dedup on a composite
    key (catalog.first_seen) — the distributed, deterministic form of
    the reference's first-record-wins map insert
    (``src/main.cpp:256-259``)."""
    ev = _events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    first = cat.first_seen(
        ev, ["event_type", "user_id"], [F.col("ts_us"), F.col("event_id")]
    )
    return (
        first.filter(F.col("user_id") < 20)
        .select(
            "event_type",
            "user_id",
            F.col("event_id").alias("first_event_id"),
            "ts_us",
        )
        .orderBy("event_type", "user_id")
    )


@query(
    "r_ragged_conform",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k,
           json_extract_string(props, '$.missing_col') AS missing_col,
           CAST(NULL AS VARCHAR) AS padded_col
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
)
def r_ragged_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: ragged-row normalization — project the declared schema,
    padding absent properties with NULL and dropping extras
    (``src/main.cpp:1292-1303``)."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") < 200)
    extracted = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k"),
        F.get_json_object("props", "$.missing_col").alias("missing_col"),
    )
    conformed = cat.conform(
        extracted, ["event_id", "k", "missing_col", "padded_col"]
    )
    return conformed.withColumn(
        "padded_col", F.col("padded_col").cast("string")
    ).orderBy("event_id")


@query(
    "r_coalesce_nonzero_sort",
    oracle="""
    SELECT user_id, n_click, n_view,
           CASE WHEN n_click IS NOT NULL AND n_click <> 0 THEN n_click
                WHEN n_view IS NOT NULL AND n_view <> 0 THEN n_view
                ELSE 0 END AS tiebreak
    FROM (
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events
        WHERE user_id < 30
        GROUP BY user_id
    )
    ORDER BY tiebreak DESC, user_id
    """,
)
def r_coalesce_nonzero_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: the reference's variadic *non-zero* coalesce
    (``src/main.cpp:45-53``) used as a sort key, as in its catalog
    sort tie-break (``src/main.cpp:1191``)."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 30)
    agg = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
    )
    return (
        agg.withColumn(
            "tiebreak", cat.coalesce_nonzero(F.col("n_click"), F.col("n_view"))
        )
        .orderBy(F.col("tiebreak").desc(), F.col("user_id").asc())
    )


@query(
    "json_scalar_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid,
           array_to_string(json_keys(props), ',') AS keys
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
)
def json_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSON1 scalar surface (SQLite json_*, SURVEY §2.2) on Spark:
    get_json_object / from_json / json_object_keys — all JVM-side."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") < 100)
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_int"),
            F.when(
                F.from_json("props", "map<string,string>").isNotNull(), True
            )
            .otherwise(False)
            .alias("is_valid"),
            F.array_join(F.json_object_keys("props"), ",").alias("keys"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------
# Batch analogs of the streaming windows (EP2's stream nature:
# the trace IS a timestamped event stream, src/main.cpp:143).
# The live streaming versions live in etl_lens_spark.streaming and are
# tested against these batch semantics (DuckDB can't stream).
# --------------------------------------------------------------------


@query(
    "stream_tumbling_window_batch",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    headline=True,
)
def stream_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation — batch semantics of the
    Structured Streaming version (streaming.windowed_counts). Uses
    F.window, whose epoch-aligned 1h buckets equal date_trunc('hour').
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "stream_sessionization_batch",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    > 1800000000 OR LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM gaps
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sess
    WHERE user_id < 50
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_sessionization_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + cumulative-sum
    session ids — the batch equivalent of streaming
    ``session_window``. One shuffle on user_id; both window passes
    reuse the same partitioning (no second shuffle)."""
    ev = _events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sessions = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w_cum))
    return (
        sessions.filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "user_event_sequences",
    oracle="""
    SELECT user_id,
           array_to_string(
               (list(event_type ORDER BY epoch_us(ts), event_id))[1:64],
               ' ') AS seq,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-sequence corpus construction: each user's event
    types, time-ordered, joined into one training-ready token string
    — the standard sequence-modeling prep over an event log.

    Shape: ONE shuffle (groupBy user_id); ordering happens INSIDE the
    aggregate via array_sort over (ts, event_id) structs — no global
    sort, no window. The emitted sequence is capped at 64 tokens
    (slice) so hot users cannot produce unbounded strings at 100 TB;
    the untruncated count is carried alongside. Ties in ts are broken
    by the unique event_id in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("us", "event_id", "event_type")
                            )
                        ),
                        lambda x: x.event_type,
                    ),
                    1,
                    64,
                ),
                " ",
            ).alias("seq"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "events_match_recognize_vshape",
    headline=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
               row_number() OVER w AS rn,
               CASE WHEN value > lag(value) OVER w THEN 1
                    WHEN value < lag(value) OVER w THEN -1
                    WHEN lag(value) OVER w IS NULL THEN NULL
                    ELSE 0 END AS s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    isl AS (
        SELECT user_id, rn, ts_us, value, s,
               rn - row_number()
                    OVER (PARTITION BY user_id, s ORDER BY rn) AS grp
        FROM seq WHERE s IN (-1, 1)
    ),
    runs AS (
        SELECT user_id, s, grp, MIN(rn) AS rn0, MAX(rn) AS rn1,
               COUNT(*) AS len
        FROM isl GROUP BY user_id, s, grp
    )
    SELECT d.user_id, ps.ts_us AS strt_us, pe.ts_us AS end_us,
           CAST(d.len AS BIGINT) AS n_down, CAST(u.len AS BIGINT) AS n_up,
           ps.value AS peak_value, pb.value AS bottom_value,
           pe.value AS end_value
    FROM runs d
    JOIN runs u ON u.user_id = d.user_id AND u.rn0 = d.rn1 + 1
               AND u.s = 1 AND u.len >= 2
    JOIN seq ps ON ps.user_id = d.user_id AND ps.rn = d.rn0 - 1
    JOIN seq pb ON pb.user_id = d.user_id AND pb.rn = d.rn1
    JOIN seq pe ON pe.user_id = d.user_id AND pe.rn = u.rn1
    WHERE d.s = -1 AND d.len >= 2
    ORDER BY d.user_id, strt_us
    """,
)
def events_match_recognize_vshape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MATCH_RECOGNIZE analog (operators/patterns.py): the SQL:2016
    ticker V-shape — ``PATTERN (STRT DOWN{2,} UP{2,})`` per user over
    the value series, greedy, AFTER MATCH SKIP PAST LAST ROW, a flat
    step breaks the run. The Spark side runs the generic NFA operator
    (one shuffle on user_id, vectorized labeling, O(n) walk); the
    oracle derives the SAME matches relationally (sign islands +
    adjacent-run pairing) — two independent formulations of the
    pattern semantics hash-matched. The reference has no CEP surface;
    this is [N] event-analytics coverage."""
    import pandas as pd

    from etl_lens_spark.operators.patterns import Step, match_pattern

    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )

    def classify(pdf: pd.DataFrame) -> pd.Series:
        d = pdf["value"].diff()
        return pd.Series(
            ["D" if x < 0 else "U" if x > 0 else None for x in d],
            index=pdf.index,
            dtype=object,
        )

    def measures(pdf: pd.DataFrame, spans) -> dict:
        (d0, d1), (u0, u1) = spans
        return {
            "strt_us": int(pdf["ts_us"].iloc[d0 - 1]),
            "end_us": int(pdf["ts_us"].iloc[u1 - 1]),
            "n_down": d1 - d0,
            "n_up": u1 - u0,
            "peak_value": float(pdf["value"].iloc[d0 - 1]),
            "bottom_value": float(pdf["value"].iloc[d1 - 1]),
            "end_value": float(pdf["value"].iloc[u1 - 1]),
        }

    matches = match_pattern(
        ev,
        key_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        classify=classify,
        steps=[Step("D", 2, None), Step("U", 2, None)],
        measures=measures,
        output_schema=(
            "user_id long, strt_us long, end_us long, n_down long, "
            "n_up long, peak_value double, bottom_value double, "
            "end_value double"
        ),
        n_buckets=64,
    )
    # materialize the match set before the global sort: the range
    # exchange's sampling pass otherwise re-executes the whole
    # FlatMapGroupsInPandas stage a second time (measured 2.34 s →
    # 0.99 s at sf0.1; guide §2.4 — one pass, not two)
    return stage(matches, "vshape_matches").orderBy(
        "user_id", "strt_us"
    )


@query(
    "events_pattern_error_burst",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS rn
        FROM events
    ),
    err AS (
        SELECT user_id, rn, ts_us,
               rn - row_number()
                    OVER (PARTITION BY user_id ORDER BY rn) AS grp
        FROM seq WHERE event_type = 'error'
    ),
    runs AS (
        SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_errors
        FROM err GROUP BY user_id, grp
    )
    SELECT user_id, start_us, end_us, n_errors
    FROM runs WHERE n_errors >= 3
    ORDER BY user_id, start_us
    """,
)
def events_pattern_error_burst(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Error-burst detection with the same generic pattern operator:
    ``PATTERN (E{3,})`` where E = consecutive 'error' rows in the
    user's full event stream (any other event type breaks the run).
    Greedy matching makes every match a MAXIMAL burst, so the islands
    oracle (gaps-and-islands on the filtered rows) is exactly
    equivalent. Alert-shaped output: burst bounds + size."""
    import pandas as pd

    from etl_lens_spark.operators.patterns import Step, match_pattern

    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )

    def classify(pdf: pd.DataFrame) -> pd.Series:
        return pdf["event_type"].map(
            lambda t: "E" if t == "error" else None
        )

    def measures(pdf: pd.DataFrame, spans) -> dict:
        ((e0, e1),) = spans
        return {
            "start_us": int(pdf["ts_us"].iloc[e0]),
            "end_us": int(pdf["ts_us"].iloc[e1 - 1]),
            "n_errors": e1 - e0,
        }

    return match_pattern(
        ev,
        key_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        classify=classify,
        steps=[Step("E", 3, None)],
        measures=measures,
        output_schema=(
            "user_id long, start_us long, end_us long, n_errors long"
        ),
        n_buckets=64,
    ).orderBy("user_id", "start_us")


@query(
    "user_next_event_entropy",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
               ) AS nxt
        FROM events
    ),
    bi AS (
        SELECT user_id, cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY user_id, cur, nxt
    ),
    ctx AS (
        SELECT user_id, cur, SUM(c) AS ctot FROM bi
        GROUP BY user_id, cur
    ),
    h AS (
        SELECT b.user_id,
               SUM(-1.0 * b.c
                   * ln(CAST(b.c AS DOUBLE) / x.ctot)) AS hsum,
               SUM(b.c) AS n_trans
        FROM bi b JOIN ctx x
          ON b.user_id = x.user_id AND b.cur = x.cur
        GROUP BY b.user_id
    )
    SELECT user_id,
           CAST(n_trans AS BIGINT) AS n_transitions,
           ROUND(hsum / n_trans, 6) AS cond_entropy_nats
    FROM h
    WHERE user_id < 40
    ORDER BY user_id
    """,
)
def user_next_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral PREDICTABILITY per user — the conditional entropy
    H(next | current) of each user's event sequence (the first-order
    Markov entropy rate): a habitual user scores near 0, an erratic
    one near ln(|types|); the metric that separates bots (rigid
    loops) from explorers in the same activity volume. Transitions
    from one ordered window pass (deterministic event_id tie-break),
    bigram and context counts reduce map-side, and the entropy is a
    weighted log-ratio sum — all over frames bounded by
    |users| × |types|². The oracle replays the identical chain."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("cur"),
        )
        .withColumn("nxt", F.lead("cur").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    bi = seq.groupBy("user_id", "cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ctx = bi.groupBy("user_id", "cur").agg(F.sum("c").alias("ctot"))
    h = (
        bi.join(ctx, ["user_id", "cur"])
        .groupBy("user_id")
        .agg(
            F.sum(
                -1.0
                * F.col("c")
                * F.log(F.col("c").cast("double") / F.col("ctot"))
            ).alias("hsum"),
            F.sum("c").cast("long").alias("n_trans"),
        )
    )
    return (
        h.filter(F.col("user_id") < 40)
        .select(
            "user_id",
            F.col("n_trans").alias("n_transitions"),
            F.round(F.col("hsum") / F.col("n_trans"), 6).alias(
                "cond_entropy_nats"
            ),
        )
        .orderBy("user_id")
    )
