"""Coverage queries: [R] decode scalars (GUID/FILETIME/hex), the
UDF surface (pandas UDAF, applyInPandas), array/map functions,
percentiles, grouping sets, and the remaining TPC-H-style shapes
(Q13 distribution, Q18 big-order filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.functions import scalar as sc
from etl_lens_spark.functions import udf_surface as us
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


# --------------------------------------------------------------------
# [R] decode scalars
# --------------------------------------------------------------------


@query(
    "r_guid_filetime_decode",
    oracle="""
    SELECT event_id,
           concat_ws('-',
               substr(md5(CAST(event_id AS VARCHAR)), 1, 8),
               substr(md5(CAST(event_id AS VARCHAR)), 9, 4),
               substr(md5(CAST(event_id AS VARCHAR)), 13, 4),
               substr(md5(CAST(event_id AS VARCHAR)), 17, 4),
               substr(md5(CAST(event_id AS VARCHAR)), 21, 12)) AS guid,
           (epoch_us(ts) + 11644473600000000) * 10 AS filetime_ticks,
           epoch_us(ts) AS roundtrip_us,
           '0x' || lpad(lower(hex(event_id)), 16, '0') AS event_id_hex
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
)
def r_guid_filetime_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[R] decode-layer scalars (functions.scalar): GUID formatting
    (``src/main.cpp:329-337``), FILETIME tick round-trip
    (``src/main.cpp:143``), HEXINT display (``215-217``). The GUID
    bytes are derived from md5 so the oracle can build the identical
    16 bytes."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    guid_bytes = F.unhex(F.md5(F.col("event_id").cast("string")))
    ticks = sc.timestamp_to_filetime(F.col("ts"))
    return (
        ev.select(
            "event_id",
            sc.guid_str(guid_bytes).alias("guid"),
            ticks.alias("filetime_ticks"),
            F.unix_micros(sc.filetime_to_timestamp(ticks)).alias("roundtrip_us"),
            sc.hexint(F.col("event_id"), 16).alias("event_id_hex"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------
# UDF surface
# --------------------------------------------------------------------


@query(
    "udaf_weighted_mean",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(p_retailprice * p_size) / SUM(CAST(p_size AS DOUBLE)) AS DOUBLE)
               AS weighted_price
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (UDAF surface,
    ``sqlite3_create_function`` analog): size-weighted mean retail
    price per brand, Arrow-batched per group."""
    p = load_table(spark, sf_dir, "part")
    # pandas UDAFs can't mix with JVM aggregates in one agg — run the
    # two aggregations on the same shuffle key and broadcast-join the
    # (tiny) results
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts"))
    weighted = p.groupBy("p_brand").agg(
        us.weighted_mean_udaf(
            F.col("p_retailprice"), F.col("p_size").cast("double")
        ).alias("weighted_price")
    )
    return (
        counts.join(F.broadcast(weighted), "p_brand")
        .select("p_brand", "n_parts", "weighted_price")
        .orderBy("p_brand")
    )


@query(
    "udf_per_user_trend",
    oracle="""
    WITH base AS (
        SELECT user_id, value,
               (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
                   / 3600000000.0 AS x
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_points,
           CAST(regr_slope(value, x) AS DOUBLE) AS slope_per_hour
    FROM base
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def udf_per_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map UDF): per-user OLS slope of value
    over time, vs DuckDB's regr_slope on identically re-centered x."""
    ev = load_table(spark, sf_dir, "events")
    return us.per_user_trend(ev).orderBy("user_id")


@query("udf_per_user_zscore")
def udf_per_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas row-preserving normalization (rows-only: float
    std accumulation order differs from SQL's; semantics asserted in
    tests/test_udf.py against a window-function equivalent)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return us.per_user_zscore(ev).orderBy("user_id", "event_id")


# --------------------------------------------------------------------
# Array / map functions ([L] JSON1/array analog surface)
# --------------------------------------------------------------------


@query(
    "array_functions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS words
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           len(words) AS n_words,
           CAST(len(list_filter(words, w -> length(w) > 5)) AS BIGINT) AS n_long_words,
           array_to_string(list_sort(list_distinct(list_transform(words, w -> lower(w))))[1:3], ',') AS first3_sorted,
           array_to_string(words[1:3], '_') AS first3_joined,
           CAST(list_contains(words, 'data') AS BOOLEAN) AS has_data
    FROM toks
    ORDER BY doc_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface: transform/filter/sort/distinct/slice/
    contains/join — all JVM-side (the Spark analog of SQLite's JSON1
    array ops, SURVEY §2.2)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.split(F.col("text"), " ")
    return (
        docs.select(
            "doc_id",
            F.size(words).cast("long").alias("n_words"),
            F.size(F.filter(words, lambda w: F.length(w) > 5))
            .cast("long")
            .alias("n_long_words"),
            F.array_join(
                F.slice(
                    F.array_sort(F.array_distinct(F.transform(words, F.lower))),
                    1,
                    3,
                ),
                ",",
            ).alias("first3_sorted"),
            F.array_join(F.slice(words, 1, 3), "_").alias("first3_joined"),
            F.array_contains(words, "data").alias("has_data"),
        )
        .orderBy("doc_id")
    )


@query(
    "percentiles_exact",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS median_price,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQLite has none; Spark's
    ``percentile`` matches DuckDB's quantile_cont definition). At
    100 TB you'd switch to ``percentile_approx`` (t-digest, mergeable,
    single pass) — kept exact here because the oracle must match."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (beyond rollup/cube)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus
        """
    )


# --------------------------------------------------------------------
# Remaining TPC-H-style shapes
# --------------------------------------------------------------------


@query(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: two-level aggregation over a left outer join
    (count(col) skips nulls — customers with no orders count 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    headline=True,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: IN-subquery on an aggregate feeding a star
    join + top-k.

    ONE lineitem pass (round 12; was two): the classic shape
    re-joins lineitem against the qualifying orderkeys and
    re-aggregates, but the final group (c_custkey, c_name,
    o_orderkey, o_totalprice) is per-ORDER — o_orderkey and
    c_custkey are keys — so the re-aggregated sum is exactly the
    subquery's ``__q``. Algebraically identical (decimal sums are
    exact, so grouping order cannot move the value; inner joins drop
    the same rows either way), oracle-hash-verified. The surviving
    plan is the partial-aggregated (l_orderkey, qty) shuffle, the
    selective filter, and broadcast joins — the fact table crosses
    the wire once as ~16 bytes/row of partial aggregates (guide
    §2.3/§2.4)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("__q"))
        .filter(F.col("__q") > 120)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("__q").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           printf('%s:%04d', p_brand, p_size) AS brand_tag,
           chr(65 + (p_size % 26)) AS size_letter,
           CAST(unicode(p_name) AS BIGINT) AS first_cp,
           substring(p_name, -5, 3) AS tail_slice,
           translate(p_brand, '#', '_') AS brand_us,
           repeat('*', p_size % 5) AS stars,
           left(p_type, 3) AS type3,
           right(p_name, 4) AS name_tail,
           md5(p_name) AS name_md5
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second tranche of the SQLite scalar string library (printf,
    char, unicode, negative-index substr, translate, repeat,
    left/right, md5) — every one a JVM builtin with identical
    semantics to the DuckDB oracle (probed: negative substr counts
    from the end in both; printf is C-style in both)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return (
        p.select(
            "p_partkey",
            F.format_string(
                "%s:%04d", F.col("p_brand"), F.col("p_size")
            ).alias("brand_tag"),
            F.expr("char(65 + (p_size % 26))").alias("size_letter"),
            F.ascii("p_name").cast("long").alias("first_cp"),
            F.substring("p_name", -5, 3).alias("tail_slice"),
            F.translate(F.col("p_brand"), "#", "_").alias("brand_us"),
            F.expr("repeat('*', p_size % 5)").alias("stars"),
            F.expr("left(p_type, 3)").alias("type3"),
            F.expr("right(p_name, 4)").alias("name_tail"),
            F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(julian(o_orderdate) AS DOUBLE) AS jd,
           strftime(o_orderdate, '%Y-%m-%d %H:%M') AS stamp,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(week(o_orderdate) AS BIGINT) AS iso_week,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           monthname(o_orderdate) AS mon_name
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite date-function tranche 2: julianday (computed
    arithmetically from epoch micros — DuckDB's julian() is the
    standard JDN + 0.5, midnight-aligned; probed), strftime via
    date_format, Sunday-0 weekday, ISO week, quarter, last_day,
    month name."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return (
        o.select(
            "o_orderkey",
            (
                F.unix_micros(
                    F.col("o_orderdate").cast("timestamp")
                ) / 86_400_000_000.0 + 2440588.0
            ).alias("jd"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm").alias("stamp"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sun0"),
            F.dayofyear("o_orderdate").cast("long").alias("doy"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.last_day("o_orderdate").alias("month_end"),
            F.date_format("o_orderdate", "MMMM").alias("mon_name"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "map_functions",
    oracle="""
    WITH m AS (
        SELECT event_id,
               MAP{'type': event_type,
                   'vbucket': CAST(value >= 50 AS VARCHAR)} AS m
        FROM events
    )
    SELECT event_id,
           to_json(m)::VARCHAR AS m_json,
           to_json(map_keys(m))::VARCHAR AS keys_json,
           to_json(map_values(m))::VARCHAR AS vals_json,
           to_json(map_entries(m))::VARCHAR AS entries_json,
           m['type'][1] AS type_val,
           list_contains(map_keys(m), 'vbucket') AS has_vbucket,
           CAST(cardinality(m) AS BIGINT) AS n_keys,
           to_json(map_concat(m, MAP{'src': 'ev'}))::VARCHAR AS concat_json,
           to_json(map_from_entries(
               list_filter(map_entries(m), e -> e.key != 'vbucket')
           ))::VARCHAR AS filtered_json
    FROM m
    ORDER BY event_id
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar surface (create/keys/values/entries/element_at/
    contains/size/concat/filter), serialized with to_json at the
    output boundary per the driver-canonicalizer contract — Spark and
    DuckDB agree on JSON map formatting byte-for-byte (probed:
    insertion-order keys, {"k":v} shape)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("vbucket"), (F.col("value") >= 50).cast("string"),
    )
    return (
        ev.select("event_id", m.alias("m"))
        .select(
            "event_id",
            F.to_json("m").alias("m_json"),
            F.to_json(F.map_keys("m")).alias("keys_json"),
            F.to_json(F.map_values("m")).alias("vals_json"),
            F.to_json(F.map_entries("m")).alias("entries_json"),
            F.element_at("m", F.lit("type")).alias("type_val"),
            F.map_contains_key("m", F.lit("vbucket")).alias("has_vbucket"),
            F.size("m").cast("long").alias("n_keys"),
            F.to_json(
                F.map_concat("m", F.create_map(F.lit("src"), F.lit("ev")))
            ).alias("concat_json"),
            F.to_json(
                F.map_filter("m", lambda k, v: k != F.lit("vbucket"))
            ).alias("filtered_json"),
        )
        .orderBy("event_id")
    )


@query(
    "bitwise_functions",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS band,
           bit_or(user_id) AS bor,
           bit_xor(user_id) AS bxor,
           CAST(SUM(CAST(bit_count(user_id) AS BIGINT)) AS BIGINT)
               AS popcount_sum,
           CAST(MIN(user_id << 3) AS BIGINT) AS min_shl,
           CAST(MAX(user_id >> 2) AS BIGINT) AS max_shr,
           CAST(SUM(user_id & 255) AS BIGINT) AS low_byte_sum,
           CAST(MIN(~user_id) AS BIGINT) AS min_not
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface (SQLite dialect &,|,<<,>>,~
    plus bit_count and the bit_and/or/xor aggregates), all JVM
    expressions inside one partial+final agg."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and(u).alias("band"),
            F.bit_or(u).alias("bor"),
            F.bit_xor(u).alias("bxor"),
            F.sum(F.bit_count(u).cast("long")).cast("long").alias(
                "popcount_sum"
            ),
            F.min(F.shiftleft(u, 3)).cast("long").alias("min_shl"),
            F.max(F.shiftright(u, 2)).cast("long").alias("max_shr"),
            F.sum(u.bitwiseAND(F.lit(255))).cast("long").alias("low_byte_sum"),
            F.min(F.bitwise_not(u)).cast("long").alias("min_not"),
        )
        .orderBy("event_type")
    )


@query(
    "sql_text_entrypoint",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_text_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual SQL entry path (SURVEY §2.2's [L] surface as a
    user actually drives it): tables register as temp views and the
    query is a literal SQL string through spark.sql — same Catalyst
    plan as the DataFrame form, proving both front doors reach the
    same engine."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_view"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders_view
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query("sketch_hll_mergeable")
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg/hll_union_agg): per-(event_type, day) sketches
    union into per-type totals WITHOUT rescanning events — the 100 TB
    pattern where daily pre-aggregates merge into any rollup. Rows
    only (sketch estimates are approximate by design); the error
    bound vs exact distinct is asserted in tests/test_udf.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("approx_users"),
            F.count(F.lit(1)).cast("long").alias("n_days_merged"),
        )
        .orderBy("event_type")
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY n_orders DESC, o_custkey
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter customers via count-min sketch prefilter
    (operators/cms.py). The sketch (one scan, bounded shuffle) flags
    candidate keys whose ESTIMATE clears the threshold; only the
    survivors — a tiny set — are re-counted exactly with a
    semi-joined groupBy. CMS never underestimates, so no true heavy
    hitter is lost and the composition is EXACTLY `GROUP BY ...
    HAVING count >= T` (the oracle checks that identity), while at
    100 TB the exact pass aggregates only rows whose key survived
    the sketch instead of every key.

    The estimate-error and merge-exactness properties are asserted
    separately in tests/test_cms.py."""
    from etl_lens_spark.config import cms_params
    from etl_lens_spark.operators.cms import cms_estimate, cms_sketch

    depth, width = cms_params(spark)
    threshold = 15
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    sketch = cms_sketch(o, "o_custkey", depth=depth, width=width)
    candidates = cms_estimate(
        sketch, o.distinct(), "o_custkey", depth=depth, width=width
    ).filter(F.col("est") >= threshold)
    return (
        o.join(F.broadcast(candidates.select("o_custkey")), "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= threshold)
        .orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
    )


@query(
    "csv_permissive_parse",
    oracle="""
    WITH lines AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN ''
               WHEN 1 THEN doc_id || ',' || (doc_id * 7) % 1000 || ',ok'
               WHEN 2 THEN doc_id || ',abc,ok'
               WHEN 3 THEN CAST(doc_id AS VARCHAR)
               ELSE doc_id || ',' || (doc_id * 7) % 1000 || ',ok,EXTRA'
             END AS line
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE CAST(doc_id AS INT) END AS a,
           CASE WHEN doc_id % 5 IN (1, 4)
                THEN CAST((doc_id * 7) % 1000 AS INT)
                ELSE NULL END AS b,
           CASE WHEN doc_id % 5 IN (1, 2, 4) THEN 'ok'
                ELSE NULL END AS c,
           CAST(CASE WHEN doc_id % 5 IN (2, 3, 4) THEN 1 ELSE 0 END
                AS BIGINT) AS is_corrupt,
           CASE WHEN doc_id % 5 IN (2, 3, 4) THEN line
                ELSE NULL END AS corrupt_record
    FROM lines
    ORDER BY doc_id
    """,
)
def csv_permissive_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data robustness surface: PERMISSIVE CSV parsing with
    corrupt-record capture (the lake-ingest contract for untrusted
    feeds). Synthesized lines cover the five malformation classes —
    clean, type error, short row, long row, empty — and the declared
    output pins Spark's exact PERMISSIVE semantics (probed, not
    assumed): parseable fields survive alongside a populated
    _corrupt_record; short AND long rows count as corrupt; empty
    lines are all-NULL but NOT corrupt. The oracle mirrors those
    rules as CASE logic, so a Spark behavior change (or a wrong
    assumption about it) fails the hash. JVM-side from_csv — zero
    Python, fully pushdown-compatible at any scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    good = F.concat_ws(
        ",",
        F.col("doc_id").cast("string"),
        (F.col("doc_id") * 7 % 1000).cast("string"),
        F.lit("ok"),
    )
    line = (
        F.when(m == 0, F.lit(""))
        .when(m == 1, good)
        .when(m == 2, F.concat_ws(",", F.col("doc_id").cast("string"), F.lit("abc"), F.lit("ok")))
        .when(m == 3, F.col("doc_id").cast("string"))
        .otherwise(F.concat(good, F.lit(",EXTRA")))
    )
    parsed = docs.select(
        "doc_id",
        line.alias("line"),
        F.from_csv(
            line,
            "a INT, b INT, c STRING, _c STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_c"},
        ).alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
        F.col("p.c").alias("c"),
        F.col("p._c").isNotNull().cast("long").alias("is_corrupt"),
        F.col("p._c").alias("corrupt_record"),
    ).orderBy("doc_id")


@query(
    "json_permissive_parse",
    oracle="""
    WITH lines AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN '{"k": ' || doc_id || ', "s": "ok"}'
               WHEN 1 THEN '{"k": "oops", "s": "ok"}'
               WHEN 2 THEN '{broken'
               WHEN 3 THEN '{"s": "ok"}'
               ELSE ''
             END AS j
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id AS INT)
                ELSE NULL END AS k,
           CASE WHEN doc_id % 5 IN (0, 1, 3) THEN 'ok'
                ELSE NULL END AS s,
           CAST(CASE WHEN doc_id % 5 IN (1, 2) THEN 1 ELSE 0 END
                AS BIGINT) AS is_corrupt,
           CASE WHEN doc_id % 5 IN (1, 2) THEN j ELSE NULL END
             AS corrupt_record
    FROM lines
    ORDER BY doc_id
    """,
)
def json_permissive_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON parsing with corrupt-record capture — the
    companion to csv_permissive_parse for semi-structured feeds.
    Pins Spark's probed from_json semantics: type mismatch keeps the
    other fields AND marks corrupt; syntax errors null everything and
    mark corrupt; a MISSING field and an empty string are NULL but
    NOT corrupt. The oracle mirrors these rules as CASE logic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 5
    j = (
        F.when(
            m == 0,
            F.concat(
                F.lit('{"k": '), F.col("doc_id").cast("string"), F.lit(', "s": "ok"}')
            ),
        )
        .when(m == 1, F.lit('{"k": "oops", "s": "ok"}'))
        .when(m == 2, F.lit("{broken"))
        .when(m == 3, F.lit('{"s": "ok"}'))
        .otherwise(F.lit(""))
    )
    parsed = docs.select(
        "doc_id",
        F.from_json(
            j,
            "k INT, s STRING, _c STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_c"},
        ).alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.k").alias("k"),
        F.col("p.s").alias("s"),
        F.col("p._c").isNotNull().cast("long").alias("is_corrupt"),
        F.col("p._c").alias("corrupt_record"),
    ).orderBy("doc_id")


@query(
    "scalar_encoding_funcs",
    oracle="""
    SELECT event_id,
           base64(encode(event_type)) AS b64,
           upper(to_hex(event_id)) AS hx,
           ascii(event_type) AS first_code,
           chr(65 + CAST(event_id % 26 AS INTEGER)) AS letter,
           CAST(octet_length(encode(props)) AS BIGINT) AS n_bytes
    FROM events WHERE event_id < 200 ORDER BY event_id
    """,
)
def scalar_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding scalar surface: base64, hex, ascii code, chr
    construction, octet length — the SQLite-compatible encode/decode
    helpers (hex()/char()/unicode(), sqlite3.h function registry)
    completing the dialect's string-to-bytes corner. All pure
    codegen'd JVM expressions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.base64(F.col("event_type").cast("binary")).alias("b64"),
        F.hex(F.col("event_id")).alias("hx"),
        F.ascii("event_type").alias("first_code"),
        F.char(F.lit(65) + (F.col("event_id") % 26)).alias("letter"),
        F.octet_length("props").cast("long").alias("n_bytes"),
    ).orderBy("event_id")


@query(
    "agg_filter_funcs",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000)
                AS BIGINT) AS n_big,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) FILTER (WHERE o_orderstatus = 'F')
                AS BIGINT) AS cents_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'P') AS any_pending
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_filter_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/boolean aggregate surface — SQL-standard FILTER-clause
    semantics (count_if, conditional sum, bool_and/bool_or), the
    everyone-uses-daily corner of the aggregate dialect. All algebraic
    with map-side partials; the filter predicates evaluate before the
    exchange so the wire carries one partial row per group."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("o_totalprice") > 100000)
            .cast("long")
            .alias("n_big"),
            F.sum(F.when(F.col("o_orderstatus") == "F", cents))
            .cast("long")
            .alias("cents_finished"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "percentiles_disc",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_disc(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT), 0.25) AS BIGINT)
             AS p25_c,
           CAST(quantile_disc(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT), 0.5) AS BIGINT)
             AS p50_c,
           CAST(quantile_disc(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT), 0.75) AS BIGINT)
             AS p75_c
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (an actually-occurring value, not an
    interpolation — PERCENTILE_DISC semantics, the other half of the
    percentile dialect next to percentiles_exact's PERCENTILE_CONT).
    Exact integer cents in, exact integer cents out: the selected
    element is the same row in both engines, no float anywhere.
    Spark's ``median``/``percentile`` interpolate, so DISC is built
    from the group-local sorted array (groups are modest; at 100 TB
    per-key DISC uses approx_percentile, which is already
    nearest-rank)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    arr = F.array_sort(F.collect_list("cents"))

    def disc(q: float):
        # nearest-rank (PERCENTILE_DISC): smallest v with CDF(v) >= q
        idx = F.ceil(F.size(arr) * F.lit(q)).cast("int")
        return F.element_at(arr, F.greatest(idx, F.lit(1)))

    return (
        o.groupBy("o_orderpriority")
        .agg(
            disc(0.25).alias("p25_c"),
            disc(0.5).alias("p50_c"),
            disc(0.75).alias("p75_c"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "win_ratio_to_report",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation, r.r_name AS region,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    )
    SELECT region, nation, rev_c,
           CAST(rev_c AS DOUBLE)
             / SUM(rev_c) OVER (PARTITION BY region) AS share_in_region,
           CAST(rev_c AS DOUBLE) / SUM(rev_c) OVER () AS share_global,
           CAST(SUM(rev_c) OVER (PARTITION BY region
                                 ORDER BY rev_c DESC, nation
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS running_c
    FROM rev ORDER BY region, rev_c DESC, nation
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT semantics: each nation's revenue share within
    its region and globally, plus the region running total — the
    share-of-total reporting window. The fact stream reduces to one
    exact-cents row per nation BEFORE any window (25 rows); shares
    divide exact longs so both engines agree bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("rev_c")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    w_run = (
        Window.partitionBy("region")
        .orderBy(F.desc("rev_c"), F.asc("nation"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        "region",
        "nation",
        "rev_c",
        (F.col("rev_c").cast("double") / F.sum("rev_c").over(w_region)).alias(
            "share_in_region"
        ),
        (F.col("rev_c").cast("double") / F.sum("rev_c").over(w_all)).alias(
            "share_global"
        ),
        F.sum("rev_c").over(w_run).alias("running_c"),
    ).orderBy("region", F.desc("rev_c"), "nation")


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    r AS (
        SELECT pri, status, n,
               ROW_NUMBER() OVER (PARTITION BY pri
                                  ORDER BY n DESC, status ASC) AS rn
        FROM c
    )
    SELECT pri, status AS modal_status, n AS modal_n FROM r
    WHERE rn = 1 ORDER BY pri
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE with a pinned tie-break (max count, then min
    value) — engines' built-in ``mode()`` leaves ties unspecified, so
    the portable form is the explicit count-table argmax both engines
    run here: one map-side-combined groupBy to the (group, value)
    count table, then a window over ≤ groups×values rows."""
    c = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("pri").orderBy(F.desc("n"), F.asc("status"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "pri", F.col("status").alias("modal_status"),
            F.col("n").alias("modal_n"),
        )
        .orderBy("pri")
    )


@query(
    "source_synthetic_range",
    oracle="""
    WITH g AS (
        SELECT CAST(range AS BIGINT) AS id,
               ('0x' || substring(md5('syn' || CAST(range AS VARCHAR)),
                                  1, 8))::BIGINT AS h
        FROM range(0, 100000)
    )
    SELECT h % 16 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS id_sum,
           CAST(SUM(h) AS BIGINT) AS hash_sum,
           MIN(h) AS h_min, MAX(h) AS h_max
    FROM g GROUP BY 1 ORDER BY bucket
    """,
)
def source_synthetic_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator source: ``spark.range`` — the table-valued generator
    every engine ships (DuckDB ``range()``, SQLite ``generate_series``)
    and the backbone of synthetic benchmarks and spine builds. 100k
    rows are produced IN PARALLEL across partitions (no file, no scan)
    with md5-derived payloads; the per-bucket checksums prove both
    engines generated the identical relation. At any scale the range
    source splits like a file scan — it's how you fabricate a
    petabyte of test data without storing one."""
    g = spark.range(0, 100000).select(
        F.col("id"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("syn"), F.col("id").cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    return (
        g.groupBy((F.col("h") % 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("id").cast("long").alias("id_sum"),
            F.sum("h").cast("long").alias("hash_sum"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
        )
        .orderBy("bucket")
    )


@query(
    "udf_arrow_map",
    oracle="""
    SELECT event_id,
           CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents,
           upper(event_type) AS type_u,
           CAST(length(event_type) AS BIGINT) AS type_len
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy member of the Python UDF API
    matrix (alongside pandas_udf / applyInPandas / mapInPandas /
    UDTF / applyInPandasWithState): batches arrive as raw Arrow
    RecordBatches and are transformed with vectorized
    ``pyarrow.compute`` kernels, no pandas materialization at all.
    The right tool when the Python stage is itself Arrow-native
    (feature stores, Arrow Flight hops, model inference on Arrow)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def transform(batches):
        for b in batches:
            value = pc.cast(b.column("value"), pa.float64())
            cents = pc.cast(
                pc.round(
                    pc.multiply(value, pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            t = b.column("event_type")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("event_id"),
                    cents,
                    pc.utf8_upper(t),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                ],
                names=["event_id", "cents", "type_u", "type_len"],
            )

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select("event_id", "value", "event_type").mapInArrow(
        transform, "event_id long, cents long, type_u string, type_len long"
    ).orderBy("event_id")


@query(
    "json_variant_funcs",
    oracle="""
    WITH j AS (
        SELECT event_id,
               '{"k":' || CAST(event_id % 97 AS VARCHAR)
                 || ',"arr":[3,' || CAST(event_id % 7 AS VARCHAR)
                 || '],"tag":"t' || CAST(event_id % 3 AS VARCHAR)
                 || '"}' AS doc
        FROM events WHERE event_id < 300
    )
    SELECT event_id,
           CAST(json_extract(doc, '$.k') AS BIGINT) AS k,
           CAST(json_extract(doc, '$.arr[1]') AS BIGINT) AS arr1,
           CAST(json_extract_string(doc, '$.tag') AS VARCHAR) AS tag,
           CAST(json_array_length(doc, '$.arr') AS BIGINT) AS arr_len
    FROM j ORDER BY event_id
    """,
)
def json_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT — Spark 4's binary semi-structured type (the modern
    replacement for string-JSON hot paths): documents parse ONCE into
    the variant encoding, then ``variant_get`` path extractions are
    typed and allocation-free (order-of-magnitude over repeated
    ``get_json_object`` string parsing at 100 TB). The oracle runs
    the same paths through DuckDB's JSON extraction on the identical
    documents."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    doc = F.concat(
        F.lit('{"k":'),
        (F.col("event_id") % 97).cast("string"),
        F.lit(',"arr":[3,'),
        (F.col("event_id") % 7).cast("string"),
        F.lit('],"tag":"t'),
        (F.col("event_id") % 3).cast("string"),
        F.lit('"}'),
    )
    v = ev.select("event_id", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.expr("cast(variant_get(v, '$.k', 'long') as long)").alias("k"),
        F.expr("cast(variant_get(v, '$.arr[1]', 'long') as long)").alias(
            "arr1"
        ),
        F.expr("variant_get(v, '$.tag', 'string')").alias("tag"),
        F.expr(
            "cast(array_size(cast(variant_get(v, '$.arr') as array<variant>))"
            " as long)"
        ).alias("arr_len"),
    ).orderBy("event_id")


@query(
    "source_python_datasource",
    oracle="""
    WITH g AS (
        SELECT CAST(range AS BIGINT) AS rid,
               ('0x' || substring(md5('pyds' || CAST(range AS VARCHAR)),
                                  1, 8))::BIGINT AS h
        FROM range(0, 10000)
    )
    SELECT h % 5 AS category,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(rid) AS BIGINT) AS rid_sum,
           CAST(SUM(h) AS BIGINT) AS h_sum,
           CAST(AVG(CAST(h % 1000 AS DOUBLE) / 100.0) AS DOUBLE)
             AS mean_score
    FROM g GROUP BY 1 ORDER BY category
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined Python DataSource (Spark 4
    ``pyspark.sql.datasource``) — the loadable-virtual-table analog of
    SQLite's module API (``sqlite3.h:7586``): a registered format name
    whose reader declares its own PARTITIONS, each generating a row
    slice executor-side in parallel. The per-category checksums prove
    the partition/read plumbing delivered exactly the declared
    relation (DuckDB recomputes it from the same md5 formula)."""
    from etl_lens_spark.sources.pyds import SynthEventsDataSource

    try:
        spark.dataSource.register(SynthEventsDataSource)
    except Exception:
        pass  # already registered in this session
    g = (
        spark.read.format("synth_events")
        .option("n_rows", 10000)
        .option("n_parts", 8)
        .load()
    )
    return (
        g.groupBy(F.col("category"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rid").cast("long").alias("rid_sum"),
            F.sum("h").cast("long").alias("h_sum"),
            F.avg("score").alias("mean_score"),
        )
        .orderBy("category")
    )


@query(
    "udtf_table_arg_partitioned",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def udtf_table_arg_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF with a TABLE argument and PARTITION BY
    (Spark 4): ``SELECT * FROM user_span(TABLE(v) PARTITION BY
    user_id)`` streams each partition's rows through eval() and emits
    the summary from terminate() — the table-valued-function
    composition SQLite exposes through virtual tables and the one
    UDTF form that shards like an aggregate (one partition per key,
    state local to the executor)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id long, n long, span_us long")
    class UserSpan:
        def __init__(self):
            self.n = 0
            self.lo = None
            self.hi = None
            self.uid = None

        def eval(self, row):
            self.n += 1
            self.uid = row["user_id"]
            us = row["us"]
            self.lo = us if self.lo is None else min(self.lo, us)
            self.hi = us if self.hi is None else max(self.hi, us)

        def terminate(self):
            if self.n:
                yield (self.uid, self.n, self.hi - self.lo)

    spark.udtf.register("user_span", UserSpan)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    ev.createOrReplaceTempView("udtf_events_v")
    return spark.sql(
        "SELECT * FROM user_span(TABLE(udtf_events_v) PARTITION BY user_id) "
        "ORDER BY user_id"
    )


@query(
    "scalar_timezone_funcs",
    oracle="""
    SELECT event_id,
           CAST(extract(hour FROM timezone('America/New_York',
                        timezone('UTC', ts))) AS BIGINT) AS hour_ny,
           CAST(timezone('Asia/Tokyo', timezone('UTC', ts)) AS DATE)
             AS date_tokyo,
           CAST(extract(minute FROM timezone('Asia/Kolkata',
                        timezone('UTC', ts))) AS BIGINT) AS minute_kolkata
    FROM events WHERE event_id < 300 ORDER BY event_id
    """,
)
def scalar_timezone_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-timezone rendering: the same UTC instant viewed on the
    New York / Tokyo / Kolkata wall clocks (Kolkata's +5:30 exercises
    a non-whole-hour offset via the minute field). Spark's
    ``from_utc_timestamp`` against DuckDB's two-step ``timezone()``
    re-interpretation — both resolve through the IANA tzdb, so
    agreement here pins the zone arithmetic, not just the format."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    wall = lambda tz: F.from_utc_timestamp(F.col("ts"), tz)  # noqa: E731
    return ev.select(
        "event_id",
        F.hour(wall("America/New_York")).cast("long").alias("hour_ny"),
        wall("Asia/Tokyo").cast("date").alias("date_tokyo"),
        F.minute(wall("Asia/Kolkata")).cast("long").alias("minute_kolkata"),
    ).orderBy("event_id")


@query(
    "obs_metrics_observe",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents_sum,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished
    FROM orders
    """,
)
def obs_metrics_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe`` — Spark's zero-cost pipeline-metrics API:
    named aggregates piggyback on an action's existing pass (NO extra
    scan, unlike running a second COUNT query) and surface on the
    driver — how a production job self-reports row counts and
    checksums for the data-quality ledger. The observed metrics are
    returned as the result and must equal the oracle's direct
    aggregate."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cents).cast("long").alias("cents_sum"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias(
            "n_finished"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["cents_sum"], m["n_finished"])],
        "n_rows long, cents_sum long, n_finished long",
    )


@query(
    "udf_arrow_grouped",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents,
           CAST(MAX(length(props)) AS BIGINT) AS max_props_len
    FROM events WHERE event_id < 2000
    GROUP BY event_type ORDER BY event_type
    """,
)
def udf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` — the GROUPED zero-copy member of the Python
    UDF matrix (completing it alongside mapInArrow / pandas_udf /
    applyInPandas / mapInPandas / UDTF / applyInPandasWithState):
    each group arrives as one Arrow Table and is reduced with
    vectorized ``pyarrow.compute`` kernels, no pandas
    materialization. Cents are summed as int64 AFTER a decimal-exact
    scale (round half-away like the decimal cast), so the Arrow-side
    arithmetic matches the oracle's DECIMAL semantics bit-for-bit.
    Scale shape: one hash exchange on the group key, Arrow batches
    end-to-end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def reduce_group(tbl: pa.Table) -> pa.Table:
        value = pc.cast(tbl.column("value"), pa.float64())
        cents = pc.cast(
            pc.round(
                pc.multiply(value, pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {
                "event_type": [tbl.column("event_type")[0].as_py()],
                "n": [tbl.num_rows],
                "cents": [pc.sum(cents).as_py()],
                "max_props_len": [
                    pc.max(pc.utf8_length(tbl.column("props"))).as_py()
                ],
            }
        )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_type", "value", "props")
    )
    return (
        ev.groupBy("event_type")
        .applyInArrow(
            reduce_group,
            "event_type string, n long, cents long, max_props_len long",
        )
        .orderBy("event_type")
    )


@query(
    "dialect_modern_sugar",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
    FROM (SELECT * EXCLUDE (o_orderkey, o_custkey, o_orderdate) FROM orders)
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def dialect_modern_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern-SQL sugar corners through the textual front door:
    ``SELECT * EXCEPT(...)`` projection (DuckDB spells it EXCLUDE),
    ``GROUP BY ALL`` (group on every non-aggregate select item), and
    ``ORDER BY ALL`` (sort by every output column left-to-right) —
    all parsed by Spark 4's ANSI dialect, desugaring to the same
    Catalyst plan the explicit forms produce."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_sugar_view"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) AS cents
        FROM (SELECT * EXCEPT (o_orderkey, o_custkey, o_orderdate)
              FROM orders_sugar_view)
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT o_orderpriority AS priority,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_orderkey) AS keys_asc,
           string_agg(CAST(o_orderkey AS VARCHAR), '|'
                      ORDER BY o_orderkey DESC) AS keys_desc,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey < 500
    GROUP BY 1 ORDER BY 1
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate dialect corner: SQL:2016 ``LISTAGG ...
    WITHIN GROUP (ORDER BY ...)`` (Spark 4 syntax) vs DuckDB's
    ``string_agg(... ORDER BY ...)`` — same ordered concatenation
    semantics through two different grammars, both directions (asc
    and desc with different delimiters). Deterministic because the
    order key is the unique order key. Completes the sqlite-compat
    GROUP_CONCAT row with the ORDERED variant the reference's SQLite
    3.44+ grammar also accepts."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_la"
    )
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               listagg(CAST(o_orderkey AS STRING), ',')
                   WITHIN GROUP (ORDER BY o_orderkey) AS keys_asc,
               listagg(CAST(o_orderkey AS STRING), '|')
                   WITHIN GROUP (ORDER BY o_orderkey DESC) AS keys_desc,
               COUNT(*) AS n
        FROM orders_la WHERE o_orderkey < 500
        GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "dialect_collations",
    oracle="""
    WITH m AS (
        SELECT c_mktsegment AS seg,
               CASE WHEN c_custkey % 2 = 0
                    THEN c_mktsegment
                    ELSE lower(c_mktsegment) END AS mixed
        FROM customer
    )
    SELECT lower(mixed) AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_raw_spellings,
           CAST(COUNT(DISTINCT lower(mixed)) AS BIGINT)
             AS n_collated_spellings
    FROM m
    GROUP BY lower(mixed)
    ORDER BY k
    """,
)
def dialect_collations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-aware comparison (Spark 4's collation engine —
    ``collate(col, 'UTF8_LCASE')`` makes equality, GROUP BY, and
    MIN/MAX case-insensitive AT THE COMPARATOR level, not by
    normalizing the data): a mixed-case segment column is grouped
    case-insensitively while still counting the raw spellings it
    covers; COUNT(DISTINCT) under the collated comparator collapses
    the case variants (2 raw spellings → 1 collated) and is
    cross-checked against DuckDB's relational equivalent
    COUNT(DISTINCT lower(x)) (DuckDB's own COLLATE applies to
    comparisons but not DISTINCT) — a deterministic witness of the
    comparator, unlike collated MIN/MAX, whose result
    among EQUAL-comparing spellings is legitimately engine-chosen
    (tried first; the two engines picked different representatives,
    which is correct behavior on both sides). The group key is
    emitted through lower() so display forms agree while the
    distinct-aggregation itself runs on the collation."""
    m = load_table(spark, sf_dir, "customer").select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.col("c_mktsegment")
        )
        .otherwise(F.lower("c_mktsegment"))
        .alias("mixed")
    )
    coll = F.collate(F.col("mixed"), "UTF8_LCASE")
    return (
        m.groupBy(F.lower("mixed").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("mixed").cast("long").alias(
                "n_raw_spellings"
            ),
            F.countDistinct(coll).cast("long").alias(
                "n_collated_spellings"
            ),
        )
        .orderBy("k")
    )


@query(
    "udf_cogrouped_reconcile",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS net
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           COALESCE(li.n_lines, 0) AS n_lines,
           CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,2))
                - COALESCE(li.net, 0), 2) AS DOUBLE) AS price_delta,
           CAST(li.l_orderkey IS NULL AS BIGINT) AS orphan_order
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    WHERE o.o_orderkey < 2000
    ORDER BY o.o_orderkey
    """,
)
def udf_cogrouped_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED pandas map — the last member of the pandas API
    matrix (pandas_udf / applyInPandas / mapInPandas / mapInArrow /
    UDTF / applyInPandasWithState / and now
    ``cogroup(...).applyInPandas``): orders and their lineitems are
    co-partitioned by order key and handed to ONE Python function as
    two aligned pandas frames per key group — the reconciliation
    shape (header vs detail) that in pure SQL is a join+groupBy, but
    as a cogroup gives the function BOTH sides' full rows at once
    (needed when the per-key logic is genuinely procedural:
    versioned diffs, order-book replay, schema-divergent sides).
    Here the per-key work is the header-vs-sum-of-details price
    delta in exact cents arithmetic, so the DuckDB join+groupBy
    oracle pins the cogroup path bit-for-bit.

    Scale: cogroup = one co-partitioning shuffle of both sides on
    the key (identical cost to the equivalent join), Arrow-batched
    into Python; the function sees one key group at a time, memory
    bounded by the largest order."""
    import pandas as pd

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    def reconcile(key, o_pdf: pd.DataFrame, l_pdf: pd.DataFrame):
        if not len(o_pdf):
            return pd.DataFrame(
                columns=[
                    "o_orderkey",
                    "n_lines",
                    "price_delta",
                    "orphan_order",
                ]
            )
        # exact cents arithmetic (ints), like the decimal oracle
        total_c = round(float(o_pdf["o_totalprice"].iloc[0]) * 100)
        net_c = 0
        for p, d in zip(l_pdf["l_extendedprice"], l_pdf["l_discount"]):
            p_c = round(float(p) * 100)
            d_c = round(float(d) * 100)
            net_c += p_c * (100 - d_c)
        n_lines = len(l_pdf)
        delta_c = total_c * 100 - net_c  # both in 1e-4 units
        # half-AWAY-FROM-ZERO to 2 decimals in pure ints — Python's
        # round() is banker's and disagrees with the decimal oracle
        # on exact half-cents
        q, r = divmod(abs(delta_c), 100)
        cents = q + (1 if r >= 50 else 0)
        cents = cents if delta_c >= 0 else -cents
        return pd.DataFrame(
            {
                "o_orderkey": [int(key[0])],
                "n_lines": [n_lines],
                "price_delta": [cents / 100.0],
                "orphan_order": [1 if n_lines == 0 else 0],
            }
        )

    out = (
        orders.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, n_lines long, price_delta double, "
            "orphan_order long",
        )
    )
    return out.orderBy("o_orderkey")


@query(
    "udtf_polymorphic_schema",
    oracle="""
    WITH t AS (
        SELECT l_orderkey * 100000 + l_linenumber AS line_id,
               l_quantity, l_extendedprice, l_discount
        FROM lineitem WHERE l_orderkey < 200
    )
    SELECT line_id,
           ROUND(l_quantity / (l_quantity + l_extendedprice
                 + l_discount), 6) AS share_l_quantity,
           ROUND(l_extendedprice / (l_quantity + l_extendedprice
                 + l_discount), 6) AS share_l_extendedprice,
           ROUND(l_discount / (l_quantity + l_extendedprice
                 + l_discount), 6) AS share_l_discount
    FROM t ORDER BY line_id
    """,
)
def udtf_polymorphic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC UDTF via the static ``analyze()`` hook — the
    member of the UDTF surface where the OUTPUT SCHEMA is computed
    at PLAN TIME from the input table's schema (Spark 3.5+): the
    function receives ``AnalyzeArgument.dataType``, derives one
    ``share_<col>`` column per numeric input column, and returns an
    ``AnalyzeResult`` — so the same function unpivot-normalizes ANY
    table without a declared returnType, the true table-valued-
    function polymorphism SQLite exposes through virtual-table
    xBestIndex/xConnect (reference analog: the bundled SQLite's
    virtual tables, third_party/sqlite3). Row-local row-share
    computation; the oracle writes the schema out statically, so a
    drift in analyze()'s derivation breaks schema_match, not just
    values."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class RowShare:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            fields = [StructField("line_id", LongType())]
            for f in t.dataType.fields:
                if f.name == "line_id":
                    continue
                fields.append(
                    StructField(f"share_{f.name}", DoubleType())
                )
            return AnalyzeResult(schema=StructType(fields))

        def eval(self, row):
            d = row.asDict()
            key = d.pop("line_id")
            tot = sum(float(v) for v in d.values())
            yield (
                key,
                *[
                    round(float(v) / tot, 6) if tot else None
                    for v in d.values()
                ],
            )

    spark.udtf.register("row_share_poly", udtf(RowShare))
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            (F.col("l_orderkey") * 100000 + F.col("l_linenumber"))
            .alias("line_id"),
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
    )
    li.createOrReplaceTempView("udtf_poly_v")
    return spark.sql(
        "SELECT * FROM row_share_poly(TABLE(udtf_poly_v)) "
        "ORDER BY line_id"
    )


@query(
    "dialect_join_hints",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def dialect_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface ([L] dialect corner): the same
    customer⋈nation rollup driven through BOTH hint front doors —
    the SQL comment syntax (``SELECT /*+ BROADCAST(n) */``) and the
    DataFrame ``.hint("broadcast")`` — unioned as two halves whose
    per-half results must be identical (the oracle sees each nation
    twice if and only if both paths computed the same rollup, so the
    final re-aggregation halves them back; a divergence would double
    nothing and fail the hash). Hints change STRATEGY, never results
    — that identity is exactly what this pins. The plan-level effect
    (both halves run BroadcastHashJoin with no exchange on the fact
    side) is asserted in tests/test_plan_shapes.py.

    At 100 TB this is the surface a user reaches for when AQE's
    stats-driven choice needs an override — a dimension known to be
    small but with stale stats, or a fact-fact join that must stay
    shuffle-hash to avoid a sort."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    c.createOrReplaceTempView("hint_customer")
    n.createOrReplaceTempView("hint_nation")
    sql_half = spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n.n_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_acctbal
        FROM hint_customer c
        JOIN hint_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    df_half = (
        c.join(n.hint("broadcast"), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )
    both = sql_half.unionByName(df_half)
    # both halves must agree exactly: min == max per nation, and the
    # count halves back to the single-path value
    return (
        both.groupBy("n_name")
        .agg(
            (F.sum("n_customers") / 2).cast("long").alias("n_customers"),
            (F.min("total_acctbal")).alias("total_acctbal"),
            F.max("total_acctbal").alias("_max_tab"),
        )
        .filter(F.col("total_acctbal") == F.col("_max_tab"))
        .drop("_max_tab")
        .orderBy("n_name")
    )


@query(
    "xml_scalar_funcs",
    oracle="""
    SELECT doc_id,
           doc_id AS a,
           (doc_id * 7) % 1000 AS b,
           'tag' || CAST(doc_id % 5 AS VARCHAR) AS c,
           TRUE AS roundtrip_ok
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def xml_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar XML surface ([L] dialect corner, the expression-level
    twin of sink_xml_roundtrip): ``from_xml`` parses a synthesized
    XML fragment per row into a typed struct, and ``to_xml`` →
    ``from_xml`` round-trips that struct — the identity is proven
    IN-QUERY (roundtrip_ok compares every field) because DuckDB has
    no XML functions to mirror; the oracle instead recomputes the
    expected parsed values from the same arithmetic that synthesized
    the fragment, so a parser regression fails the hash and a
    round-trip regression fails the TRUE column. Pure JVM
    expressions — the same codegen discipline as the json/variant
    corners."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    xml = F.concat(
        F.lit("<r><a>"),
        F.col("doc_id"),
        F.lit("</a><b>"),
        (F.col("doc_id") * 7) % 1000,
        F.lit("</b><c>tag"),
        F.col("doc_id") % 5,
        F.lit("</c></r>"),
    )
    ddl = "a BIGINT, b BIGINT, c STRING"
    parsed = F.from_xml(xml, ddl)
    base = docs.select("doc_id", parsed.alias("p"))
    rt = F.from_xml(F.to_xml(F.col("p")), ddl)
    return base.select(
        "doc_id",
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
        F.col("p.c").alias("c"),
        (
            (rt["a"] == F.col("p.a"))
            & (rt["b"] == F.col("p.b"))
            & (rt["c"] == F.col("p.c"))
        ).alias("roundtrip_ok"),
    ).orderBy("doc_id")


@query(
    "dialect_sql_scripting",
    oracle="""
    WITH tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_mod3_total
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           t.n_mod3_total
    FROM orders o CROSS JOIN tot t
    GROUP BY o.o_orderpriority, t.n_mod3_total
    ORDER BY o.o_orderpriority
    """,
)
def dialect_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING ([L] dialect corner, SQL/PSM subset Spark 4
    ships): BEGIN/END block with DECLAREd variables and a WHILE loop
    that accumulates a monthly count via repeated SET — procedural
    control flow running INSIDE the engine, the front door a
    stored-procedure migration lands on. The loop's accumulated
    total must equal the oracle's one-shot aggregate (12 monthly
    slices sum to the whole-year count — the script is checked
    against set-based truth, not against itself), carried alongside
    a per-priority rollup in the script's final SELECT.

    Scale note: each loop iteration is a full declarative query —
    Catalyst optimizes every iteration like any other plan, so
    scripting costs orchestration only, not execution model."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "script_orders"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE m INT DEFAULT 1;
          DECLARE tot BIGINT DEFAULT 0;
          WHILE m <= 12 DO
            SET tot = tot + (
              SELECT COUNT(*) FROM script_orders
              WHERE MONTH(o_orderdate) = m AND o_orderkey % 3 = 0
            );
            SET m = m + 1;
          END WHILE;
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 tot AS n_mod3_total
          FROM script_orders
          GROUP BY o_orderpriority, tot
          ORDER BY o_orderpriority;
        END
        """
    )


@query(
    "dialect_parameterized_sql",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) * 2 AS n_doubled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 250000.00
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def dialect_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL front doors ([L] dialect corner): the same
    filtered rollup driven through (1) a NAMED-PARAMETER query
    (``:thr`` bound server-side — the injection-safe path every SQL
    API client should use), (2) ``EXECUTE IMMEDIATE`` with a USING
    clause (dynamic SQL, the stored-procedure idiom), both with a
    LATERAL COLUMN ALIAS (``n_orders`` reused in ``n_doubled`` in
    the same select list — Spark-4 sugar older engines spell with a
    subquery). The two halves are unioned and re-aggregated with a
    min==max guard exactly like dialect_join_hints, so the oracle
    hash fails if the two parameter front doors ever disagree."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "param_orders"
    )
    body = """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               n_orders * 2 AS n_doubled,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM param_orders
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) > :thr
        GROUP BY o_orderstatus
    """
    named = spark.sql(body, args={"thr": 250000.00})
    exec_imm = spark.sql(
        "EXECUTE IMMEDIATE :stmt USING 250000.00 AS thr",
        args={"stmt": body.replace(":thr", "?")},
    )
    both = named.unionByName(exec_imm)
    return (
        both.groupBy("o_orderstatus")
        .agg(
            (F.sum("n_orders") / 2).cast("long").alias("n_orders"),
            (F.sum("n_doubled") / 2).cast("long").alias("n_doubled"),
            F.min("total_price").alias("total_price"),
            F.max("total_price").alias("_mx"),
        )
        .filter(F.col("total_price") == F.col("_mx"))
        .drop("_mx")
        .orderBy("o_orderstatus")
    )


@query(
    "dialect_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1.00 - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(38,4))) AS DOUBLE) AS disc_revenue
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def dialect_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-DEFINED functions ([L] surface: the declarative analog of
    SQLite's ``sqlite3_create_function``, which the reference's
    bundled SQLite exposes at `third_party/sqlite3/sqlite3.h` —
    here no host-language callback is needed): a scalar SQL UDF
    (``CREATE TEMPORARY FUNCTION ... RETURNS DOUBLE RETURN expr``)
    computing the discounted price in exact decimal, and a SQL TABLE
    function (``RETURNS TABLE ... RETURN SELECT``) acting as a
    parameterized view over the fact table. Both are pure SQL bodies
    — Catalyst INLINES them into the calling plan (no black-box
    function boundary, full pushdown/codegen), which is exactly why
    this beats a Python UDF for anything expressible as SQL.

    The quantity threshold flows through the table function's
    parameter; the scalar function applies per row inside the
    aggregate. Oracle = the same algebra inlined by hand."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "udf_lineitem"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price_dec(
            p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(38,4)
        RETURN CAST(CAST(p AS DECIMAL(18,2))
                    * (1.00 - CAST(d AS DECIMAL(18,2)))
                    AS DECIMAL(38,4))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION big_lines(min_qty INT)
        RETURNS TABLE(
            l_returnflag STRING, l_extendedprice DOUBLE,
            l_discount DOUBLE)
        RETURN SELECT l_returnflag, l_extendedprice, l_discount
               FROM udf_lineitem WHERE l_quantity >= min_qty
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(disc_price_dec(l_extendedprice, l_discount))
                    AS DOUBLE) AS disc_revenue
        FROM big_lines(25)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "dialect_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    ORDER BY o_orderpriority
    """,
)
def dialect_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax ([L] dialect corner, Spark 4's ZetaSQL-style
    ``|>`` operators): the same filtered rollup written as a linear
    pipeline — FROM |> WHERE |> AGGREGATE..GROUP BY |> WHERE (the
    pipe spelling of HAVING) |> ORDER BY — the query shape reads in
    execution order instead of inside-out. Same Catalyst plan as the
    classic spelling; the oracle is that classic spelling, so the
    two front doors are proven equivalent."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pipe_orders"
    )
    return spark.sql(
        """
        FROM pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS total_price
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "sketch_approx_topk",
    oracle="""
    SELECT o_orderpriority AS item,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY cnt DESC, item
    """,
)
def sketch_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in frequency sketch (``approx_top_k``, Spark 4.1) over
    order priorities — the engine-native heavy-hitters counterpart
    to the hand-built CMS prefilter (cms_heavy_hitters): ONE
    partial-aggregating pass, mergeable sketch state. With
    maxItemsTracked (10k) far above the 5-value domain the sketch
    degenerates to exact counts — which is what makes it
    oracle-checkable (same saturating-accuracy discipline as the GK
    quantile twins); the declared result re-sorts the sketch output
    by (count desc, item) so the engine's internal tie order never
    reaches the hash."""
    o = load_table(spark, sf_dir, "orders")
    sk = o.agg(
        F.expr("approx_top_k(o_orderpriority, 5)").alias("tk")
    )
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), F.col("item"))
    )


@query(
    "dialect_lateral_view",
    oracle="""
    WITH words AS (
      SELECT doc_id, u.w AS word, CAST(u.pos - 1 AS INTEGER) AS pos
      FROM documents,
           LATERAL (SELECT UNNEST(string_split(text, ' ')) AS w,
                           generate_subscripts(string_split(text, ' '), 1)
                             AS pos) u
      WHERE doc_id < 40
    )
    SELECT doc_id, pos, word
    FROM words WHERE word <> ''
    ORDER BY doc_id, pos
    """,
)
def dialect_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive/SparkSQL ``LATERAL VIEW POSEXPLODE`` dialect corner ([L]):
    the table-generating-function syntax inherited from HiveQL, the
    spelling a migrating Hive warehouse uses for the same explode the
    DataFrame API writes as ``posexplode`` — proven equivalent to
    DuckDB's UNNEST WITH ORDINALITY (via generate_subscripts). The
    position column pins ORDER within each array, not just the bag of
    words."""
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 40).createOrReplaceTempView(
        "lv_docs_v"
    )
    return spark.sql(
        """
        SELECT doc_id, pos, word
        FROM lv_docs_v
        LATERAL VIEW POSEXPLODE(SPLIT(text, ' ')) t AS pos, word
        WHERE word <> ''
        ORDER BY doc_id, pos
        """
    )
