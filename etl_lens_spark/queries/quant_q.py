"""Round-4 quantile & sampling family: exact distributed order
statistics on the prefix-rank operator, grouped sketch quantiles, and
the deterministic sampling/splitting operators a training-data
pipeline runs before every mixture build.

Scale posture: nothing here funnels rows through one reducer — exact
quantiles ride the range-partition global rank (operators/prefix.py),
sketch quantiles are one mergeable partial-aggregate pass, and the
sampling/split operators are pure row-local hash arithmetic (the same
md5-derived uniforms on both engines, so every "random" decision is
oracle-reproducible bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


@query(
    "exact_quantiles_distributed",
    oracle="""
    WITH t AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_c,
               o_orderkey
        FROM orders
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
    ranked AS (
        SELECT price_c,
               ROW_NUMBER() OVER (ORDER BY price_c, o_orderkey) AS rnk
        FROM t
    )
    SELECT CAST(p AS DOUBLE) / 100 AS prob,
           r.price_c AS value_c
    FROM (SELECT unnest([10, 25, 50, 75, 90, 99]) AS p) probs
    JOIN n ON TRUE
    JOIN ranked r
      ON r.rnk = CAST(ceil(p * n.n / 100.0) AS BIGINT)
    ORDER BY prob
    """,
    headline=True,
)
def exact_quantiles_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global quantiles with no global sort and no sketch: the
    range-partition global rank (``ordered_global_rank`` — parallel
    per-partition row_numbers + broadcast offsets, zero
    single-reducer stages) assigns every row its exact order
    statistic, then the six requested ranks ceil(p·N) are selected by
    a broadcast semi-join against the O(1) rank list. This is the
    third member of the quantile family: the NTILE anchor needs one
    reducer, the sketch twin trades exactness for a bounded pass, and
    THIS form is exact AND distributed — the TeraSort decomposition
    applied to order statistics. The oracle recomputes the same
    ceil-rank rule with a native window."""
    from etl_lens_spark.operators.prefix import ordered_global_rank

    t = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
        "o_orderkey",
    )
    n = t.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = ordered_global_rank(
        t, [F.asc("price_c"), F.asc("o_orderkey")], "rnk"
    )
    probs = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in (10, 25, 50, 75, 90, 99)]))
        .alias("p")
    )
    targets = probs.crossJoin(F.broadcast(n)).select(
        (F.col("p").cast("double") / 100).alias("prob"),
        F.ceil(F.col("p") * F.col("n") / 100.0).cast("long").alias("rnk"),
    )
    return (
        ranked.join(F.broadcast(targets), "rnk")
        .select("prob", F.col("price_c").alias("value_c"))
        .orderBy("prob")
    )


@query(
    "group_quantiles_approx",
    headline=True,
    oracle="""
    WITH t AS (
        SELECT o_orderpriority AS priority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_c
        FROM orders
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(price_c, 0.25) AS p25_c,
           quantile_disc(price_c, 0.50) AS p50_c,
           quantile_disc(price_c, 0.75) AS p75_c,
           quantile_disc(price_c, 0.95) AS p95_c
    FROM t GROUP BY priority ORDER BY priority
    """,
)
def group_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED sketch quantiles — the per-cohort latency/size
    percentile report every monitoring stack runs: one
    ``approx_percentile`` aggregate per priority group, all groups in
    one map-side-combined pass (each group carries its own GK sketch;
    no window, no per-group sort). Accuracy is pinned saturating so
    the sketch is exact at the gate scales and matches DuckDB
    ``quantile_disc`` rank semantics (the round-4 finding: GK merge
    error compounds, so the pin is ~7x the largest gate-scale group);
    production drops accuracy to default and the same plan carries an
    ε·N-per-group bound."""
    t = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
    )
    from etl_lens_spark.config import sketch_accuracy

    acc = sketch_accuracy(spark)
    agg = t.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            f"approx_percentile(price_c, array(0.25,0.5,0.75,0.95), {acc})"
        ).alias("qs"),
    )
    return agg.select(
        "priority",
        "n",
        F.col("qs").getItem(0).alias("p25_c"),
        F.col("qs").getItem(1).alias("p50_c"),
        F.col("qs").getItem(2).alias("p75_c"),
        F.col("qs").getItem(3).alias("p95_c"),
    ).orderBy("priority")


@query(
    "sample_weighted_aes",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS wt,
               ('0x' || substring(md5('aes' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT AS h
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, wt,
               ln((h % 1000000 + 1) / 1000001.0) / wt AS k
        FROM w
    )
    SELECT doc_id, CAST(wt AS BIGINT) AS n_chars
    FROM keyed ORDER BY k DESC, doc_id LIMIT 50
    """,
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each document draws key u^(1/w) — equivalently
    ln(u)/w — from a DETERMINISTIC md5-derived uniform, and the
    top-50 keys are the sample. Inclusion probability is proportional
    to weight (n_chars), the classic length-weighted corpus
    subsample. Row-local arithmetic + one top-k: the top-k is
    Spark's TakeOrdered (per-partition heaps, no global sort), and
    because the uniforms are hash-derived rather than RNG state, the
    oracle reproduces the EXACT sample — reproducible sampling being
    the property a data pipeline actually needs for audits."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("wt")
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("aes"), F.col("doc_id"))), 1, 8),
        16,
        10,
    ).cast("long")
    keyed = docs.select(
        "doc_id",
        "wt",
        (F.log((h % 1000000 + 1) / 1000001.0) / F.col("wt")).alias("k"),
    )
    return (
        keyed.orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", F.col("wt").cast("long").alias("n_chars"))
    )


@query(
    "dataset_train_val_test_split",
    oracle="""
    WITH assigned AS (
        SELECT source,
               CASE
                 WHEN ('0x' || substring(md5('split'
                        || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 100 < 80 THEN 'train'
                 WHEN ('0x' || substring(md5('split'
                        || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 100 < 90 THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars
        FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY source, split ORDER BY source, split
    """,
)
def dataset_train_val_test_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-
    stable hash bucket — the split step of every dataset build. The
    assignment is a pure function of doc_id (no RNG state, no
    shuffle), so it is stable under re-runs, incremental appends, and
    engine swaps — the property that prevents test-set leakage when
    the corpus is rebuilt. One map-side-combined rollup reports the
    split sizes per source for mixture accounting."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    assigned = docs.select(
        "source",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
    )
    return (
        assigned.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


@query(
    "vocab_coverage_topk",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 400
    ),
    counts AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok WHERE tok <> '' GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts),
    ranked AS (
        SELECT tok, c,
               ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk,
               SUM(c) OVER (ORDER BY c DESC, tok
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, tok, c,
           CAST(cum AS DOUBLE) / (SELECT t FROM tot) AS coverage
    FROM ranked WHERE rnk <= 100 ORDER BY rnk
    """,
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design question
    "how much of the token stream do the top-k types cover?": token
    counts (one explode + map-side-combined groupBy), then the
    cumulative frequency share over the count-descending order via
    the DISTRIBUTED prefix sum (operators/prefix.py — range-partition
    on (c desc, tok), parallel local windows, broadcast offsets; no
    single-reducer window even when the vocabulary is 10^8 types).
    Reported for the top-100 types; the oracle recomputes with a
    native cumulative window."""
    from etl_lens_spark.operators.prefix import (
        ordered_global_rank,
        ordered_prefix_sums,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = counts.agg(F.sum("c").cast("long").alias("t"))
    order = [F.desc("c"), F.asc("tok")]
    with_cum = ordered_prefix_sums(counts, order, {"cum": "c"})
    ranked = ordered_global_rank(with_cum, order, "rnk")
    return (
        ranked.filter(F.col("rnk") <= 100)
        .crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "tok",
            "c",
            (F.col("cum").cast("double") / F.col("t")).alias("coverage"),
        )
        .orderBy("rnk")
    )


@query(
    "corpus_filter_yield_curve",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                 / n_chars AS alpha_ratio
        FROM documents WHERE n_chars > 0
    ),
    thresholds AS (
        SELECT CAST(unnest([0.0, 0.1, 0.2, 0.3, 0.4,
                            0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS thr
    )
    SELECT t.thr,
           CAST(COUNT(*) FILTER (WHERE s.alpha_ratio >= t.thr) AS BIGINT)
             AS n_docs,
           CAST(COALESCE(SUM(s.n_chars)
                  FILTER (WHERE s.alpha_ratio >= t.thr), 0) AS BIGINT)
             AS total_chars
    FROM thresholds t CROSS JOIN scored s
    GROUP BY t.thr ORDER BY t.thr
    """,
)
def corpus_filter_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtering yield curve — the curation question every quality
    bar raises: "how much corpus survives each threshold?" Documents
    score row-locally (alphabetic-character ratio, identical RE2
    class both engines), then ten literal thresholds sweep in ONE
    pass: the threshold table (10 rows) broadcasts into a cross join
    and a single grouped conditional aggregate emits docs/chars
    surviving per bar — no per-threshold rescans, which is the whole
    point at 100 TB (a 10-point curve costs the same scan as one
    filter). Exact integer chars; the only float is the score
    itself."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    scored = docs.select(
        "n_chars",
        (
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]"), 0)
            ).cast("double")
            / F.col("n_chars")
        ).alias("alpha_ratio"),
    )
    thresholds = spark.range(10).select(
        (F.col("id") / 10.0).alias("thr")
    )
    keep = F.col("alpha_ratio") >= F.col("thr")
    return (
        F.broadcast(thresholds)
        .crossJoin(scored)
        .groupBy("thr")
        .agg(
            F.count(F.when(keep, 1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.when(keep, F.col("n_chars"))), F.lit(0))
            .cast("long")
            .alias("total_chars"),
        )
        .orderBy("thr")
    )


@query(
    "weighted_median_distributed",
    oracle="""
    WITH t AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_c,
               CAST(l_quantity AS BIGINT) AS qty,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    tot AS (SELECT CAST(SUM(qty) AS BIGINT) AS w FROM t),
    cum AS (
        SELECT price_c, qty,
               SUM(qty) OVER (ORDER BY price_c, l_orderkey, l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cw
        FROM t
    )
    SELECT price_c AS weighted_median_c,
           CAST(cw AS BIGINT) AS cum_weight,
           (SELECT w FROM tot) AS total_weight
    FROM cum
    WHERE cw >= (SELECT w FROM tot) / 2.0
    ORDER BY cw LIMIT 1
    """,
)
def weighted_median_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT weighted median (price weighted by quantity) with no
    single-reducer stage: quantity cumulates over the price order via
    the distributed prefix sum, and the median is the first row whose
    cumulative weight reaches half the total — selected by a
    min-over-candidates aggregate (min of (cw, value) struct over the
    filtered frame), not a sort. The weighted generalization of the
    exact-quantile pattern: same range-partition shuffle, the weight
    column rides where the constant 1 rode. Oracle recomputes with a
    native cumulative window."""
    from etl_lens_spark.operators.prefix import ordered_prefix_sum

    t = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    tot = t.agg(F.sum("qty").cast("long").alias("w"))
    cum = ordered_prefix_sum(
        t,
        [F.asc("price_c"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        "qty",
        "cw",
    )
    half = F.col("w") / 2.0
    cand = cum.crossJoin(F.broadcast(tot)).filter(F.col("cw") >= half)
    # min(struct(cw, price_c)) = the first crossing row — an
    # aggregate, not a sort/limit over the candidate set
    first = cand.agg(
        F.min(F.struct("cw", "price_c")).alias("m"),
        F.first("w").alias("total_weight"),
    )
    return first.select(
        F.col("m.price_c").alias("weighted_median_c"),
        F.col("m.cw").cast("long").alias("cum_weight"),
        "total_weight",
    )


@query(
    "dataset_shard_rendezvous",
    oracle="""
    WITH shards AS (SELECT unnest(range(0, 8)) AS sh),
    w AS (
        SELECT d.doc_id, s.sh,
               ('0x' || substring(md5('hrw' || d.doc_id || '_' || s.sh),
                1, 8))::BIGINT AS wt
        FROM documents d CROSS JOIN shards s
    ),
    full_assign AS (
        SELECT doc_id,
               arg_max(sh, wt) AS shard8
        FROM w GROUP BY doc_id
    ),
    drop7 AS (
        SELECT doc_id, arg_max(sh, wt) AS shard7
        FROM w WHERE sh <> 7 GROUP BY doc_id
    )
    SELECT f.shard8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f.shard8 <> d.shard7 THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_when_shard7_dropped,
           CAST(SUM(d.shard7) AS BIGINT) AS shard7_dest_sum
    FROM full_assign f JOIN drop7 d ON f.doc_id = d.doc_id
    GROUP BY f.shard8
    ORDER BY f.shard8
    """,
)
def dataset_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENDEZVOUS (highest-random-weight) sharding — the assignment
    scheme whose minimal-disruption property this query PROVES
    rather than asserts: each doc goes to the shard maximizing
    md5(doc, shard); the same weights re-evaluated WITHOUT shard 7
    give the 7-shard assignment, and the per-shard
    ``moved_when_shard7_dropped`` column shows rows move ONLY out of
    the dropped shard (zero for shards 0-6, everything for shard 7)
    — the property that lets a 100 TB dataset rebalance by touching
    1/N of its keys when a shard leaves, where mod-N hashing would
    reshuffle nearly everything. Row-local weight computation
    (8-way expression fan-out, no join for the argmax —
    ``greatest``-style fold), one aggregation; DuckDB replays the
    identical md5 weights relationally with arg_max."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    md5i = lambda sh: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit("hrw"),
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    F.lit(str(sh)),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # argmax over 8 shard weights as a row-local struct fold
    pairs = F.array(
        *[F.struct(md5i(sh).alias("wt"), F.lit(sh).alias("sh")) for sh in range(8)]
    )
    best8 = F.array_max(pairs)["sh"]
    pairs7 = F.array(
        *[F.struct(md5i(sh).alias("wt"), F.lit(sh).alias("sh")) for sh in range(7)]
    )
    best7 = F.array_max(pairs7)["sh"]
    a = docs.select(
        "doc_id",
        best8.alias("shard8"),
        best7.alias("shard7"),
    )
    return (
        a.groupBy(F.col("shard8").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (F.col("shard8") != F.col("shard7")).cast("long")
            )
            .cast("long")
            .alias("moved_when_shard7_dropped"),
            F.sum("shard7").cast("long").alias("shard7_dest_sum"),
        )
        .orderBy("shard")
    )
