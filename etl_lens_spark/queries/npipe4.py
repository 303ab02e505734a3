"""Training-data pipeline tranche 4: incremental (delta-vs-corpus)
dedup and deterministic epoch shuffle/sharding.

The nightly reality of a 100 TB corpus is not "dedup the world" —
it's "dedup TODAY'S crawl against the world". And the consumer of the
corpus needs a reproducible global permutation (epoch shuffle) that no
engine's nondeterministic RNG can provide. Both land here as declared,
oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.dedup.exact import fingerprint
from etl_lens_spark.operators import setsim
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table

_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


@query(
    "dedup_incremental_batch",
    headline=True,
    oracle=f"""
    WITH fps AS (
        SELECT doc_id, {_FP_SQL} AS fp FROM documents
    ),
    corpus AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8),
    delta AS (SELECT doc_id, fp FROM fps WHERE doc_id % 10 >= 8),
    firsts AS (SELECT fp, MIN(doc_id) AS keep_id FROM delta GROUP BY fp)
    SELECT d.doc_id, d.fp,
           CASE WHEN c.fp IS NOT NULL THEN 'dup_of_corpus'
                WHEN d.doc_id = f.keep_id THEN 'new'
                ELSE 'dup_in_batch' END AS status
    FROM delta d
    LEFT JOIN corpus c ON d.fp = c.fp
    JOIN firsts f ON d.fp = f.fp
    ORDER BY d.doc_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: classify a delta batch (doc_id %10 ∈ {8,9})
    against the standing corpus (the other 80%) — ``dup_of_corpus`` /
    ``dup_in_batch`` / ``new`` (the within-batch first-seen winner).

    Scale shape: the corpus side collapses to DISTINCT fingerprints
    BEFORE the join, so the standing 100 TB of text contributes one
    32-byte scalar per distinct document to the exchange (and in the
    real deployment that fingerprint set is a maintained table — the
    nightly cost is the delta scan, not a corpus rescan). The delta's
    within-batch election is a min-window riding the SAME fp shuffle
    as the anti-join probe; document text never leaves its scan.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fp", fingerprint(F.col("text"))
    )
    corpus_fp = (
        docs.filter(F.col("doc_id") % 10 < 8).select("fp").distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    delta = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", "fp")
    keep = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        delta.join(corpus_fp, "fp", "left")
        .withColumn("keep_id", keep)
        .select(
            "doc_id",
            "fp",
            F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
            .when(F.col("doc_id") == F.col("keep_id"), "new")
            .otherwise("dup_in_batch")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


@query(
    "dataset_shard_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id, n_chars,
               ('0x' || substring(md5('ep1' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT AS hk
        FROM documents
    ),
    pos AS (
        SELECT doc_id, n_chars, hk, hk % 16 AS shard,
               ROW_NUMBER() OVER (PARTITION BY hk % 16
                                  ORDER BY hk, doc_id) AS rn
        FROM h
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(rn * doc_id) AS BIGINT) AS perm_checksum,
           MIN(hk) AS hash_min, MAX(hk) AS hash_max
    FROM pos GROUP BY shard ORDER BY shard
    """,
)
def dataset_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + sharding: every document gets a
    salt-keyed md5 order key (seed 'ep1' — change the salt, get an
    independent permutation), shard = key % 16, within-shard position
    by (key, doc_id). The per-shard ``perm_checksum`` Σ(position·id)
    pins the ENTIRE permutation order cross-engine — any engine
    disagreement about who sits where fails the hash.

    This is how a trainer gets a reproducible global shuffle of a
    100 TB corpus with no RNG state: the order key is pure per-row
    arithmetic at scan time (no global sort — shard assignment is a
    hash partition, within-shard order is a per-shard sort that rides
    the one shard shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    hk = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("ep1"), F.col("doc_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    pos = docs.select("doc_id", "n_chars", hk.alias("hk")).withColumn(
        "shard", F.col("hk") % 16
    )
    w = Window.partitionBy("shard").orderBy("hk", "doc_id")
    ranked = pos.withColumn("rn", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.col("rn") * F.col("doc_id"))
            .cast("long")
            .alias("perm_checksum"),
            F.min("hk").alias("hash_min"),
            F.max("hk").alias("hash_max"),
        )
        .orderBy("shard")
    )


@query(
    "text_token_entropy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, t FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)),
                                             '[ \t\n\r]+')) AS t
            FROM documents)
        WHERE t <> ''
    ),
    cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY doc_id, t),
    agg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
        FROM cnt GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           COALESCE(a.n_types, 0) AS n_types,
           CASE WHEN a.n_tokens > 0
                THEN ln(CAST(a.n_tokens AS DOUBLE)) - a.clnc / a.n_tokens
                END AS entropy,
           CASE WHEN a.n_tokens > 0
                THEN CAST(a.n_types AS DOUBLE) / a.n_tokens END AS ttr
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy + type-token ratio per
    document — the diversity complement of the Gopher repetition
    filters (low entropy ⇒ degenerate/boilerplate text).

    Deliberately NOT the explode→groupBy wordcount shape: a per-doc
    histogram is row-local, so shuffling the entire token stream to
    compute it is pure waste at 100 TB. One Arrow-batched mapInPandas
    pass computes every signal in place — ZERO shuffles, text never
    leaves its scan partition. H = ln(N) − Σc·ln c ⁄ N (single-pass
    form). The oracle recomputes relationally via unnest/groupBy —
    two different shapes, one distribution."""
    import pandas as pd  # noqa: F401 (Arrow batch interface)

    def score(batches):
        import math
        import re
        from collections import Counter

        import pandas as pd

        splitter = re.compile(r"[ \t\n\r]+")
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_tokens": [],
                "n_types": [],
                "entropy": [],
                "ttr": [],
            }
            for text in pdf["text"]:
                toks = [
                    t
                    for t in splitter.split(text.lower().strip())
                    if t
                ]
                n = len(toks)
                if n == 0:
                    out["n_tokens"].append(0)
                    out["n_types"].append(0)
                    out["entropy"].append(None)
                    out["ttr"].append(None)
                    continue
                cnt = Counter(toks)
                clnc = sum(c * math.log(c) for c in cnt.values())
                out["n_tokens"].append(n)
                out["n_types"].append(len(cnt))
                out["entropy"].append(math.log(n) - clnc / n)
                out["ttr"].append(len(cnt) / n)
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        score,
        "doc_id long, n_tokens long, n_types long, "
        "entropy double, ttr double",
    ).orderBy("doc_id")


@query(
    "feature_quantile_bins",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_c
        FROM orders
    ),
    b AS (
        SELECT price_c,
               NTILE(10) OVER (ORDER BY price_c, o_orderkey) AS bin
        FROM t
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(price_c) AS lo_c, MAX(price_c) AS hi_c,
           AVG(CAST(price_c AS DOUBLE)) AS mean_c
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization: order totals into 10 exact
    quantile bins (NTILE over a fully deterministic order — ties
    broken by key), summarized as bin edges/counts/means. The exact
    form is the oracle anchor and needs a total order; the 100 TB
    path swaps the NTILE for ``approx_percentile`` cutpoints (one
    mergeable-sketch pass, no global sort) and bins by range — same
    output contract, sketch-bounded edges."""
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
    )
    b = t.select(
        "price_c",
        F.ntile(10)
        .over(Window.orderBy("price_c", "o_orderkey"))
        .cast("long")
        .alias("bin"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("price_c").alias("lo_c"),
            F.max("price_c").alias("hi_c"),
            F.avg(F.col("price_c").cast("double")).alias("mean_c"),
        )
        .orderBy("bin")
    )


@query(
    "feature_quantile_bins_approx",
    oracle="""
    WITH t AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_c
        FROM orders
    ),
    cuts AS (
        SELECT [quantile_disc(price_c, 0.1), quantile_disc(price_c, 0.2),
                quantile_disc(price_c, 0.3), quantile_disc(price_c, 0.4),
                quantile_disc(price_c, 0.5), quantile_disc(price_c, 0.6),
                quantile_disc(price_c, 0.7), quantile_disc(price_c, 0.8),
                quantile_disc(price_c, 0.9)] AS cs
        FROM t
    ),
    b AS (
        SELECT price_c,
               1 + len(list_filter((SELECT cs FROM cuts),
                                   c -> price_c > c)) AS bin
        FROM t
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(price_c) AS lo_c, MAX(price_c) AS hi_c,
           AVG(CAST(price_c AS DOUBLE)) AS mean_c
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def feature_quantile_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``feature_quantile_bins``: equal-frequency
    discretization with NO global sort anywhere in the plan. Decile
    cutpoints come from ONE mergeable-sketch aggregate
    (``approx_percentile`` — GK summaries combine map-side, so the
    sketch pass is a normal partial-aggregate shuffle of sketch
    state, never of rows), broadcast as a single 9-element row; every
    row then range-bins itself locally (value ≤ cut₁ → bin 1, ties to
    the lower bin) and the summary is a plain 10-group aggregate.
    Accuracy is pinned above the fixture row count so the sketch is
    EXACT here — empirically bit-identical to DuckDB
    ``quantile_disc`` rank semantics (verified for ties and odd N) —
    while at 100 TB the same plan runs with the default accuracy and
    carries an ε·N rank bound on bin edges instead of a terabyte
    sort. Unlike the NTILE anchor, bucket boundaries land ON repeated
    values (all ties share a bin), which is the contract sketch
    binning actually guarantees at scale."""
    from etl_lens_spark.config import sketch_accuracy

    return _quantile_bins_sketch(
        spark, sf_dir, accuracy=sketch_accuracy(spark)
    )


def _quantile_bins_sketch(
    spark: SparkSession, sf_dir: str, accuracy: int
) -> DataFrame:
    """Sketch-binning body shared by the registry entry (saturating
    accuracy — measured bit-identical to DuckDB quantile_disc at both
    gate scales; 2e5 was NOT enough at N=150k because GK merge error
    compounds across partial-aggregate merges, so the pin is ~7x N)
    and the growth probe's production-accuracy variant (default-ish
    1e4, where the sketch pass is flat: 1.8s vs the 8.4s saturated
    sketch and the single-reducer sort on 4.5M rows)."""
    t = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
    )
    probs = ",".join(str(p / 10) for p in range(1, 10))
    cuts = t.agg(
        F.expr(
            f"approx_percentile(price_c, array({probs}), {accuracy})"
        ).alias("cs")
    )
    # static unroll of the 9 cutpoint comparisons (NOT an array HOF —
    # filter/aggregate lambdas run interpreted per row, measured 3x
    # slower than the exact NTILE at 30x; the unrolled sum compiles
    # into whole-stage codegen and the probe shows it flat)
    bin_expr = F.lit(1)
    for i in range(9):
        bin_expr = bin_expr + F.when(
            F.col("price_c") > F.col("cs").getItem(i), 1
        ).otherwise(0)
    b = t.crossJoin(F.broadcast(cuts)).select(
        "price_c",
        bin_expr.cast("long").alias("bin"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("price_c").alias("lo_c"),
            F.max("price_c").alias("hi_c"),
            F.avg(F.col("price_c").cast("double")).alias("mean_c"),
        )
        .orderBy("bin")
    )


@query(
    "emb_centroid_distance",
    oracle="""
    WITH x AS (
        SELECT vec_id, label, ord, CAST(xv AS DOUBLE) AS xv
        FROM (SELECT vec_id, label,
                     unnest(embedding) AS xv,
                     unnest(range(1, len(embedding) + 1)) AS ord
              FROM embeddings)
    ),
    cent AS (SELECT label, ord, AVG(xv) AS m FROM x GROUP BY label, ord),
    dots AS (
        SELECT x.vec_id, x.label,
               SUM(x.xv * c.m) AS dot,
               SUM(x.xv * x.xv) AS nx,
               SUM(c.m * c.m) AS nc
        FROM x JOIN cent c ON x.label = c.label AND x.ord = c.ord
        GROUP BY x.vec_id, x.label
    )
    SELECT vec_id, label,
           CASE WHEN nx > 0 AND nc > 0
                THEN dot / (sqrt(nx) * sqrt(nc)) END AS cos_centroid
    FROM dots ORDER BY vec_id
    """,
)
def emb_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector cosine similarity to its label centroid — the
    embedding-space coherence signal behind cluster-outlier pruning
    (a vector far from its own group's center is mislabeled or noise).

    Two stages, both JVM-only: (1) centroids via row-local posexplode
    + groupBy(label, dim) — hash aggregation combines map-side, so
    the exchange carries partitions × k × dim partial sums, never the
    n × dim point stream; (2) the k × dim centroid table folds back to
    arrays and BROADCASTS, and each vector's cosine is a zip_with /
    aggregate fold — no second shuffle, no Python, no explode of the
    probe side. The oracle recomputes everything relationally from
    zipped unnests."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "xv"
        ),
    )
    cent_dims = x.groupBy("label", "pos").agg(F.avg("xv").alias("m"))
    cent = cent_dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cent")
    )
    j = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).join(F.broadcast(cent), "label")
    dot = F.aggregate(
        F.zip_with("v", "cent", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda a: a * a), F.lit(0.0), lambda acc, t: acc + t
    )
    return (
        j.select(
            "vec_id",
            "label",
            dot.alias("dot"),
            sq(F.col("v")).alias("nx"),
            sq(F.col("cent")).alias("nc"),
        )
        .select(
            "vec_id",
            "label",
            F.when(
                (F.col("nx") > 0) & (F.col("nc") > 0),
                F.col("dot") / (F.sqrt("nx") * F.sqrt("nc")),
            ).alias("cos_centroid"),
        )
        .orderBy("vec_id")
    )


@query(
    "curate_embeddings_pipeline",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.35
    ),
    dups AS (SELECT DISTINCT idb AS vec_id FROM pairs),
    x AS (
        SELECT vec_id, label, ord, CAST(xv AS DOUBLE) AS xv
        FROM (SELECT vec_id, label,
                     unnest(embedding) AS xv,
                     unnest(range(1, len(embedding) + 1)) AS ord
              FROM embeddings)
    ),
    cent AS (SELECT label, ord, AVG(xv) AS m FROM x GROUP BY label, ord),
    dots AS (
        SELECT x.vec_id, x.label,
               SUM(x.xv * c.m) AS dot,
               SUM(x.xv * x.xv) AS nx,
               SUM(c.m * c.m) AS nc
        FROM x JOIN cent c ON x.label = c.label AND x.ord = c.ord
        GROUP BY x.vec_id, x.label
    ),
    status AS (
        SELECT e.vec_id, e.label,
               CASE WHEN d.vec_id IS NOT NULL THEN 'dup'
                    WHEN dots.dot / (sqrt(dots.nx) * sqrt(dots.nc)) < -0.05
                      THEN 'outlier'
                    ELSE 'kept' END AS status
        FROM embeddings e
        LEFT JOIN dups d ON e.vec_id = d.vec_id
        JOIN dots ON e.vec_id = dots.vec_id
    )
    SELECT label, status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum
    FROM status GROUP BY label, status ORDER BY label, status
    """,
)
def curate_embeddings_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus curation as one declared pipeline: near-dup
    removal (greedy first-seen — a vector pairing with ANY lower id
    at cosine ≥ 0.35 is `dup`; the CC-cluster variant is
    dedup_cc_clusters) → centroid-coherence outlier gate
    (cos-to-label-centroid < −0.05) → kept, with per-(label, status)
    counts and id-sums pinning every vector's fate. Precedence
    dup > outlier.

    The exact all-pairs stage is the bounded oracle anchor (guarded
    elsewhere; the LSH banding in dedup_embedding_lsh is the declared
    100 TB swap); the centroid stage is the map-side-combined
    broadcast shape of emb_centroid_distance. The statuses compose
    two already-verified operators — this query pins their
    INTERACTION (join precedence, id bookkeeping), the part a nightly
    pipeline actually gets wrong."""
    from etl_lens_spark.dedup import embedding as emb_dedup
    from etl_lens_spark.operators.partitioning import parallelize_compute
    from etl_lens_spark.queries.graph_q import COSINE_TAU

    e = load_table(spark, sf_dir, "embeddings")
    pairs = emb_dedup.cosine_pairs(parallelize_compute(e), COSINE_TAU)
    dups = pairs.select(F.col("id_b").alias("vec_id")).distinct().withColumn(
        "is_dup", F.lit(1)
    )
    cent = emb_centroid_distance(spark, sf_dir)
    status = (
        e.select("vec_id", "label")
        .join(dups, "vec_id", "left")
        .join(cent.select("vec_id", "cos_centroid"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.when(F.col("is_dup").isNotNull(), "dup")
            .when(F.col("cos_centroid") < -0.05, "outlier")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return (
        status.groupBy("label", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vec_id").cast("long").alias("id_sum"),
        )
        .orderBy("label", "status")
    )


@query(
    "text_readability_flesch",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                 AS n_sentences,
               len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS n_syllables
        FROM documents
    )
    SELECT doc_id,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           CASE WHEN n_words > 0 THEN
             206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
           END AS flesch
    FROM t ORDER BY doc_id
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    quality signal (low scores flag dense/garbled text for curation).
    Sentence, word, and syllable proxies are all
    ``regexp_extract_all`` COUNTS — pure JVM codegen, zero Python,
    zero shuffle (the formula is row-local); the identical RE2-class
    patterns run in DuckDB so the counts match exactly and only the
    final formula is floating."""
    docs = load_table(spark, sf_dir, "documents")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("long")
    low = F.lower(F.col("text"))
    n_words = F.size(
        F.regexp_extract_all(low, F.lit("[a-z]+"), F.lit(0))
    ).cast("long")
    n_syl = F.size(
        F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    return docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syl.alias("n_syllables"),
        F.when(
            n_words > 0,
            F.lit(206.835)
            - 1.015 * (n_words.cast("double") / n_sent)
            - 84.6 * (n_syl.cast("double") / n_words),
        ).alias("flesch"),
    ).orderBy("doc_id")


@query(
    "corpus_source_dashboard",
    oracle=f"""
    WITH fps AS (
        SELECT doc_id, source, lang, n_chars,
               {_FP_SQL} AS fp
        FROM documents
    ),
    dupmark AS (
        SELECT source, lang, n_chars,
               COUNT(*) OVER (PARTITION BY fp) > 1 AS is_dup
        FROM fps
    ),
    lang_counts AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM dupmark GROUP BY source, lang
    ),
    top_lang AS (
        SELECT source, lang AS top_lang FROM (
            SELECT source, lang,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY c DESC, lang ASC) AS rn
            FROM lang_counts) t
        WHERE rn = 1
    ),
    per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_docs
        FROM dupmark GROUP BY source
    )
    SELECT p.source, p.n_docs, p.total_chars, p.n_langs, t.top_lang,
           p.n_dup_docs,
           CAST(p.n_dup_docs AS DOUBLE) / p.n_docs AS dup_rate
    FROM per_source p JOIN top_lang t ON p.source = t.source
    ORDER BY p.source
    """,
)
def corpus_source_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard — the one-glance report a
    curation team reviews before admitting a source: volume, language
    mix (count + deterministic modal language), and the corpus-wide
    duplicate exposure (share of the source's docs whose fingerprint
    appears more than once ANYWHERE — cross-source contamination
    counts against both sources). One fp-keyed window marks dups, one
    groupBy per rollup; document text reduces to its fingerprint at
    scan time and never shuffles."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars",
        fingerprint(F.col("text")).alias("fp"),
    )
    dup = docs.withColumn(
        "is_dup", F.count(F.lit(1)).over(Window.partitionBy("fp")) > 1
    )
    per_source = dup.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
    )
    lang_counts = dup.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wl = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    top_lang = (
        lang_counts.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        per_source.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "n_langs",
            "top_lang",
            "n_dup_docs",
            (F.col("n_dup_docs").cast("double") / F.col("n_docs")).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Substring-span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better", arXiv:2107.06499 — public paper).
# Exact-duplicate SUBSTRINGS across documents, not duplicate documents:
# flag every k-token gram that appears in >= 2 distinct docs, then
# merge overlapping flagged positions into maximal spans per doc
# (their suffix-array pass, re-expressed as a gram-join + island merge
# — the shape that distributes).
# ---------------------------------------------------------------------------

_SPAN_K = 8

_SPAN_CTE = f"""
    t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                                'g')), ' ') AS toks
        FROM documents
    ),
    tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= {_SPAN_K}),
    g AS (
        SELECT doc_id, i AS p,
               array_to_string(toks[i:i+{_SPAN_K}-1], ' ') AS gram
        FROM tt, LATERAL (
            SELECT unnest(range(1, len(toks)-{_SPAN_K}+2)) AS i) u
    ),
    d AS (
        SELECT gram FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    f AS (
        SELECT g.doc_id, g.p, g.p + {_SPAN_K} - 1 AS e
        FROM g JOIN d USING (gram)
    ),
    isl AS (
        SELECT doc_id, p, e,
               CASE WHEN MAX(e) OVER w IS NULL
                         OR p > MAX(e) OVER w + 1
                    THEN 1 ELSE 0 END AS ni
        FROM f
        WINDOW w AS (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (
        SELECT doc_id, p, e,
               SUM(ni) OVER (PARTITION BY doc_id ORDER BY p
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS island
        FROM isl
    ),
    spans AS (
        SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
               CAST(MAX(e) AS BIGINT) AS span_end,
               CAST(MAX(e) - MIN(p) + 1 AS BIGINT) AS span_len
        FROM isl2 GROUP BY doc_id, island
    )
"""


def _span_frames(spark: SparkSession, sf_dir: str):
    """Shared Spark pipeline: (tokenized docs, merged duplicate spans).

    Scale shape: grams leave their doc only as xxhash64 LONGS (the
    oracle joins gram strings; 64-bit keys make the same decision up
    to a ~1e-10 collision chance at corpus scale) for one count-
    distinct shuffle; span merging is per-doc windows riding a doc_id
    partition — no global window anywhere."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    t = docs.select("doc_id", toks.alias("toks"))
    tt = t.filter(F.size("toks") >= _SPAN_K)
    g = tt.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks)-{_SPAN_K}+1), "
                f"i -> struct(CAST(i AS BIGINT) AS p, "
                f"xxhash64(concat_ws(' ', slice(toks, i, {_SPAN_K}))) AS gk))"
            )
        ).alias("s"),
    ).select("doc_id", "s.p", "s.gk")
    dup = (
        g.select("gk", "doc_id")
        .distinct()
        .groupBy("gk")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gk")
    )
    f = g.join(dup, "gk").select(
        "doc_id", "p", (F.col("p") + _SPAN_K - 1).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_e = F.max("e").over(w_prev)
    ni = F.when(prev_e.isNull() | (F.col("p") > prev_e + 1), 1).otherwise(0)
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        f.withColumn("ni", ni)
        .withColumn("island", F.sum("ni").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
            (F.max("e") - F.min("p") + 1).cast("long").alias("span_len"),
        )
    )
    return t, spans


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH {_SPAN_CTE}
    SELECT doc_id, span_start, span_end, span_len
    FROM spans ORDER BY doc_id, span_start
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] duplicated-substring spans: maximal per-doc token ranges
    covered by {_SPAN_K}-grams that occur in >= 2 distinct documents
    (1-based inclusive token positions). The report a span-level
    deduper consumes — Lee et al.'s ExactSubstr output re-expressed
    as gram-join + gaps-and-islands instead of a suffix array."""
    _, spans = _span_frames(spark, sf_dir)
    return spans.select(
        "doc_id", "span_start", "span_end", "span_len"
    ).orderBy("doc_id", "span_start")


@query(
    "dedup_span_strip_stats",
    oracle=f"""
    WITH {_SPAN_CTE},
    per_doc AS (
        SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           CAST(len(t.toks) AS BIGINT) - COALESCE(p.dup_tokens, 0)
               AS kept_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE) / len(t.toks)
               AS dup_frac
    FROM t LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def dedup_span_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document effect of substring-span stripping: token count,
    span count, duplicated tokens (spans are disjoint by
    construction, so a straight SUM), and the retention arithmetic a
    curation run reports before committing the strip."""
    t, spans = _span_frames(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").cast("long").alias("dup_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )
    return (
        t.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (F.col("n_tokens") - F.coalesce("dup_tokens", F.lit(0))).alias(
                "kept_tokens"
            ),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join with prefix filtering (PPJoin family:
# Chaudhuri et al. 2006 "A Primitive Operator for Similarity Joins" /
# Xiao et al. 2008 PPJoin — public papers). Unlike MinHash-LSH this
# is EXACT: the prefix filter provably cannot drop a qualifying pair
# (if |x∩y| >= ceil(t·|x|), the (|x|-ceil(t·|x|)+1)-prefixes under a
# global token order must intersect), so the oracle is a plain
# hash-match against the quadratic form.
# ---------------------------------------------------------------------------

_PP_T = 0.5

_PP_TOK_SQL = """
    tt AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                                'g')), ' ') AS toks
        FROM documents
    ),
    tok AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS w
        FROM tt, LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) u
        WHERE len(toks) >= 3
    )
"""


@query(
    "dedup_jaccard_prefix_join",
    oracle=f"""
    WITH {_PP_TOK_SQL},
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM tok GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_PP_T}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] EXACT Jaccard similarity join over trigram token sets with
    PPJoin prefix + positional filtering (Chaudhuri et al. 2006,
    Xiao et al. 2008 — public papers) — the scalable-exact
    alternative to both the quadratic anchor and the approximate
    MinHash path:

    1. one corpus pass builds (doc, trigram) distinct sets;
    2. tokens sort rare-first under the global (freq, token) order —
       a broadcast-joinable frequency table, no global rank window;
    3. each doc indexes only its |x| - ceil(t·|x|) + 1 prefix; the
       inverted-index self-join on PREFIX tokens yields candidates,
       pruned further by (a) the length filter |y| >= t·|x| and
       (b) PPJoin's POSITIONAL filter: a shared token at positions
       (pa, pb) caps the overlap at min(|x|-pa, |y|-pb) + 1, which
       must reach alpha = ceil(t/(1+t)·(|x|+|y|)) — integer-exact
       at t=0.5 (alpha = (|x|+|y|+2) div 3);
    4. survivors verify row-locally via array_intersect on the
       carried token arrays (no explode shuffle).

    Every filter is provably lossless (the first common token in the
    global order lies inside both prefixes and satisfies the
    positional bound for any qualifying pair), so the DuckDB oracle
    runs the full quadratic token join and the results hash-match —
    while the Spark plan's pair work tracks CANDIDATES, which the
    rare-first prefixes keep near the true-pair count at scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = _trigram_sets(docs)
    return (
        setsim.jaccard_self_join(tok, _PP_T)
        .orderBy("doc_a", "doc_b")
    )


def _trigram_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, trigram) distinct sets over whitespace tokens."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks)-2), "
                    "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("w"),
        )
        .distinct()
    )


@query(
    "dedup_incremental_jaccard",
    oracle=f"""
    WITH {_PP_TOK_SQL},
    probe AS (SELECT * FROM tok WHERE doc_id % 10 >= 8),
    index_side AS (SELECT * FROM tok WHERE doc_id % 10 < 8),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM tok GROUP BY doc_id),
    inter AS (
        SELECT p.doc_id AS doc_a, i.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM probe p JOIN index_side i ON p.w = i.w
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_PP_T}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_incremental_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] incremental EXACT near-dup detection: today's delta
    (doc_id %10 in {{8,9}}) probed against the standing corpus (the
    other 80%) with the R-S variant of the PPJoin prefix join
    (operators/setsim.py::jaccard_rs_join). The global token order
    comes from the INDEX side's frequency statistics — the thing a
    maintained production index already has — and unseen probe
    tokens sort rarest (f=0), where they prune hardest. Only the
    delta is tokenized fresh; the corpus contributes its sorted sets
    + prefix index, which in deployment is a standing table. Exact:
    the oracle is the plain quadratic delta x corpus token join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = _trigram_sets(docs)
    probe = tok.filter(F.col("doc_id") % 10 >= 8)
    index_side = tok.filter(F.col("doc_id") % 10 < 8)
    return (
        setsim.jaccard_rs_join(probe, index_side, _PP_T)
        .orderBy("doc_a", "doc_b")
    )
