"""Training-data curation, tranche 3: importance resampling (DSIR),
HTML boilerplate extraction, and compression-ratio quality signals.

All three are standard LLM-corpus steps published in the open
literature (DSIR: Xie et al. 2023 "Data Selection for Language Models
via Importance Resampling"; boilerplate stripping: C4/RefinedWeb;
compression ratio: Gopher quality heuristics). Everything here stays
JVM-side except the zlib pass, which is one Arrow-batched
``mapInPandas`` over stdlib zlib.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.operators.partitioning import parallelize_compute
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table

_N_BUCKETS = 256
_RATIO_SCALE = 1_000_000


def _md5_bucket(col, n=_N_BUCKETS):
    """First 6 hex chars of md5 as int, mod n — the repo's standard
    cross-engine hash bucket (operators/sampling.py idiom)."""
    return (
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 6), 16, 10)
        .cast("long")
        % n
    )


@query(
    "curate_dsir_resample",
    headline=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    tk AS (
        SELECT doc_id, source, token,
               ('0x' || substring(md5(token), 1, 6))::BIGINT
                   % {_N_BUCKETS} AS b
        FROM toks WHERE token <> ''
    ),
    stats AS (
        SELECT b, COUNT(*) AS r,
               COUNT(*) FILTER (WHERE source = 'src0') AS t
        FROM tk GROUP BY b
    ),
    ratios AS (
        SELECT b, (t + 1) * {_RATIO_SCALE} // (r + 1) AS ratio
        FROM stats
    ),
    scored AS (
        SELECT tk.doc_id, tk.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(ratio) AS BIGINT) AS score
        FROM tk JOIN ratios USING (b)
        GROUP BY tk.doc_id, tk.source
    )
    SELECT doc_id, source, n_tokens, score
    FROM scored ORDER BY score DESC, doc_id LIMIT 200
    """,
)
def curate_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023): estimate
    hashed-unigram distributions for a TARGET slice (source='src0')
    and the RAW corpus, score every document by its summed
    target/raw importance ratio, keep the top 200. The published
    method uses log-ratios; this uses the monotone integer ratio
    ``(t+1)*1e6 div (r+1)`` so both engines compute bit-identical
    scores (cross-engine ``ln`` low-bit drift can't flip a rank).

    Scale: ONE token-bucket aggregation (256 groups, map-side
    combine), ratios broadcast back (256 rows), ONE doc aggregation,
    top-k via TakeOrdered — no global sort, text never shuffles.
    At 100 TB this is two linear passes and a broadcast, the same
    shape the DSIR paper runs over the Pile."""
    docs = load_table(spark, sf_dir, "documents")
    tk = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .withColumn("b", _md5_bucket(F.col("token")))
    )
    stats = tk.groupBy("b").agg(
        F.count(F.lit(1)).alias("r"),
        F.count_if(F.col("source") == "src0").alias("t"),
    )
    ratios = stats.select(
        "b",
        F.expr(f"(t + 1) * {_RATIO_SCALE} div (r + 1)").alias("ratio"),
    )
    scored = (
        tk.join(F.broadcast(ratios), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("ratio").cast("long").alias("score"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id")
    ).limit(200)


@query(
    "text_html_extract",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
               || '</title><script type="text/javascript">var x='
               || CAST(doc_id AS VARCHAR) || ';\nlog(x);</script>'
               || '<style>p { color: red; }</style></head><body>'
               || '<nav><a href="/home">home</a> <a href="/about">'
               || 'about</a></nav><p>'
               || replace(text, ' the ', ' the<br> ')
               || '</p><div class="footer">&copy; 2024 Example '
               || '&amp; Co. &lt;hq&gt;</div></body></html>' AS html
        FROM documents
    ),
    stripped AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(html, '<a href'))
                    AS BIGINT) AS n_links,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(html,
                       '(?s)<script.*?</script>', ' ', 'g'),
                     '(?s)<style.*?</style>', ' ', 'g'),
                   '(?s)<nav.*?</nav>', ' ', 'g'),
                 '<[^>]+>', ' ', 'g') AS no_tags
        FROM raw
    ),
    clean AS (
        SELECT doc_id, n_links,
               trim(regexp_replace(
                   replace(replace(replace(replace(replace(no_tags,
                       '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&copy;', '(c)'),
                   '\\s+', ' ', 'g')) AS body_text
        FROM stripped
    )
    SELECT doc_id, n_links,
           CAST(length(body_text) AS BIGINT) AS extracted_len,
           md5(body_text) AS body_md5
    FROM clean ORDER BY doc_id
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate extraction (the C4/RefinedWeb web-pipeline
    step): strip <script>/<style> blocks, navigation chrome, all
    remaining tags; decode the common entities; collapse whitespace.
    The HTML is synthesized deterministically from ``documents`` in
    BOTH engines (the pii_redact_audit pattern — same dirty input
    built twice), with tags injected mid-text so inline stripping is
    exercised, and the md5 of every extracted body is hash-matched —
    byte-level parity, not just lengths.

    Scale: pure JVM regexp chain, zero Python, zero shuffle — a
    100 TB HTML crawl runs this at scan speed with full codegen."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><script type="text/javascript">var x='),
        F.col("doc_id").cast("string"),
        F.lit(";\nlog(x);</script>"),
        F.lit("<style>p { color: red; }</style></head><body>"),
        F.lit('<nav><a href="/home">home</a> <a href="/about">'),
        F.lit("about</a></nav><p>"),
        F.replace(F.col("text"), F.lit(" the "), F.lit(" the<br> ")),
        F.lit('</p><div class="footer">&copy; 2024 Example '),
        F.lit("&amp; Co. &lt;hq&gt;</div></body></html>"),
    )
    no_tags = html
    for pat in (
        "(?s)<script.*?</script>",
        "(?s)<style.*?</style>",
        "(?s)<nav.*?</nav>",
        "<[^>]+>",
    ):
        no_tags = F.regexp_replace(no_tags, pat, " ")
    body = no_tags
    for ent, rep in (
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&copy;", "(c)"),
    ):
        body = F.replace(body, F.lit(ent), F.lit(rep))
    body = F.trim(F.regexp_replace(body, r"\s+", " "))
    return (
        docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(html, F.lit("<a href"), 0))
            .cast("long")
            .alias("n_links"),
            body.alias("body_text"),
        )
        .select(
            "doc_id",
            "n_links",
            F.length("body_text").cast("long").alias("extracted_len"),
            F.md5(F.col("body_text").cast("binary")).alias("body_md5"),
        )
        .orderBy("doc_id")
    )


@query("text_compression_signals", oracle=None)
def text_compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (Gopher-family heuristic:
    highly compressible text is boilerplate/repetition; nearly
    incompressible is noise/encoded junk). One Arrow-batched
    ``mapInPandas`` pass runs stdlib ``zlib`` level-6 per document —
    deterministic bytes-in/bytes-out, pinned exactly in
    tests/test_npipe5.py against direct zlib — then a per-source
    rollup: corpus bytes, compressed bytes, and counts beyond the
    repetitive/incompressible thresholds (ratio in per-myriad integer
    arithmetic). Rows-only by design: no SQL engine exposes zlib.

    Scale: zero shuffle before the 5-group aggregate; zlib throughput
    ~100 MB/s/core makes this compute-bound and embarrassingly
    parallel — exactly what executor-side mapInPandas distributes."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def comp(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "raw_len": raw.str.len(),
                    "comp_len": [
                        len(zlib.compress(b, 6)) for b in raw
                    ],
                }
            )

    per_doc = docs.mapInPandas(
        comp, "doc_id long, source string, raw_len long, comp_len long"
    )
    ratio = (F.col("comp_len") * 10000).cast("long") / F.col("raw_len")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("raw_len").cast("long").alias("raw_bytes"),
            F.sum("comp_len").cast("long").alias("comp_bytes"),
            F.count_if(ratio < 3000).alias("n_repetitive"),
            F.count_if(ratio > 9000).alias("n_incompressible"),
        )
        .orderBy("source")
    )


@query(
    "text_unicode_normalize",
    oracle="""
    WITH dirty AS (
        SELECT doc_id,
               replace(replace(text, 'e', 'e' || chr(769)),
                       'w', 'w' || chr(7)) AS d
        FROM documents
    ),
    cleaned AS (
        SELECT doc_id, d,
               nfc_normalize(
                   regexp_replace(
                       d, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'
                   )
               ) AS norm
        FROM dirty
    )
    SELECT doc_id,
           CAST(length(d) AS BIGINT) AS dirty_len,
           CAST(length(norm) AS BIGINT) AS norm_len,
           md5(norm) AS norm_md5
    FROM cleaned ORDER BY doc_id
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode cleanup (the normalize step of every multilingual
    corpus pipeline): strip C0 control characters (keeping tab/
    newline), then NFC-normalize combining sequences. Dirty input is
    synthesized identically in both engines (combining acute U+0301
    after every 'e', a BEL control after every 'w'); Spark strips
    controls JVM-side and runs NFC through one Arrow-batched
    ``mapInPandas`` over stdlib ``unicodedata``, DuckDB uses its
    native ``nfc_normalize`` — two independent Unicode
    implementations hash-matched at byte level per document.

    Scale: the control strip and all counting/hashing stay in
    codegen; only the NFC pass is Python, zero-shuffle, and in a real
    pipeline runs fused with the other per-doc UDF passes."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    dirty = F.replace(
        F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301")),
        F.lit("w"),
        F.lit("w\x07"),
    )
    cleaned = F.regexp_replace(
        dirty, r"[\x00-\x08\x0B\x0C\x0E-\x1F]", ""
    )
    staged = docs.select(
        "doc_id",
        F.length(dirty).cast("long").alias("dirty_len"),
        cleaned.alias("cleaned"),
    )

    def norm(batches):
        import unicodedata

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dirty_len": pdf["dirty_len"],
                    "norm": [
                        unicodedata.normalize("NFC", s)
                        for s in pdf["cleaned"]
                    ],
                }
            )

    return (
        staged.mapInPandas(
            norm, "doc_id long, dirty_len long, norm string"
        )
        .select(
            "doc_id",
            "dirty_len",
            F.length("norm").cast("long").alias("norm_len"),
            F.md5(F.col("norm").cast("binary")).alias("norm_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "entity_jaro_winkler_pairs",
    oracle="""
    WITH n AS (
        SELECT p_name, MIN(p_partkey) AS rep,
               COUNT(*) AS grp_size
        FROM part GROUP BY p_name
    ),
    p AS (
        SELECT *, string_split(p_name, ' ')[1] AS blk FROM n
    )
    SELECT a.rep AS key1, b.rep AS key2,
           a.p_name AS name1, b.p_name AS name2,
           jaro_winkler_similarity(a.p_name, b.p_name) AS jw,
           CAST(a.grp_size * b.grp_size AS BIGINT) AS pair_weight
    FROM p a JOIN p b ON a.blk = b.blk AND a.rep < b.rep
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
    ORDER BY key1, key2
    """,
)
def entity_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler fuzzy matching for entity resolution
    (functions/strsim.py), staged the way record linkage actually
    scales: (1) EXACT-COLLAPSE first - names dedup to the distinct-
    value table (the minhash-cascade discipline; the fixture holds
    64 distinct names under its 2k-20k rows, and real catalogs are
    similarly heavy-tailed), carrying group sizes; (2) BLOCK on the
    first name token so the quadratic term is per-block over
    DISTINCT names; (3) SCORE survivors with the Arrow-batched JW
    kernel, keep pairs >= 0.85, weight each by grp_a*grp_b (the
    record-pair count it represents). The oracle is DuckDB NATIVE
    jaro_winkler_similarity - two independent Winkler
    implementations agreeing pair-by-pair and score-by-score.
    Flat across 10x data by construction: candidate count depends
    on the distinct-name vocabulary, not the row count (measured:
    identical 224-candidate set at sf0.01 and sf0.1)."""
    from etl_lens_spark.functions.strsim import jaro_winkler_udf

    jw_udf = jaro_winkler_udf()
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.min("p_partkey").alias("rep"),
            F.count(F.lit(1)).alias("grp_size"),
        )
        .withColumn("blk", F.split("p_name", " ").getItem(0))
    )
    a = names.alias("a")
    b = names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.rep") < F.col("b.rep")),
    ).select(
        F.col("a.rep").alias("key1"),
        F.col("b.rep").alias("key2"),
        F.col("a.p_name").alias("name1"),
        F.col("b.p_name").alias("name2"),
        jw_udf(F.col("a.p_name"), F.col("b.p_name")).alias("jw"),
        (F.col("a.grp_size") * F.col("b.grp_size"))
        .cast("long")
        .alias("pair_weight"),
    )
    return pairs.filter(F.col("jw") >= 0.85).orderBy("key1", "key2")


@query(
    "text_gram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    tri AS (
        SELECT doc_id,
               w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
        FROM toks,
             LATERAL unnest(generate_series(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 3
    ),
    dtri AS (SELECT DISTINCT doc_id, g FROM tri),
    marked AS (
        SELECT doc_id, g,
               MIN(doc_id) OVER (PARTITION BY g) AS first_doc
        FROM dtri
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE first_doc = doc_id)
                AS BIGINT) AS n_novel,
           CAST(COUNT(*) FILTER (WHERE first_doc = doc_id) * 10000
                // COUNT(*) AS BIGINT) AS novelty_myriad
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve (dataset-curation signal: how much of
    each document's trigram vocabulary appears for the FIRST time in
    corpus order — falling novelty across doc ids measures how fast
    a crawl saturates). A trigram is novel in the earliest doc_id
    containing it; per-doc novel fraction in per-myriad integer
    arithmetic. Complements contamination (eval-set grams) and
    repetition (within-doc grams) with the across-corpus-order view.

    Scale: row-local gram construction and dedup, ONE gram-keyed
    shuffle (window min rides it), one doc-keyed aggregate. At
    100 TB grams travel as xxhash64 longs instead of strings (the
    contamination-pipeline recipe); string grams here keep the
    oracle cross-engine."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    tri = docs.filter(F.size("w") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3),"
                " i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))"
            )
        ).alias("g"),
    )
    dtri = tri.distinct()
    marked = dtri.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("g"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 10000 div n_grams").alias(
                "novelty_myriad"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "entity_levenshtein_pairs",
    oracle="""
    WITH n AS (
        SELECT p_name, MIN(p_partkey) AS rep, COUNT(*) AS grp_size
        FROM part GROUP BY p_name
    )
    SELECT a.rep AS key1, b.rep AS key2,
           a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
           CAST(a.grp_size * b.grp_size AS BIGINT) AS pair_weight
    FROM n a JOIN n b
      ON a.rep < b.rep
     AND abs(len(a.p_name) - len(b.p_name)) <= 3
     AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY key1, key2
    """,
)
def entity_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity matching — the JVM-native companion of
    the Jaro-Winkler query: Spark's built-in ``levenshtein(l, r,
    threshold)`` (codegen'd, early-exit once the running distance
    exceeds the bound) scored against DuckDB's independent native
    kernel, pair by pair. Staging: (1) exact-collapse names to the
    distinct-value table with group sizes; (2) LOSSLESS length-band
    blocking — bucket = len div (k+1), candidates join on
    {p−1, p, p+1}, which provably covers every pair with
    |len(a)−len(b)| ≤ k; (3) the threshold kernel prunes survivors.
    At 100 TB the quadratic term is per-length-band over DISTINCT
    names (vocabulary-bounded, not row-bounded), the same discipline
    as the JW and minhash cascades. The length pre-filter is cheap
    algebra the optimizer evaluates before the O(n·m) kernel."""
    k = 3
    band = k + 1
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.min("p_partkey").alias("rep"),
            F.count(F.lit(1)).alias("grp_size"),
        )
        .withColumn("ln", F.length("p_name"))
        .withColumn("bkt", (F.col("ln") / band).cast("long"))
    )
    # probe side fans out to its bucket neighborhood; build side
    # stays single-bucket, so the equi-join is lossless for |Δlen|≤k
    probe = names.withColumn(
        "jbkt",
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ),
    )
    a = probe.alias("a")
    b = names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.jbkt") == F.col("b.bkt"))
        & (F.col("a.rep") < F.col("b.rep"))
        & (
            F.abs(F.col("a.ln") - F.col("b.ln")) <= k
        ),
    ).select(
        F.col("a.rep").alias("key1"),
        F.col("b.rep").alias("key2"),
        F.col("a.p_name").alias("name1"),
        F.col("b.p_name").alias("name2"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), k).alias(
            "lev_t"
        ),
        (F.col("a.grp_size") * F.col("b.grp_size"))
        .cast("long")
        .alias("pair_weight"),
    )
    return (
        pairs.filter(F.col("lev_t") >= 0)  # threshold form: -1 = over
        .select(
            "key1",
            "key2",
            "name1",
            "name2",
            F.col("lev_t").cast("long").alias("lev"),
            "pair_weight",
        )
        .orderBy("key1", "key2")
    )


@query(
    "text_bm25_search",
    oracle="""
    WITH q(term) AS (VALUES ('spark'), ('join'), ('filter')),
    toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    g AS (SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM dl),
    tf AS (
        SELECT t.doc_id, t.w AS term, COUNT(*) AS tf
        FROM toks t JOIN q ON t.w = q.term
        GROUP BY t.doc_id, t.w
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               SUM(
                 ln((g.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * dl.dlen / g.avgdl))
               ) AS score,
               COUNT(*) AS n_terms_hit
        FROM tf
        JOIN df ON tf.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN g
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones; k1 = 1.2,
    b = 0.75) — the IR scoring pass behind query-targeted corpus
    curation (pull the documents most relevant to a probe query for
    boosting or audit). All JVM expressions: tokenize once, keep ONLY
    query-term postings before any shuffle (the filter is the inverted
    -index discipline — postings for three terms cross the wire, not
    the corpus), per-term df + corpus stats reduce to broadcast-sized
    frames, and the final score is one per-doc sum over ≤ |q| rows.
    Top-k by exact score with doc_id tiebreak; the oracle recomputes
    the identical formula relationally — two engines agreeing on ln,
    the saturation term, and the length normalization per pair.

    At 100 TB: the postings filter bounds every exchange by query
    vocabulary, df/avgdl are O(|q|) and O(1) broadcasts, and the
    top-k is TakeOrdered — no global sort materializes."""
    terms = ["spark", "join", "filter"]
    k1, b = 1.2, 0.75
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("w"),
        )
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    g = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dlen").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("w").isin(terms))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dlen") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            F.round("score", 6).alias("bm25"),
            F.col("n_terms_hit").cast("long"),
        )
    )


def _phash_smooth_image(seed: int, h: int = 48, w: int = 64):
    """Deterministic low-frequency test pattern: a sum of seeded
    sinusoids — structured like a photograph (energy concentrated in
    low DCT frequencies), unlike iid noise which pHash by design
    cannot distinguish."""
    import numpy as np

    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w))
    for _ in range(4):
        fy, fx = rng.uniform(0.02, 0.2, 2)
        ph = rng.uniform(0, 6.28)
        img += rng.uniform(0.5, 1.5) * np.sin(fy * y + fx * x + ph)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return img.astype(np.uint8)


def _synth_phash_bmp(it):
    """Real BMP bytes per doc; docs with doc_id % 10 == 1 are PLANTED
    near-duplicates of doc_id − 1 (pixel noise ± 8 + brightness +3 —
    the re-encode/re-crop jitter class pHash exists to absorb)."""
    import numpy as np
    import pandas as pd

    from etl_lens_spark.multimodal.codecs import encode_bmp

    for pdf in it:
        payloads = []
        for d in pdf["doc_id"]:
            d = int(d)
            base = d - 1 if d % 10 == 1 else d
            gray = _phash_smooth_image(base)
            if d % 10 == 1:
                rng = np.random.default_rng(10_000 + d)
                gray = np.clip(
                    gray.astype(int)
                    + rng.integers(-8, 9, gray.shape)
                    + 3,
                    0,
                    255,
                ).astype(np.uint8)
            payloads.append(encode_bmp(np.stack([gray] * 3, axis=-1)))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _phash_bmp_batches(it):
    import numpy as np
    import pandas as pd

    from etl_lens_spark.multimodal.codecs import decode_bmp
    from etl_lens_spark.multimodal.phash import phash_chunks

    for pdf in it:
        rows = []
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr, _ = decode_bmp(bytes(payload))
            gray = arr[:, :, 0]  # synthetic images are channel-equal
            rows.append((int(d), phash_chunks(gray)))
        yield pd.DataFrame(rows, columns=["doc_id", "sig"])


@query("dedup_image_phash")
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate detection — the multimodal member of the
    near-dup family (text: minhash/simhash; embeddings: LSH): 64-bit
    DCT perceptual hashes (multimodal/phash.py) over genuinely
    decoded BMP bytes, then the simhash pigeonhole at byte
    granularity — the 8 chunk values ARE the signature, so blocking
    candidates join on (chunk_id, chunk_val) and Hamming distance is
    the JVM expression Σ bit_count(a XOR b), no bit arrays on the
    wire. 8 chunks make the blocking COMPLETE for Hamming ≤ 7
    (pigeonhole: 8 differing bits can touch at most 8 chunks, ≤ 7
    leaves one chunk exact).

    Rows-only by design (DCT + median thresholding are not
    SQL-expressible); the contract is pinned in tests/test_phash.py:
    planted near-dup pairs (doc_id % 10 == 1 ↔ doc_id − 1) are
    recovered at ≥ 0.85 recall (the misses are TRUE distances > 7 —
    a DCT coefficient at the median flips under any jitter; the
    blocking itself is complete for ≤ 7), and every reported pair's
    Hamming matches the numpy reference bit-for-bit — including
    genuine cross-pattern collisions, which a perceptual hash is
    SUPPOSED to report when two patterns share low-frequency
    structure.

    Scale: synth/decode/hash are chained no-shuffle mapInPandas; the
    single shuffle is the chunk equi-join whose fan-out is 8 rows per
    image; candidate pairs are bounded by bucket collisions, not n²
    (the same guarantee as the minhash banding)."""
    docs = parallelize_compute(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    with_payload = docs.mapInPandas(
        _synth_phash_bmp, "doc_id long, payload binary"
    )
    sigs = with_payload.mapInPandas(
        _phash_bmp_batches, "doc_id long, sig array<int>"
    )
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.posexplode("sig").alias("chunk_id", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    ham = F.aggregate(
        F.zip_with(
            "sig_a",
            "sig_b",
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= 7)
        .select("id1", "id2", "hamming")
        .orderBy("id1", "id2")
    )


@query(
    "mix_temperature_alpha",
    oracle="""
    WITH per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                 AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS total_tokens FROM per_src),
    shares AS (
        SELECT p.source, p.n_docs, p.n_tokens,
               p.n_tokens / t.total_tokens AS nat_share,
               pow(p.n_tokens / t.total_tokens, 0.5) AS raw_alpha
        FROM per_src p CROSS JOIN tot t
    ),
    norm AS (SELECT SUM(raw_alpha) AS z FROM shares)
    SELECT s.source, s.n_docs, s.n_tokens,
           ROUND(s.nat_share, 6) AS nat_share,
           ROUND(s.raw_alpha / n.z, 6) AS alpha_share,
           ROUND(LEAST(1.0,
                 (s.raw_alpha / n.z) * 50000.0 / s.n_tokens), 6)
             AS sample_rate,
           CAST(ROUND(LEAST(1.0,
                 (s.raw_alpha / n.z) * 50000.0 / s.n_tokens)
                 * s.n_tokens, 0) AS BIGINT) AS expected_tokens
    FROM shares s CROSS JOIN norm n
    ORDER BY s.source
    """,
)
def mix_temperature_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual/多-source
    α-sampling rule: p_i ∝ share_i^α with α = 0.5) — the step BEFORE
    mix_sources_weighted's fixed rates: compute each source's natural
    token share, flatten it through the temperature, renormalize, and
    convert to a per-source sampling rate against a 50k-token budget
    (capped at 1 — a small source can't yield more than it has; its
    surplus is the classic α-sampling overflow the budget owner
    redistributes). Everything reduces map-side to one row per
    source; the broadcast-sized share table then gets two scalar
    cross joins — zero large shuffles at any scale.

    The oracle recomputes the whole chain (token counts, pow, cap,
    rounding) relationally — cross-engine agreement on the float
    pipeline to 6 decimals."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    tot = per_src.agg(F.sum("n_tokens").alias("total_tokens"))
    shares = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("total_tokens")).alias("nat_share"),
        F.pow(
            F.col("n_tokens") / F.col("total_tokens"), F.lit(0.5)
        ).alias("raw_alpha"),
    )
    norm = shares.agg(F.sum("raw_alpha").alias("z"))
    rate = F.least(
        F.lit(1.0),
        (F.col("raw_alpha") / F.col("z")) * 50000.0 / F.col("n_tokens"),
    )
    return (
        shares.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("nat_share", 6).alias("nat_share"),
            F.round(F.col("raw_alpha") / F.col("z"), 6).alias(
                "alpha_share"
            ),
            F.round(rate, 6).alias("sample_rate"),
            F.round(rate * F.col("n_tokens"), 0)
            .cast("long")
            .alias("expected_tokens"),
        )
        .orderBy("source")
    )


@query(
    "text_gopher_rules",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS w,
               len(text) AS nchr
        FROM documents
    ),
    sig AS (
        SELECT doc_id, source,
               len(w) AS n_words,
               (nchr - len(w) + 1.0) / len(w) AS mean_wlen,
               len(list_filter(w, x -> x ~ '^[a-z]+$')) AS n_alpha,
               len(list_filter(w,
                   x -> list_contains(
                       ['the','a','of','to','and','is','in'], x)))
                 AS n_stop
        FROM t
    ),
    rules AS (
        SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
               CAST(n_words BETWEEN 20 AND 100000 AS BIGINT)
                 AS ok_word_count,
               CAST(mean_wlen BETWEEN 2.0 AND 10.0 AS BIGINT)
                 AS ok_mean_wlen,
               CAST(n_alpha >= 0.8 * n_words AS BIGINT) AS ok_alpha,
               CAST(n_stop >= 2 AS BIGINT) AS ok_stopwords
        FROM sig
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ok_word_count) AS BIGINT) AS pass_word_count,
           CAST(SUM(ok_mean_wlen) AS BIGINT) AS pass_mean_wlen,
           CAST(SUM(ok_alpha) AS BIGINT) AS pass_alpha,
           CAST(SUM(ok_stopwords) AS BIGINT) AS pass_stopwords,
           CAST(SUM(ok_word_count * ok_mean_wlen * ok_alpha
                    * ok_stopwords) AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN ok_word_count * ok_mean_wlen * ok_alpha
                              * ok_stopwords = 1
                         THEN n_words ELSE 0 END) AS BIGINT)
             AS kept_words
    FROM rules
    GROUP BY source
    ORDER BY source
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality GATES (Rae et al. 2021 §A1.1,
    adapted to the fixture's vocabulary): word-count bounds, mean
    word length bounds, alphabetic-word fraction, minimum stopword
    hits — evaluated as BOOLEAN RULES with a per-source pass/keep
    report, which is the artifact a curation run actually reviews
    (text_quality_signals emits the raw ratios; this emits the
    decisions and the yield). Row-local signal extraction in pure
    JVM expressions, one groupBy(source) reduction — the corpus
    audit costs one shuffle of |sources| rows regardless of scale.
    The oracle recomputes every rule relationally, so the regex
    class, the stopword list, and the AND-fold all agree
    cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_words = F.size(w)
    mean_wlen = (F.length("text") - n_words + 1.0) / n_words
    n_alpha = F.size(
        F.filter(w, lambda x: x.rlike("^[a-z]+$"))
    )
    n_stop = F.size(
        F.filter(
            w,
            lambda x: x.isin("the", "a", "of", "to", "and", "is", "in"),
        )
    )
    sig = docs.select(
        "source",
        n_words.cast("long").alias("n_words"),
        n_words.between(20, 100000).cast("long").alias("ok_word_count"),
        mean_wlen.between(2.0, 10.0).cast("long").alias("ok_mean_wlen"),
        (n_alpha >= 0.8 * n_words).cast("long").alias("ok_alpha"),
        (n_stop >= 2).cast("long").alias("ok_stopwords"),
    )
    keep = (
        F.col("ok_word_count")
        * F.col("ok_mean_wlen")
        * F.col("ok_alpha")
        * F.col("ok_stopwords")
    )
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ok_word_count").cast("long").alias("pass_word_count"),
            F.sum("ok_mean_wlen").cast("long").alias("pass_mean_wlen"),
            F.sum("ok_alpha").cast("long").alias("pass_alpha"),
            F.sum("ok_stopwords").cast("long").alias("pass_stopwords"),
            F.sum(keep).cast("long").alias("n_keep"),
            F.sum(
                F.when(keep == 1, F.col("n_words")).otherwise(0)
            )
            .cast("long")
            .alias("kept_words"),
        )
        .orderBy("source")
    )


@query(
    "entity_survivorship_golden",
    oracle="""
    WITH RECURSIVE
    n AS (
        SELECT p_name, MIN(p_partkey) AS rep, COUNT(*) AS grp_size
        FROM part GROUP BY p_name
    ),
    pairs AS (
        SELECT a.rep AS k1, b.rep AS k2
        FROM n a JOIN n b
          ON a.rep < b.rep
         AND abs(len(a.p_name) - len(b.p_name)) <= 3
         AND levenshtein(a.p_name, b.p_name) <= 3
    ),
    edges AS (
        SELECT k1 AS u, k2 AS v FROM pairs
        UNION ALL
        SELECT k2 AS u, k1 AS v FROM pairs
    ),
    reach(src, node) AS (
        SELECT rep, rep FROM n
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
    ),
    cc AS (
        SELECT src AS rep, MIN(node) AS component
        FROM reach GROUP BY src
    ),
    members AS (
        SELECT cc.component, n.p_name, n.rep, n.grp_size,
               row_number() OVER (
                   PARTITION BY cc.component
                   ORDER BY n.grp_size DESC, n.p_name
               ) AS pick
        FROM n JOIN cc ON n.rep = cc.rep
    )
    SELECT component AS canonical_key,
           MAX(CASE WHEN pick = 1 THEN p_name END) AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(SUM(grp_size) AS BIGINT) AS total_records,
           CAST(MAX(rep) AS BIGINT) AS max_variant_key
    FROM members
    GROUP BY component
    ORDER BY component
    """,
)
def entity_survivorship_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE entity-resolution flow, ending in golden records:
    fuzzy pairs (threshold Levenshtein over exact-collapsed distinct
    names with the lossless length banding) → connected components
    (min-label propagation + pointer jumping, O(log d) shuffles) →
    SURVIVORSHIP — per duplicate cluster, elect the canonical
    spelling by the most-records-then-lexicographic rule via ONE
    ``min_by(struct(-count, name))`` aggregate (no per-cluster sort),
    and roll up variant/record counts. This is the step record-
    linkage systems call merge/survivorship: the pairs say WHO
    matches, this says what the master row IS.

    The oracle rebuilds everything independently — DuckDB's native
    levenshtein, a WITH RECURSIVE transitive closure, and a window
    re-election — so the banding, the propagation fixpoint, and the
    election rule are each cross-checked. Scale: vocabulary-bounded
    like every cascade stage; the CC loop is the O(log d) machinery
    already proven on the embedding graph."""
    from etl_lens_spark.dedup import embedding as emb_dedup

    k = 3
    band = k + 1
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.min("p_partkey").alias("rep"),
            F.count(F.lit(1)).alias("grp_size"),
        )
        .withColumn("ln", F.length("p_name"))
        .withColumn("bkt", (F.col("ln") / band).cast("long"))
    )
    probe = names.withColumn(
        "jbkt",
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ),
    )
    a = probe.alias("a")
    b = names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.jbkt") == F.col("b.bkt"))
            & (F.col("a.rep") < F.col("b.rep"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= k),
        )
        .filter(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), k) >= 0
        )
        .select(
            F.col("a.rep").alias("src"), F.col("b.rep").alias("dst")
        )
    )
    nodes = names.select(F.col("rep").alias("node"))
    cc = emb_dedup.connected_components(nodes, pairs)
    members = names.join(cc, names.rep == cc.node).select(
        "component", "p_name", "rep", "grp_size"
    )
    return (
        members.groupBy("component")
        .agg(
            F.min_by(
                "p_name", F.struct(-F.col("grp_size"), F.col("p_name"))
            ).alias("canonical_name"),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.sum("grp_size").cast("long").alias("total_records"),
            F.max("rep").cast("long").alias("max_variant_key"),
        )
        .select(
            F.col("component").alias("canonical_key"),
            "canonical_name",
            "n_variants",
            "total_records",
            "max_variant_key",
        )
        .orderBy("canonical_key")
    )


@query(
    "text_hashing_trick_vectors",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 200
    ),
    dims AS (
        SELECT doc_id,
               ('0x' || substring(md5('feat' || tok), 1, 8))::BIGINT
                 % 32 AS dim,
               CASE WHEN ('0x' || substring(md5('sgn' || tok), 1, 8))
                         ::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM toks
    ),
    vec AS (
        SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS w
        FROM dims GROUP BY doc_id, dim
    ),
    norms AS (
        SELECT doc_id, sqrt(SUM(CAST(w AS DOUBLE) * w)) AS nrm
        FROM vec GROUP BY doc_id
    )
    SELECT v.doc_id, v.dim, v.w,
           ROUND(v.w / n.nrm, 6) AS w_unit
    FROM vec v JOIN norms n ON v.doc_id = n.doc_id
    WHERE v.w <> 0
    ORDER BY v.doc_id, v.dim
    """,
)
def text_hashing_trick_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the 'hashing trick', Weinberger et al. 2009):
    embed text into a fixed 32-dim space with NO vocabulary — each
    token hashes to a dimension, a second independent hash supplies a
    ±1 sign (the variance-killing trick that makes collisions cancel
    in expectation), and the vector is the signed count, L2
    normalized. This is the embedding-free bridge from the text
    family to the vector family: downstream cosine ANN / k-means /
    SemDeDup run unchanged on these exactly as on model embeddings —
    with zero training and zero vocabulary state, which is what makes
    it viable as a FIRST-PASS featurizer at 100 TB (stateless,
    row-local, one groupBy(doc, dim) with map-side combine; the
    output is sparse (dim, weight) rows, never dense arrays on the
    wire).

    Both hashes are md5-derived with distinct salts so the DuckDB
    oracle replays them bit-for-bit — the whole vectorizer
    (tokenize, dim map, sign map, signed sum, L2 norm) is
    cross-engine-pinned including zero-cancellation rows being
    dropped."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
    )
    md5i = lambda salt, c: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(salt), c).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    dims = toks.select(
        "doc_id",
        (md5i("feat", F.col("tok")) % 32).alias("dim"),
        F.when(md5i("sgn", F.col("tok")) % 2 == 0, 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    vec = (
        dims.groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("long").alias("w"))
        .filter(F.col("w") != 0)
    )
    norms = vec.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w").cast("double") * F.col("w"))).alias("nrm")
    )
    return (
        vec.join(norms, "doc_id")
        .select(
            "doc_id",
            "dim",
            "w",
            F.round(F.col("w") / F.col("nrm"), 6).alias("w_unit"),
        )
        .orderBy("doc_id", "dim")
    )


@query(
    "spmm_hashed_projection",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 200
    ),
    vec AS (
        SELECT doc_id,
               ('0x' || substring(md5('feat' || tok), 1, 8))::BIGINT
                 % 32 AS dim,
               CAST(SUM(CASE WHEN ('0x' || substring(md5('sgn' || tok),
                        1, 8))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END) AS BIGINT) AS w
        FROM toks GROUP BY doc_id, dim
    ),
    r AS (
        SELECT d.d AS dim, j.j,
               CASE WHEN ('0x' || substring(md5('proj' || d.d || '_'
                        || j.j), 1, 8))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS rv
        FROM (SELECT unnest(range(0, 32)) AS d) d
        CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
    )
    SELECT v.doc_id, r.j,
           CAST(SUM(v.w * r.rv) AS BIGINT) AS z
    FROM vec v JOIN r ON v.dim = r.dim
    WHERE v.w <> 0
    GROUP BY v.doc_id, r.j
    ORDER BY v.doc_id, r.j
    """,
)
def spmm_hashed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse matrix × dense matrix as RELATIONAL ALGEBRA: the
    hashing-trick document vectors (sparse (doc, dim, w) triples)
    multiplied by a deterministic ±1 random-projection matrix
    (32 → 8, sign-hash generated — the Achlioptas construction) via
    join-on-dim + groupBy(doc, j) sum. This is the SpMM shape every
    engine-native ML pipeline reduces to: no UDF, no dense arrays on
    the wire, the projection matrix is a 256-row broadcast, and the
    whole multiply is one shuffle of the SPARSE triples — integer
    end-to-end, so the oracle pins it exactly (DuckDB replays both
    hash constructions bit-for-bit).

    At 100 TB the same plan stands: n·nnz triples join a broadcast
    d×k matrix; output is n·k — the bound every embedding-projection
    job has anyway."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
    )
    md5i = lambda salt, c: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(F.lit(salt), c).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    vec = (
        toks.select(
            "doc_id",
            (md5i("feat", F.col("tok")) % 32).alias("dim"),
            F.when(md5i("sgn", F.col("tok")) % 2 == 0, 1)
            .otherwise(-1)
            .alias("sgn"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("long").alias("w"))
        .filter(F.col("w") != 0)
    )
    r = (
        spark.range(32)
        .withColumnRenamed("id", "dim")
        .crossJoin(spark.range(8).withColumnRenamed("id", "j"))
        .select(
            "dim",
            "j",
            F.when(
                md5i(
                    "proj",
                    F.concat(
                        F.col("dim").cast("string"),
                        F.lit("_"),
                        F.col("j").cast("string"),
                    ),
                )
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("rv"),
        )
    )
    return (
        vec.join(F.broadcast(r), "dim")
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("w") * F.col("rv")).cast("long").alias("z"))
        .orderBy("doc_id", "j")
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY w),
    ranked AS (
        SELECT w, f,
               row_number() OVER (ORDER BY f DESC, w) AS r
        FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           ROUND(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           ROUND(regr_r2(ln(f), ln(r)), 6) AS zipf_r2,
           CAST(MAX(CASE WHEN r = 1 THEN f END) AS BIGINT) AS top_freq
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit — the corpus-linguistics health check a
    training-data audit runs: regress ln(frequency) on ln(rank) over
    the vocabulary; natural language sits near slope −1 with high
    R², while synthetic or templated corpora (like this fixture's
    word soup — visibly flatter) betray themselves immediately. The
    vocabulary ranking uses the zero-single-reducer global-rank
    operator (the vocab table is small HERE, but rank-over-frequency
    at web scale is exactly the distributed-rank shape), and the fit
    itself is Spark's built-in ``regr_slope``/``regr_r2`` aggregates
    against DuckDB's independent implementations — two engines
    agreeing on the sufficient-statistics regression to 6 decimals."""
    from etl_lens_spark.operators.prefix import ordered_global_rank

    freq = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    ranked = ordered_global_rank(
        freq, [F.desc("f"), F.asc("w")], "r"
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.round(
            F.regr_slope(F.log(F.col("f")), F.log(F.col("r"))), 6
        ).alias("zipf_slope"),
        F.round(
            F.regr_r2(F.log(F.col("f")), F.log(F.col("r"))), 6
        ).alias("zipf_r2"),
        F.max(F.when(F.col("r") == 1, F.col("f")))
        .cast("long")
        .alias("top_freq"),
    )


@query("docs_mmr_diverse_sample")
def docs_mmr_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE selection — the diversity-aware
    final stage of retrieval/curation (pick k items balancing
    relevance against redundancy: score = λ·rel − (1−λ)·max
    similarity to anything already picked). The candidate pool is
    ALWAYS a pre-reduced retrieval result (here: the 60 longest
    documents as hashed 32-dim unit vectors, relevance = cosine to
    the pool centroid), so the greedy loop runs k tiny
    broadcast-scored passes over a bounded frame — the structure is
    k × O(|candidates|), never O(corpus); at 100 TB only the
    retrieval stage upstream sees the corpus. Rows-only (greedy
    argmax chains aren't SQL); tests/test_npipe5_mmr.py pins the
    selection against an independent numpy reference and the
    diversity property itself (MMR's mean pairwise similarity must
    beat top-k-by-relevance's)."""
    import numpy as np

    lam, k_sel = 0.7, 10
    docs = load_table(spark, sf_dir, "documents")
    cand = (
        docs.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .limit(60)
        .select("doc_id", "text")
    )

    def vecs(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                v = np.zeros(32)
                for tok in str(t).split(" "):
                    h = int(
                        hashlib.md5(b"feat" + tok.encode()).hexdigest()[:8],
                        16,
                    )
                    s = int(
                        hashlib.md5(b"sgn" + tok.encode()).hexdigest()[:8],
                        16,
                    )
                    v[h % 32] += 1 if s % 2 == 0 else -1
                n = np.linalg.norm(v)
                rows.append((int(d), (v / n if n > 0 else v).tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "v"])

    cv = cand.mapInPandas(vecs, "doc_id long, v array<double>").collect()
    ids = [r["doc_id"] for r in cv]
    X = np.array([r["v"] for r in cv])
    q = X.mean(axis=0)
    q = q / np.linalg.norm(q)
    rel = X @ q
    picked: list[int] = []
    out_rows = []
    for step in range(k_sel):
        if picked:
            red = (X @ X[picked].T).max(axis=1)
        else:
            red = np.zeros(len(ids))
        score = lam * rel - (1 - lam) * red
        score[picked] = -np.inf
        # deterministic tie-break on doc_id
        best = min(
            range(len(ids)),
            key=lambda i: (-round(float(score[i]), 12), ids[i]),
        )
        picked.append(best)
        out_rows.append(
            (
                step,
                ids[best],
                round(float(rel[best]), 6),
                round(float(red[best]), 6),
                round(float(score[best]), 6),
            )
        )
    return spark.createDataFrame(
        out_rows,
        "step long, doc_id long, relevance double, redundancy double, "
        "mmr_score double",
    )


@query("dedup_image_pipeline_keep_list")
def dedup_image_pipeline_keep_list(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END image dedup — the multimodal mirror of
    dedup_pipeline_keep_list's text flow: real BMP bytes → pHash
    signatures → pigeonhole candidate pairs (Hamming ≤ 7) →
    connected components over the near-dup graph → per-cluster
    winner election (min doc_id) → the KEEP LIST with per-doc
    disposition. Every stage is the already-tested machinery
    (codecs, phash, the CC operator); this query pins their
    COMPOSITION: planted near-dups (doc_id % 10 == 1 duplicates
    doc_id − 1) resolve to kept=0 with the base image as winner at
    the SAME ≥ 0.85 recall the pair layer guarantees (misses are
    true pHash distances > 7 — the median-boundary tail documented
    on dedup_image_phash), and keep + drop lists partition the
    corpus exactly. Rows-only (DCT); tests/test_phash.py pins both
    the pair layer and this disposition contract.

    Scale: the same cascade shape as text dedup — signatures shuffle,
    media bytes never do; CC is the O(log d) pointer-jumping loop."""
    from etl_lens_spark.dedup import embedding as emb_dedup

    docs = parallelize_compute(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    with_payload = docs.mapInPandas(
        _synth_phash_bmp, "doc_id long, payload binary"
    )
    sigs = with_payload.mapInPandas(
        _phash_bmp_batches, "doc_id long, sig array<int>"
    )
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.posexplode("sig").alias("chunk_id", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.aggregate(
        F.zip_with(
            "sig_a",
            "sig_b",
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["src", "dst"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= 7)
        .select("src", "dst")
    )
    nodes = sigs.select(F.col("doc_id").alias("node"))
    cc = emb_dedup.connected_components(nodes, pairs)
    winners = cc.groupBy("component").agg(
        F.min("node").alias("winner")
    )
    return (
        cc.join(winners, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("winner"),
            (F.col("node") == F.col("winner"))
            .cast("long")
            .alias("kept"),
            F.col("component").cast("long").alias("cluster_id"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_word_burstiness",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    wc AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    per_doc AS (
        SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM wc GROUP BY w, doc_id
    ),
    stats AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(c) AS BIGINT) AS tf,
               CAST(SUM(c * c) AS BIGINT) AS tf2
        FROM per_doc GROUP BY w
    )
    SELECT s.w,
           s.df, s.tf,
           ROUND(CAST(s.tf AS DOUBLE) / n.n_docs, 6) AS mean_c,
           ROUND((CAST(s.tf2 AS DOUBLE) / n.n_docs
                  - POWER(CAST(s.tf AS DOUBLE) / n.n_docs, 2))
                 / (CAST(s.tf AS DOUBLE) / n.n_docs), 6)
             AS burstiness
    FROM stats s CROSS JOIN n
    WHERE s.df >= 10
    ORDER BY s.w
    """,
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word BURSTINESS (Church & Gale's variance-to-mean over
    documents) — the corpus statistic frequency can't see: a content
    word clumps (appears many times in few documents, ratio ≫ 1)
    while a function word spreads Poisson-like (ratio ≈ 1), and the
    distinction drives stopword induction, keyword scoring, and
    contamination triage. The subtlety is the ZEROS: variance is
    over ALL documents including those where the word never appears
    — handled without densifying by the sufficient-statistics
    identity (Σc, Σc² over present docs; absent docs contribute 0 to
    both, n_docs broadcast as the denominator). Two aggregations
    over the sparse (word, doc) frame; never a word × doc matrix."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = per_doc.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("tf2"),
    )
    mean_c = F.col("tf").cast("double") / F.col("n_docs")
    var_c = (
        F.col("tf2").cast("double") / F.col("n_docs")
        - mean_c * mean_c
    )
    return (
        stats.crossJoin(F.broadcast(n))
        .filter(F.col("df") >= 10)
        .select(
            "w",
            "df",
            "tf",
            F.round(mean_c, 6).alias("mean_c"),
            F.round(var_c / mean_c, 6).alias("burstiness"),
        )
        .orderBy("w")
    )


@query(
    "text_phrase_search",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t
        FROM documents
    ),
    post AS (
        SELECT doc_id, i AS pos, t[i] AS term
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
        WHERE t[i] IN ('big', 'table', 'scan')
    ),
    hits AS (
        SELECT p1.doc_id, p1.pos AS start_pos
        FROM post p1
        JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
        JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
        WHERE p1.term = 'big' AND p2.term = 'table' AND p3.term = 'scan'
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(start_pos) AS BIGINT) AS first_pos
    FROM hits
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("big table scan") over a POSITIONAL
    inverted index — the IR primitive BM25's bag-of-words scoring
    can't express: adjacency joins on (doc, pos+1) chain the phrase
    terms in order. Completes the retrieval family next to
    text_bm25_search (ranked) and text_contamination_overlap
    (n-gram containment).

    Inverted-index discipline, same as BM25: postings are filtered
    to the THREE query terms before anything shuffles — the corpus
    stays columnar in the scan and only query-term (doc, pos) pairs
    cross the wire; the adjacency self-joins are equi-joins on the
    well-distributed doc key. Positions are 1-based in both engines
    (Spark posexplode is 0-based and shifts by one)."""
    phrase = ["big", "table", "scan"]
    docs = parallelize_compute(load_table(spark, sf_dir, "documents"))
    post = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("p0", "term"),
        )
        .filter(F.col("term").isin(phrase))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "term")
    )
    p1 = post.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("start_pos")
    )
    p2 = post.filter(F.col("term") == phrase[1]).select(
        "doc_id", (F.col("pos") - 1).alias("start_pos")
    )
    p3 = post.filter(F.col("term") == phrase[2]).select(
        "doc_id", (F.col("pos") - 2).alias("start_pos")
    )
    hits = p1.join(p2, ["doc_id", "start_pos"]).join(
        p3, ["doc_id", "start_pos"]
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("start_pos").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )
