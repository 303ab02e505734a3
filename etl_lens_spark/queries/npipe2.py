"""Second tranche of [N] training-data-pipeline queries (SURVEY §2.3):
repetition quality signals, benchmark-contamination detection, sliding
chunking, PII redaction, URL canonicalization + dedup.

The PII and URL queries synthesize their dirty inputs deterministically
from fixture columns (customer names / doc ids) inside the query —
the fixture corpus itself contains no PII or URLs, and both engines
build the identical input expression, so the oracle still checks the
*operator* (the redaction / normalization chain) bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.text import pipeline as tp

_TOKS_SQL = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"


@query(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    g2 AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                             for i in range(1, len(t))]) AS g
      FROM toks
    ),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
    s2 AS (
      SELECT doc_id,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top2_frac,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) /
             CAST(SUM(c) AS DOUBLE) AS dup2_frac
      FROM c2 GROUP BY doc_id
    ),
    g3 AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                             for i in range(1, len(t) - 1)]) AS g
      FROM toks
    ),
    c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
    s3 AS (
      SELECT doc_id,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top3_frac,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) /
             CAST(SUM(c) AS DOUBLE) AS dup3_frac
      FROM c3 GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(top2_frac, 0.0) AS top2_frac,
           COALESCE(dup2_frac, 0.0) AS dup2_frac,
           COALESCE(top3_frac, 0.0) AS top3_frac,
           COALESCE(dup3_frac, 0.0) AS dup3_frac
    FROM documents d
    LEFT JOIN s2 ON d.doc_id = s2.doc_id
    LEFT JOIN s3 ON d.doc_id = s3.doc_id
    ORDER BY d.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (top-/duplicated-n-gram
    fractions for n=2,3) over every document — the quality gate that
    drops boilerplate and degenerate repetition before training."""
    docs = load_table(spark, sf_dir, "documents")
    return tp.repetition_signals(docs, "doc_id", "text", ns=(2, 3)).orderBy(
        "doc_id"
    )


@query(
    "text_contamination_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest([array_to_string(t[i:i+7], ' ')
                     for i in range(1, len(t) - 6)]) AS g
      FROM toks
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
    tr AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0'
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap_kgrams
    FROM tr WHERE g IN (SELECT g FROM ev)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: treat source 'src0' as the
    held-out eval corpus; count distinct 8-gram collisions from every
    other (training) document. The planted near-duplicates in the
    fixture are exactly the docs this flags."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    evalset = docs.filter(F.col("source") == "src0")
    return tp.contamination_overlap(train, evalset, "doc_id", "text", k=8).orderBy(
        "doc_id"
    )


@query(
    "docs_chunk_sliding",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
    SELECT doc_id,
           unnest([(i - 1) // 24 for i in range(1, len(t) + 1, 24)]) AS chunk_idx,
           unnest([array_to_string(t[i:i+31], ' ')
                   for i in range(1, len(t) + 1, 24)]) AS chunk_text,
           unnest([len(t[i:i+31]) for i in range(1, len(t) + 1, 24)])
               AS n_chunk_tokens
    FROM toks
    ORDER BY doc_id, chunk_idx
    """,
)
def docs_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (32-token windows, stride 24 → 8-token
    overlap): the standard pre-training/RAG segmentation. Shuffle-free
    — sequence/slice/posexplode inside one codegen stage."""
    docs = load_table(spark, sf_dir, "documents")
    return tp.chunk_sliding(docs, "doc_id", "text", 32, 24).orderBy(
        "doc_id", "chunk_idx"
    )


# deterministic dirty text: name <email> phone ip, second email for 1/3
_DIRTY_SQL = (
    "c_name || ' <' || lower(replace(c_name, '#', '.')) || '@example.org>"
    " call +1-415-' || CAST(100 + c_custkey % 900 AS VARCHAR) || '-' ||"
    " lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||"
    " ' from 10.' || CAST(c_custkey % 200 AS VARCHAR) || '.0.' ||"
    " CAST(c_custkey % 250 AS VARCHAR) ||"
    " CASE WHEN c_custkey % 3 = 0"
    "      THEN ' cc admin@corp.example.net' ELSE '' END"
)


@query(
    "pii_redact_audit",
    oracle=f"""
    WITH dirty AS (SELECT c_custkey, {_DIRTY_SQL} AS txt FROM customer)
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(txt,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}', '[EMAIL]', 'g'),
               '\\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '[PHONE]', 'g'),
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b',
               '[IPV4]', 'g') AS redacted,
           CAST(len(regexp_extract_all(txt,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(txt,
               '\\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}')) AS BIGINT)
               AS n_phone,
           CAST(len(regexp_extract_all(txt,
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b'))
               AS BIGINT) AS n_ipv4
    FROM dirty
    ORDER BY c_custkey
    """,
)
def pii_redact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction + audit counts. The dirty input is synthesized
    deterministically from customer rows (identical expression in the
    oracle) because the fixture contains no real PII; the operator
    under test is the chained class-regex redaction, which both
    engines must apply identically."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    txt = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.org> call +1-415-"),
        (F.lit(100) + k % 900).cast("string"),
        F.lit("-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (k % 200).cast("string"),
        F.lit(".0."),
        (k % 250).cast("string"),
        F.when(k % 3 == 0, F.lit(" cc admin@corp.example.net")).otherwise(
            F.lit("")
        ),
    )
    dirty = c.select("c_custkey", txt.alias("txt"))
    counts = tp.pii_counts(F.col("txt"))
    return dirty.select(
        "c_custkey",
        tp.redact_pii(F.col("txt")).alias("redacted"),
        counts["n_email"].alias("n_email"),
        counts["n_phone"].alias("n_phone"),
        counts["n_ipv4"].alias("n_ipv4"),
    ).orderBy("c_custkey")


_URL_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'https://' || source || '.example.com/docs/' ||
                  CAST(doc_id % 50 AS VARCHAR)
      WHEN 1 THEN 'HTTPS://www.' || source || '.example.com/docs/' ||
                  CAST(doc_id % 50 AS VARCHAR) || '/'
      WHEN 2 THEN 'https://' || source || '.example.com/docs/' ||
                  CAST(doc_id % 50 AS VARCHAR) ||
                  '?utm_source=feed&utm_campaign=x'
      WHEN 3 THEN 'https://' || source || '.example.com/docs/' ||
                  CAST(doc_id % 50 AS VARCHAR) || '#section-2'
      ELSE 'https://' || source || '.example.com/docs/' ||
           CAST(doc_id % 50 AS VARCHAR) || '?utm_medium=m&id=' ||
           CAST(doc_id % 3 AS VARCHAR)
    END
"""


@query(
    "url_normalize_dedup",
    oracle=f"""
    WITH urls AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    norm AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(
          lower(regexp_extract(url, '^([^/?#]*://[^/?#]*)', 1)) ||
          regexp_replace(url, '^[^/?#]*://[^/?#]*', ''),
          '://www\\.', '://', 'g'),
          '#.*$', '', 'g'),
          '&utm_[a-z]+=[^&#]*', '', 'g'),
          '\\?utm_[a-z]+=[^&#]*&', '?', 'g'),
          '\\?utm_[a-z]+=[^&#]*$', '', 'g'),
          '[?/]+$', '', 'g') AS nurl
      FROM urls
    )
    SELECT nurl, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM norm
    GROUP BY nurl
    ORDER BY nurl
    """,
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup-by-key: five deterministic messy
    variants (scheme/host case, www., trailing slash, fragment, utm
    params in every position) collapse to one canonical URL per
    (source, docgroup). The normalize chain is pure regexp_replace —
    one codegen projection, then a single count shuffle on the
    canonical key."""
    docs = load_table(spark, sf_dir, "documents")
    base = F.concat(
        F.col("source"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 50).cast("string"),
    )
    url = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("https://"), base))
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("HTTPS://www."), base, F.lit("/")),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(F.lit("https://"), base,
                     F.lit("?utm_source=feed&utm_campaign=x")),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("https://"), base, F.lit("#section-2")),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), base,
                F.lit("?utm_medium=m&id="),
                (F.col("doc_id") % 3).cast("string"),
            )
        )
    )
    return (
        docs.select("doc_id", url.alias("url"))
        .select("doc_id", tp.normalize_url(F.col("url")).alias("nurl"))
        .groupBy("nurl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("nurl")
    )


@query(
    "sample_stratified_exact_n",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY ('0x' || substring(md5('strat' ||
                             CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                            % 10000 ASC,
                            CAST(doc_id AS VARCHAR) ASC
               ) AS rk
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM ranked
    WHERE rk <= 7
    GROUP BY source
    ORDER BY source
    """,
)
def sample_stratified_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-7-docs-per-source deterministic sample
    (operators/sampling.py sample_stratified_n): hash-ordered
    row_number inside each stratum — quota-guaranteed, RNG-free, and
    partitioning-independent, verified by summing the exact kept ids
    against the oracle's identical rank."""
    from etl_lens_spark.operators.sampling import sample_stratified_n

    docs = load_table(spark, sf_dir, "documents")
    kept = sample_stratified_n(docs, "source", 7, F.col("doc_id"), "strat")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.min("doc_id").cast("long").alias("min_id"),
        )
        .orderBy("source")
    )


@query(
    "decontaminate_corpus_pipeline",
    headline=True,
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, source, text, {_TOKS_SQL} AS t, md5(text) AS fp
      FROM documents WHERE source <> 'src0'
    ),
    keepers AS (SELECT fp, MIN(doc_id) AS keeper FROM corpus GROUP BY fp),
    ev AS (
      SELECT DISTINCT unnest([array_to_string(t[i:i+7], ' ')
                              for i in range(1, len(t) - 6)]) AS g
      FROM (SELECT {_TOKS_SQL} AS t FROM documents WHERE source = 'src0')
    ),
    contam AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest([array_to_string(t[i:i+7], ' ')
                               for i in range(1, len(t) - 6)]) AS g
        FROM corpus
      ) WHERE g IN (SELECT g FROM ev)
    ),
    graded AS (
      SELECT c.source,
             CASE
               WHEN c.doc_id <> k.keeper THEN 'dup'
               WHEN len(c.t) < 20 THEN 'short'
               WHEN len(list_distinct(c.t)) * 1.0 / len(c.t) < 0.35
                 THEN 'lowdiv'
               WHEN c.doc_id IN (SELECT doc_id FROM contam)
                 THEN 'contaminated'
               ELSE 'kept'
             END AS status,
             c.doc_id
      FROM corpus c JOIN keepers k ON c.fp = k.fp
    )
    SELECT source, status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM graded
    GROUP BY source, status
    ORDER BY source, status
    """,
)
def decontaminate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation as ONE declared query: exact
    dedup (first-seen md5 representative) → length gate → lexical-
    diversity gate → benchmark-decontamination (8-gram overlap with
    the src0 eval corpus), with per-(source, status) counts and exact
    id-sums so the oracle pins every document's fate, not just
    aggregate counts. Precedence dup > short > lowdiv > contaminated.

    Plan shape at scale: fingerprint window keyed on md5 (one
    shuffle), token stats are row-local codegen, the contamination
    probe is the distinct-gram broadcast semi join — no stage touches
    text twice and nothing is quadratic. Token stats and the md5 are
    projected at SCAN time, before the fp exchange, so the shuffle
    carries only (doc_id, source, fp, n_tok, div) — at 100 TB the
    document bodies never leave their input partitions on this path
    (the contamination branch reads text separately and reduces it to
    distinct grams before ITS shuffle). The 10x clone corpus
    exercises the dup stage (zero byte-exact dups exist at sf0.01)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    evalset = docs.filter(F.col("source") == "src0")
    t = tp.ws_tokens(F.col("text"))
    w = Window.partitionBy("fp")
    contam = tp.contamination_overlap(corpus, evalset, "doc_id", "text", k=8)
    graded = (
        corpus.select(
            "doc_id",
            "source",
            F.md5(F.col("text").cast("binary")).alias("fp"),
            F.size(t).alias("n_tok"),
            (F.size(F.array_distinct(t)) / F.size(t)).alias("div"),
        )
        .withColumn("keeper", F.min("doc_id").over(w))
        .join(contam, "doc_id", "left")
        .withColumn(
            "status",
            F.when(F.col("doc_id") != F.col("keeper"), "dup")
            .when(F.col("n_tok") < 20, "short")
            .when(F.col("div") < 0.35, "lowdiv")
            .when(F.col("n_overlap_kgrams") >= 1, "contaminated")
            .otherwise("kept"),
        )
    )
    return (
        graded.groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("source", "status")
    )
