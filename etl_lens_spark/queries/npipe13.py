"""Round-11 tranche: the MAINTAINED LEXICAL RETRIEVAL INDEX family
(VERDICT r10 item 1 — the one retrieval index family still
build-once), the closed ANN re-train loop with an atomic index swap
(item 2), auto-OPTIMIZE cadence for maintainer tables (item 7), and
concurrent maintainers through logical conflict detection (item 5).

The lexical family completes the round-10 pattern: every retrieval
index in the repo — IVF cells, SRP buckets, multi-table, PQ codes,
LSH bands, and now BM25 postings + the positional phrase index — is
a lake table maintained O(delta) from its source's change feed, with
maintained ≡ rebuilt pinned in-output and the frozen-statistics
drift measured as a dial, never silent skew.

Shared algebra lives in text/lexical.py (tokenize/postings/score/
phrase — ONE definition for build-once and maintained paths) and
similarity/ivf.py; fixtures reuse npipe11's documents lake and
npipe12's embeddings lake so every incremental family sees the same
change mix. Reference analog: the reference rebuilds its catalog per
scan (src/main.cpp:255-321); the maintained-index contract is the
[N]-class replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.queries import bench_setup, query
from etl_lens_spark.sources import sinks
from etl_lens_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Maintained BM25 postings index from the CDF
# ---------------------------------------------------------------------------

_LEX_TERMS = ["spark", "join", "filter"]  # same probe vocabulary as
# text_bm25_search / rank_rrf_fusion — the two paths must stay
# comparable
_LEX_TOPK = 10
# NOT text_phrase_search's probe ("big table scan" has zero
# occurrences at sf0.01, which would make the serving check vacuous)
# — this trigram has hits in the head snapshot at every test sf
_PHRASE = ["slow", "hash", "batch"]
_RRF_TOPN = 50
_RRF_K = 60
_RRF_OUT = 20


def _docs_feeds(spark: SparkSession, dt: str):
    """(insert docs, delete ids, delete docs) from the documents
    lake's change feed — same version layout as npipe12._ann_feeds
    (v1 = insert commit, v2 = cdf delete commit)."""
    from etl_lens_spark.operators import lakelog

    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
    )
    dels = (
        lakelog.table_changes(spark, dt, 1, 2)
        .filter(F.col("_change_type") == "delete")
        .select(F.col("doc_id").alias("__gone"))
        .distinct()
    )
    return ins, dels


_BM25_ORACLE = f"""
    WITH q(term) AS (VALUES {", ".join(f"('{t}')" for t in _LEX_TERMS)}),
    seed AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
    head AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 3),
    stoks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM seed
    ),
    sdl AS (SELECT doc_id, COUNT(*) AS dlen FROM stoks GROUP BY doc_id),
    sg AS (SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM sdl),
    sdf AS (
        SELECT s.w AS term, COUNT(DISTINCT s.doc_id) AS df
        FROM stoks s JOIN q ON s.w = q.term GROUP BY s.w
    ),
    htoks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM head
    ),
    hdl AS (SELECT doc_id, COUNT(*) AS dlen FROM htoks GROUP BY doc_id),
    hg AS (SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM hdl),
    htf AS (
        SELECT t.doc_id, t.w AS term, COUNT(*) AS tf
        FROM htoks t JOIN q ON t.w = q.term
        GROUP BY t.doc_id, t.w
    ),
    hdf AS (SELECT term, COUNT(*) AS df FROM htf GROUP BY term),
    frozen AS (
        SELECT htf.doc_id,
               SUM(
                 ln((sg.n_docs - COALESCE(sdf.df, 0) + 0.5)
                    / (COALESCE(sdf.df, 0) + 0.5) + 1.0)
                 * htf.tf * (1.2 + 1.0)
                 / (htf.tf + 1.2 * (1.0 - 0.75
                                    + 0.75 * hdl.dlen / sg.avgdl))
               ) AS score
        FROM htf LEFT JOIN sdf ON htf.term = sdf.term
        JOIN hdl ON htf.doc_id = hdl.doc_id
        CROSS JOIN sg
        GROUP BY htf.doc_id
    ),
    current AS (
        SELECT htf.doc_id,
               SUM(
                 ln((hg.n_docs - COALESCE(hdf.df, 0) + 0.5)
                    / (COALESCE(hdf.df, 0) + 0.5) + 1.0)
                 * htf.tf * (1.2 + 1.0)
                 / (htf.tf + 1.2 * (1.0 - 0.75
                                    + 0.75 * hdl.dlen / hg.avgdl))
               ) AS score
        FROM htf LEFT JOIN hdf ON htf.term = hdf.term
        JOIN hdl ON htf.doc_id = hdl.doc_id
        CROSS JOIN hg
        GROUP BY htf.doc_id
    ),
    ftop AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                 AS text_rank
        FROM frozen QUALIFY text_rank <= {_LEX_TOPK}
    ),
    ctop AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
        FROM current QUALIFY rn <= {_LEX_TOPK}
    ),
    ov AS (SELECT COUNT(*) AS n FROM ftop JOIN ctop USING (doc_id))
    SELECT ftop.doc_id,
           CAST(ftop.text_rank AS BIGINT) AS text_rank,
           ROUND(ftop.score, 6) AS bm25,
           CAST(0 AS BIGINT) AS idx_missing,
           CAST(0 AS BIGINT) AS idx_extra,
           CAST(0 AS BIGINT) AS topk_missing,
           CAST(0 AS BIGINT) AS topk_extra,
           CAST(ov.n AS BIGINT) AS drift_overlap
    FROM ftop CROSS JOIN ov
    ORDER BY ftop.text_rank
"""


@query("text_bm25_incremental_cdf", headline=True, oracle=_BM25_ORACLE)
def text_bm25_incremental_cdf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL BM25 POSTINGS INDEX FROM THE CDF (VERDICT r10
    item 1) — the lexical retrieval index becomes a maintained lake
    table, the last retrieval family to get the round-10 pattern:

    - the postings lake table holds denormalized rows
      ``(term, doc_id, tf, dlen)`` (text/lexical.py data model —
      dlen rides the row because documents are immutable in the CDF,
      so serving needs no doc-length join);
    - **frozen statistics**: (n_docs, avgdl) and per-term df are
      captured from the SEED index and FIXED between re-stats — the
      exact analog of the IVF fixed-centroid contract. With stats
      frozen, a posting's score contribution is a pure function of
      the row, so maintained ≡ rebuilt is row-set equality;
    - v1 inserts: the delta docs tokenize ALONE (O(delta)) and their
      postings APPEND — the standing corpus is never re-tokenized;
    - v2 deletes: departing docs' postings leave via the shared
      lakelog.rewrite_minus_ids anti-join.

    Pins, in-output: (a) maintained postings ≡ from-scratch postings
    over the head snapshot EXACTLY on (term, doc_id, tf, dlen) —
    idx_missing = idx_extra = 0; (b) top-10 served from the
    maintained index under the frozen stats ≡ top-10 from the
    rebuilt postings under the same stats on (doc_id, rank) —
    topk_missing = topk_extra = 0; (c) the drift DIAL: drift_overlap
    counts how many of the frozen-stats top-10 survive under
    CURRENT statistics recomputed from the maintained index — the
    re-stat trigger a production deployment would threshold on. The
    oracle recomputes the entire frozen-stats ranking AND the dial
    relationally, so the scores and the drift measurement are both
    value-matched cross-engine, not just pinned constants.

    100 TB posture: maintenance is O(delta) tokenize (JVM split/
    posexplode) + append, deletes one anti-join (shardable by term
    bucket); serving filters postings to the query vocabulary before
    any shuffle — with the table clustered by term, a pruned read.
    Reference analog: the catalog rebuilt per scan,
    /root/reference/src/main.cpp:255-321 — this is the maintained
    replacement."""
    import shutil

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import _lsh_dedup_build
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.text import lexical

    dt = _lsh_dedup_build(spark, sf_dir, "ibm25_docs")
    it = sinks.scratch_path("ibm25_index")
    shutil.rmtree(it, ignore_errors=True)

    # --- seed index + FROZEN statistics (the re-stat contract)
    seed = lakelog.read_snapshot(spark, dt, 0)
    lexical.postings(seed).write.parquet(f"{it}/s0")
    lakelog.commit(it, 0, [{"add": "s0"}])
    seed_post = lakelog.read_snapshot(spark, it, 0)
    n_docs, avgdl = lexical.corpus_stats(seed_post)
    df_map = lexical.df_stats(seed_post, _LEX_TERMS)

    # --- v1 inserts: tokenize the DELTA only, append
    ins, dels = _docs_feeds(spark, dt)
    lexical.postings(ins).write.parquet(f"{it}/s1")
    lakelog.commit(it, 1, [{"add": "s1"}])

    # --- v2 deletes: postings leave by one anti-join rewrite
    dels = dels.localCheckpoint()
    lakelog.rewrite_minus_ids(spark, it, dels, "doc_id")

    maintained = lakelog.read_snapshot(spark, it).localCheckpoint()
    head = lakelog.read_snapshot(spark, dt).localCheckpoint()

    # --- audits: rebuilt postings, top-k equality, the drift dial
    rebuilt = lexical.postings(head).localCheckpoint()
    idx_missing, idx_extra = _ann_key_diff(
        maintained, rebuilt, ["term", "doc_id", "tf", "dlen"]
    )
    m_topk = lexical.bm25_topk(
        maintained, _LEX_TERMS, n_docs, avgdl, df_map, k=_LEX_TOPK
    ).localCheckpoint()
    r_topk = lexical.bm25_topk(
        rebuilt, _LEX_TERMS, n_docs, avgdl, df_map, k=_LEX_TOPK
    )
    topk_missing, topk_extra = _ann_key_diff(
        m_topk, r_topk, ["doc_id", "rank"]
    )
    cur_n, cur_avgdl = lexical.corpus_stats(maintained)
    cur_df = lexical.df_stats(maintained, _LEX_TERMS)
    c_topk = lexical.bm25_topk(
        maintained, _LEX_TERMS, cur_n, cur_avgdl, cur_df, k=_LEX_TOPK
    )
    drift_overlap = m_topk.join(c_topk, "doc_id", "left_semi").count()

    out = m_topk.select(
        "doc_id",
        F.col("rank").alias("text_rank"),
        F.round("score", 6).alias("bm25"),
        F.lit(int(idx_missing)).cast("long").alias("idx_missing"),
        F.lit(int(idx_extra)).cast("long").alias("idx_extra"),
        F.lit(int(topk_missing)).cast("long").alias("topk_missing"),
        F.lit(int(topk_extra)).cast("long").alias("topk_extra"),
        F.lit(int(drift_overlap)).cast("long").alias("drift_overlap"),
    ).orderBy("text_rank")
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@bench_setup("text_bm25_incremental_cdf")
def _bench_bm25_incremental(spark: SparkSession, sf_dir: str):
    # setup: documents lake, seed postings, frozen stats, feeds;
    # timed: the INCREMENTAL work — delta tokenize+postings, the
    # delete anti-join, and serving top-10 from the maintained
    # postings under frozen stats (the nightly cost; rebuild+audits
    # are the query's proof, not the operator)
    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import _lsh_dedup_build
    from etl_lens_spark.text import lexical

    dt = _lsh_dedup_build(spark, sf_dir, "ibm25_bench_docs")
    seed_post = lexical.postings(
        lakelog.read_snapshot(spark, dt, 0)
    ).localCheckpoint()
    n_docs, avgdl = lexical.corpus_stats(seed_post)
    df_map = lexical.df_stats(seed_post, _LEX_TERMS)
    ins, dels = _docs_feeds(spark, dt)
    ins = ins.localCheckpoint()
    dels = dels.localCheckpoint()

    def _maintained() -> DataFrame:
        delta = lexical.postings(ins)
        index = seed_post.unionByName(delta).join(
            F.broadcast(dels),
            F.col("doc_id") == F.col("__gone"),
            "left_anti",
        )
        topk = lexical.bm25_topk(
            index, _LEX_TERMS, n_docs, avgdl, df_map, k=_LEX_TOPK
        )
        return topk.agg(
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.sum(F.col("rank") * F.col("doc_id"))
            .cast("long")
            .alias("topk_checksum"),
        )

    return _maintained


# ---------------------------------------------------------------------------
# Maintained positional phrase index from the CDF
# ---------------------------------------------------------------------------

_PHRASE_ORACLE = f"""
    WITH head AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 3
    ),
    toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM head
    ),
    post AS (
        SELECT doc_id, i AS pos, t[i] AS term
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
        WHERE t[i] IN ({", ".join(f"'{w}'" for w in _PHRASE)})
    ),
    hits AS (
        SELECT p1.doc_id, p1.pos AS start_pos
        FROM post p1
        JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
        JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
        WHERE p1.term = '{_PHRASE[0]}' AND p2.term = '{_PHRASE[1]}'
          AND p3.term = '{_PHRASE[2]}'
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(start_pos) AS BIGINT) AS first_pos,
           CAST(0 AS BIGINT) AS idx_missing,
           CAST(0 AS BIGINT) AS idx_extra
    FROM hits
    GROUP BY doc_id
    ORDER BY doc_id
"""


@query("text_phrase_incremental_cdf", oracle=_PHRASE_ORACLE)
def text_phrase_incremental_cdf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maintained POSITIONAL index twin of text_bm25_incremental_cdf
    — the phrase-search index (doc_id, pos, term) as a lake table
    with the same O(delta) maintenance (delta docs tokenize alone
    and append; departing docs' rows leave via rewrite_minus_ids).
    Positions are per-document, so maintenance needs no position
    rebasing — exactly why the positional index is maintainable at
    all. Pins: maintained ≡ from-scratch positional rows over the
    head snapshot on (doc_id, pos, term); the served phrase hits
    (via text/lexical.phrase_hits — shared with the build-once
    text_phrase_search) are value-matched against the oracle's
    relational adjacency chain on a trigram that actually occurs in
    the head snapshot (non-vacuous by construction)."""
    import shutil

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import _lsh_dedup_build
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.text import lexical

    dt = _lsh_dedup_build(spark, sf_dir, "iphr_docs")
    it = sinks.scratch_path("iphr_index")
    shutil.rmtree(it, ignore_errors=True)

    seed = lakelog.read_snapshot(spark, dt, 0)
    lexical.positional_tokens(seed).write.parquet(f"{it}/s0")
    lakelog.commit(it, 0, [{"add": "s0"}])
    ins, dels = _docs_feeds(spark, dt)
    lexical.positional_tokens(ins).write.parquet(f"{it}/s1")
    lakelog.commit(it, 1, [{"add": "s1"}])
    lakelog.rewrite_minus_ids(
        spark, it, dels.localCheckpoint(), "doc_id"
    )

    maintained = lakelog.read_snapshot(spark, it).localCheckpoint()
    head = lakelog.read_snapshot(spark, dt).localCheckpoint()
    rebuilt = lexical.positional_tokens(head)
    idx_missing, idx_extra = _ann_key_diff(
        maintained, rebuilt, ["doc_id", "pos", "term"]
    )

    out = (
        lexical.phrase_hits(maintained, _PHRASE)
        .select(
            "doc_id",
            "n_occurrences",
            "first_pos",
            F.lit(int(idx_missing)).cast("long").alias("idx_missing"),
            F.lit(int(idx_extra)).cast("long").alias("idx_extra"),
        )
        .orderBy("doc_id")
    )
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# RRF served end-to-end from TWO maintained indexes (lexical + ANN)
# ---------------------------------------------------------------------------

_RRF_INC_ORACLE = f"""
    WITH q(term) AS (VALUES {", ".join(f"('{t}')" for t in _LEX_TERMS)}),
    seed AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
    head AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 3),
    stoks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM seed
    ),
    sdl AS (SELECT doc_id, COUNT(*) AS dlen FROM stoks GROUP BY doc_id),
    sg AS (SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM sdl),
    sdf AS (
        SELECT s.w AS term, COUNT(DISTINCT s.doc_id) AS df
        FROM stoks s JOIN q ON s.w = q.term GROUP BY s.w
    ),
    htoks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM head
    ),
    hdl AS (SELECT doc_id, COUNT(*) AS dlen FROM htoks GROUP BY doc_id),
    htf AS (
        SELECT t.doc_id, t.w AS term, COUNT(*) AS tf
        FROM htoks t JOIN q ON t.w = q.term
        GROUP BY t.doc_id, t.w
    ),
    scored AS (
        SELECT htf.doc_id,
               SUM(
                 ln((sg.n_docs - COALESCE(sdf.df, 0) + 0.5)
                    / (COALESCE(sdf.df, 0) + 0.5) + 1.0)
                 * htf.tf * (1.2 + 1.0)
                 / (htf.tf + 1.2 * (1.0 - 0.75
                                    + 0.75 * hdl.dlen / sg.avgdl))
               ) AS score
        FROM htf LEFT JOIN sdf ON htf.term = sdf.term
        JOIN hdl ON htf.doc_id = hdl.doc_id
        CROSS JOIN sg
        GROUP BY htf.doc_id
    ),
    tr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                 AS text_rank
        FROM scored QUALIFY text_rank <= {_RRF_TOPN}
    ),
    ehead AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 <> 3
    ),
    qv AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qe
        FROM ehead WHERE vec_id = 0
    ),
    es AS (
        SELECT e.vec_id AS doc_id,
               list_dot_product(qe, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(qe, qe))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[]))))
                 AS cs
        FROM ehead e CROSS JOIN qv
        WHERE e.vec_id <> 0
    ),
    er AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id)
                 AS emb_rank
        FROM es QUALIFY emb_rank <= {_RRF_TOPN}
    ),
    fused AS (
        SELECT COALESCE(tr.doc_id, er.doc_id) AS doc_id,
               CAST(tr.text_rank AS BIGINT) AS text_rank,
               CAST(er.emb_rank AS BIGINT) AS emb_rank,
               COALESCE(1.0 / ({_RRF_K} + tr.text_rank), 0)
               + COALESCE(1.0 / ({_RRF_K} + er.emb_rank), 0) AS rrf
        FROM tr FULL OUTER JOIN er ON tr.doc_id = er.doc_id
    )
    SELECT doc_id, text_rank, emb_rank, rrf,
           CAST(0 AS BIGINT) AS lex_idx_missing,
           CAST(0 AS BIGINT) AS lex_idx_extra,
           CAST(0 AS BIGINT) AS emb_idx_missing,
           CAST(0 AS BIGINT) AS emb_idx_extra
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_OUT}
"""


@query("rank_rrf_incremental_cdf", headline=True, oracle=_RRF_INC_ORACLE)
def rank_rrf_incremental_cdf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HYBRID RETRIEVAL FROM TWO MAINTAINED INDEXES (VERDICT r10
    item 1, second half): the rank_rrf_fusion pipeline served
    end-to-end from the maintained BM25 postings lake table (frozen
    seed statistics) AND the maintained IVF cell-index lake table —
    both fed the same CDF change mix (v1 inserts, v2 deletes), both
    pinned maintained ≡ rebuilt in-output, and the FUSED ranking
    value-matched against the oracle's relational recomputation
    (the 'fused ranking hash-matched' done-criterion).

    The embedding ranking is exact cosine over the maintained index
    rows (query = vec 0) — serving *from the maintained table*; at
    production scale the same table serves approximately through
    ivf_probe_topk's pruned cell read, which sim_ann_incremental_cdf
    pins separately. Fusion itself is the shared
    similarity/fusion.rrf_fuse over two ≤{_RRF_TOPN}-row lists —
    broadcast-sized, no corpus shuffle."""
    import shutil

    from etl_lens_spark.config import ivf_params
    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import _lsh_dedup_build
    from etl_lens_spark.queries.npipe12 import (
        _ann_build,
        _ann_feeds,
        _ann_key_diff,
    )
    from etl_lens_spark.similarity import ivf
    from etl_lens_spark.similarity.fusion import rrf_fuse
    from etl_lens_spark.similarity.knn import dot as _dot
    from etl_lens_spark.text import lexical
    from pyspark.sql import Window

    # --- lexical maintained index (same machinery as the BM25 query)
    dt = _lsh_dedup_build(spark, sf_dir, "irrf_docs")
    lt = sinks.scratch_path("irrf_lex_index")
    shutil.rmtree(lt, ignore_errors=True)
    seed_docs = lakelog.read_snapshot(spark, dt, 0)
    lexical.postings(seed_docs).write.parquet(f"{lt}/s0")
    lakelog.commit(lt, 0, [{"add": "s0"}])
    seed_post = lakelog.read_snapshot(spark, lt, 0)
    n_docs, avgdl = lexical.corpus_stats(seed_post)
    df_map = lexical.df_stats(seed_post, _LEX_TERMS)
    d_ins, d_dels = _docs_feeds(spark, dt)
    lexical.postings(d_ins).write.parquet(f"{lt}/s1")
    lakelog.commit(lt, 1, [{"add": "s1"}])
    lakelog.rewrite_minus_ids(
        spark, lt, d_dels.localCheckpoint(), "doc_id"
    )
    m_lex = lakelog.read_snapshot(spark, lt).localCheckpoint()
    d_head = lakelog.read_snapshot(spark, dt).localCheckpoint()
    r_lex = lexical.postings(d_head)
    lex_missing, lex_extra = _ann_key_diff(
        m_lex, r_lex, ["term", "doc_id", "tf", "dlen"]
    )

    # --- ANN maintained index (same machinery as npipe12's)
    n_cells, _nprobe, train_iters = ivf_params(spark)
    et = _ann_build(spark, sf_dir, "irrf_emb")
    at = sinks.scratch_path("irrf_ann_index")
    shutil.rmtree(at, ignore_errors=True)
    e_seed = lakelog.read_snapshot(spark, et, 0)
    centroids = ivf.train_centroids(e_seed, k=n_cells, iters=train_iters)
    ivf.assign_cells(e_seed, centroids).write.parquet(f"{at}/s0")
    lakelog.commit(at, 0, [{"add": "s0"}])
    e_ins, e_dels = _ann_feeds(spark, et)
    ivf.assign_cells(e_ins, centroids).write.parquet(f"{at}/s1")
    lakelog.commit(at, 1, [{"add": "s1"}])
    lakelog.rewrite_minus_ids(
        spark, at, e_dels.localCheckpoint(), "vec_id"
    )
    m_ann = lakelog.read_snapshot(spark, at).localCheckpoint()
    e_head = lakelog.read_snapshot(spark, et).localCheckpoint()
    r_ann = ivf.assign_cells(e_head, centroids)
    emb_missing, emb_extra = _ann_key_diff(
        m_ann, r_ann, ["vec_id", "cell"]
    )

    # --- serve both rankings from the MAINTAINED tables
    tr = (
        lexical.bm25_topk(
            m_lex, _LEX_TERMS, n_docs, avgdl, df_map, k=_RRF_TOPN
        )
        .select("doc_id", "rank")
    )
    emb = m_ann.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    qv = emb.filter(F.col("doc_id") == 0).select(F.col("e").alias("qe"))
    es = (
        emb.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            (
                _dot(F.col("qe"), F.col("e"))
                / (
                    F.sqrt(_dot(F.col("qe"), F.col("qe")))
                    * F.sqrt(_dot(F.col("e"), F.col("e")))
                )
            ).alias("cs"),
        )
    )
    er = (
        es.orderBy(F.col("cs").desc(), "doc_id")
        .limit(_RRF_TOPN)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cs").desc(), "doc_id")
            ),
        )
        .select("doc_id", "rank")
    )
    fused = rrf_fuse({"text": tr, "emb": er}, k=_RRF_K)
    out = (
        fused.select(
            "doc_id",
            "text_rank",
            "emb_rank",
            "rrf",
            F.lit(int(lex_missing)).cast("long").alias("lex_idx_missing"),
            F.lit(int(lex_extra)).cast("long").alias("lex_idx_extra"),
            F.lit(int(emb_missing)).cast("long").alias("emb_idx_missing"),
            F.lit(int(emb_extra)).cast("long").alias("emb_idx_extra"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_OUT)
    )
    rows = out.collect()
    for p in (dt, lt, et, at):
        shutil.rmtree(p, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@bench_setup("rank_rrf_incremental_cdf")
def _bench_rrf_incremental(spark: SparkSession, sf_dir: str):
    # setup: both lakes, both seed indexes, frozen stats, feeds;
    # timed: maintenance deltas + serving the fused top-20 from the
    # two maintained frames (the per-epoch cost of a hybrid-search
    # deployment; rebuild audits are proofs, not the operator)
    from etl_lens_spark.config import ivf_params
    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import _lsh_dedup_build
    from etl_lens_spark.queries.npipe12 import _ann_build, _ann_feeds
    from etl_lens_spark.similarity import ivf
    from etl_lens_spark.similarity.fusion import rrf_fuse
    from etl_lens_spark.similarity.knn import dot as _dot
    from etl_lens_spark.text import lexical
    from pyspark.sql import Window

    dt = _lsh_dedup_build(spark, sf_dir, "irrf_bench_docs")
    seed_post = lexical.postings(
        lakelog.read_snapshot(spark, dt, 0)
    ).localCheckpoint()
    n_docs, avgdl = lexical.corpus_stats(seed_post)
    df_map = lexical.df_stats(seed_post, _LEX_TERMS)
    d_ins, d_dels = _docs_feeds(spark, dt)
    d_ins, d_dels = d_ins.localCheckpoint(), d_dels.localCheckpoint()

    n_cells, _nprobe, train_iters = ivf_params(spark)
    et = _ann_build(spark, sf_dir, "irrf_bench_emb")
    e_seed = lakelog.read_snapshot(spark, et, 0)
    centroids = ivf.train_centroids(e_seed, k=n_cells, iters=train_iters)
    seed_cells = ivf.assign_cells(e_seed, centroids).localCheckpoint()
    e_ins, e_dels = _ann_feeds(spark, et)
    e_ins, e_dels = e_ins.localCheckpoint(), e_dels.localCheckpoint()

    def _served() -> DataFrame:
        lex = seed_post.unionByName(lexical.postings(d_ins)).join(
            F.broadcast(d_dels),
            F.col("doc_id") == F.col("__gone"),
            "left_anti",
        )
        ann = seed_cells.unionByName(
            ivf.assign_cells(e_ins, centroids)
        ).join(
            F.broadcast(e_dels),
            F.col("vec_id") == F.col("__gone"),
            "left_anti",
        )
        tr = lexical.bm25_topk(
            lex, _LEX_TERMS, n_docs, avgdl, df_map, k=_RRF_TOPN
        ).select("doc_id", "rank")
        emb = ann.select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("e"),
        )
        qv = emb.filter(F.col("doc_id") == 0).select(
            F.col("e").alias("qe")
        )
        es = (
            emb.filter(F.col("doc_id") != 0)
            .crossJoin(F.broadcast(qv))
            .select(
                "doc_id",
                (
                    _dot(F.col("qe"), F.col("e"))
                    / (
                        F.sqrt(_dot(F.col("qe"), F.col("qe")))
                        * F.sqrt(_dot(F.col("e"), F.col("e")))
                    )
                ).alias("cs"),
            )
        )
        er = (
            es.orderBy(F.col("cs").desc(), "doc_id")
            .limit(_RRF_TOPN)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.col("cs").desc(), "doc_id")
                ),
            )
            .select("doc_id", "rank")
        )
        fused = rrf_fuse({"text": tr, "emb": er}, k=_RRF_K)
        top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(
            _RRF_OUT
        )
        return top.agg(
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.sum("doc_id").cast("long").alias("fused_checksum"),
        )

    return _served
