"""Round-11 tranche 3: the swap loop and the live twin close for
the REMAINING index families. Round 10 made every retrieval index a
maintained lake table; tranche 2 closed the re-train loop for IVF
(sim_ann_retrain_swap — dial → re-train → atomic multi-table swap).
This module gives the same closed loop to the other two families
that re-train:

- ``text_bm25_restats_swap`` — the LEXICAL re-stat loop: frozen BM25
  statistics live as a member rel of the postings table's own lake
  log, the growth dial fires, statistics recompute from the
  maintained postings and swap in ONE commit. The postings rows
  never rewrite (a posting is stat-independent — that is the entire
  point of the frozen-stats contract), so the re-stat is a pure
  metadata-plus-tiny-rel commit: the cheapest possible "reindex".
- ``sim_pq_retrain_swap`` — the PQ re-train loop: codes + codebooks
  as member rels of one log, drift flips the code-assignment dial,
  codebooks re-train on the current corpus, the corpus re-encodes
  ONCE, and one commit swaps both (a reader resolving any version
  decodes with a matched (codes, books) pair or
  pq.codebooks_from_df refuses to deserialize).
- ``streaming_bm25_live`` — the live lexical maintainer: the BM25
  postings index maintained FROM BIRTH by the lakelog_cdf streaming
  source through the shared LiveIndexState, completing the
  batch/live symmetry the IVF and LSH families already have
  (streaming_ann_live / streaming_dedup_lsh_live).

Tranche 4 then applies the maintained-table program to the CURATION
OUTPUT itself (``pipeline_incremental_curation_cdf`` — the gated,
exact-deduped corpus manifest as a support/ + curated/ multi-table
log with keeper promotion on delete, text/curation.py) and gives it
the live twin too (``streaming_curation_live`` — support as the
live state, the curated manifest served by election over it).

Shared algebra: text/lexical.py and similarity/pq.py only — the
build-once, batch-incremental, swap, and live paths all score
through the same functions, so the equality pins are pins on the
maintenance algebra, never on a reimplementation. Reference analog:
the reference rebuilds its catalog per scan
(/root/reference/src/main.cpp:255-321); these are the maintained
[N]-class replacements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.queries import bench_setup, query
from etl_lens_spark.sources import sinks
from etl_lens_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Lexical re-stat loop: growth dial -> recompute stats -> atomic swap
# ---------------------------------------------------------------------------

_RSTAT_TERMS = ["spark", "join", "filter"]  # the repo-wide lexical
# probe vocabulary (text_bm25_search / npipe13) — kept identical so
# every BM25 pin in the repo ranks the same queries
_RSTAT_TOPK = 10
_RSTAT_GROWTH = 1.5  # re-stat when the corpus outgrew the frozen
# n_docs by 50% — the metadata-cheap trigger a deployment thresholds
# on (the top-k drift overlap is REPORTED as the quality dial, but a
# trigger must not cost a ranking per epoch)

_RSTAT_ORACLE = f"""
    WITH q(term) AS (VALUES {", ".join(f"('{t}')" for t in _RSTAT_TERMS)}),
    seed AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
    head AS (SELECT doc_id, text FROM documents),
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
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
        FROM frozen QUALIFY rn <= {_RSTAT_TOPK}
    ),
    ctop AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
        FROM current QUALIFY rn <= {_RSTAT_TOPK}
    ),
    ov AS (SELECT COUNT(*) AS n FROM ftop JOIN ctop USING (doc_id))
    SELECT ctop.doc_id,
           CAST(ctop.rn AS BIGINT) AS text_rank,
           ROUND(ctop.score, 6) AS bm25,
           CAST(ov.n AS BIGINT) AS overlap_pre,
           CAST(1 AS BIGINT) AS restat_triggered,
           CAST(0 AS BIGINT) AS epoch_pre,
           CAST(1 AS BIGINT) AS epoch_post,
           CAST(0 AS BIGINT) AS replay_missing,
           CAST(0 AS BIGINT) AS replay_extra,
           CAST(0 AS BIGINT) AS post_missing,
           CAST(0 AS BIGINT) AS post_extra
    FROM ctop CROSS JOIN ov
    ORDER BY text_rank
"""


@query("text_bm25_restats_swap", oracle=_RSTAT_ORACLE)
def text_bm25_restats_swap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE LEXICAL RE-STAT LOOP — the BM25 analog of
    sim_ann_retrain_swap, closing the loop npipe13 opened: the
    frozen statistics are not driver state but a MEMBER REL
    (``stats/``: kind,term,val,epoch rows via lexical.stats_to_df)
    of the same multi-table lake log that holds the postings
    (``post/``), so the re-stat is ONE atomic commit and every
    version resolves to (postings, statistics-of-exactly-one-epoch)
    — lexical.stats_from_df RAISES on a mixed-epoch read.

    What makes the lexical loop different from the ANN loop — and
    the reason re-stat is the CHEAPEST reindex in the repo — is that
    a posting row is statistics-independent: re-stat rewrites
    NOTHING in ``post/``, it swaps a 2+|vocab|-row rel. (The IVF
    re-train re-encodes the corpus; PQ re-encodes the corpus; BM25
    re-reads it once for the new (n_docs, avgdl, df) aggregates and
    commits ~kilobytes.)

    The fixture drifts hard by construction: the frozen statistics
    come from a 1/3 seed (doc_id % 3 == 0) and the maintained index
    then absorbs the other 2/3 as CDF inserts — n_docs grows ~3x,
    so the growth dial (cur_n/frozen_n >= 1.5, the metadata-cheap
    trigger) fires deterministically at every sf.

    Pins, in-output: restat_triggered = 1; epoch_pre = 0 /
    epoch_post = 1 (single-epoch statistics read at each version —
    stats_from_df would raise otherwise, so these ARE the torn
    checks); replay_missing/extra = 0 (a reader pinned at the
    pre-swap version re-serves the frozen-stats top-10 identically
    AFTER the swap landed — zero-downtime); post_missing/extra = 0
    (post-swap serving from the maintained postings ≡ from-scratch
    rebuild + current stats on (doc_id, rank)); and the DuckDB
    oracle value-matches the ENTIRE post-swap ranking (doc_id, rank,
    score to 6 decimals) AND overlap_pre — the frozen-vs-current
    top-10 overlap, the QUALITY dial the re-stat moves (on this
    corpus the growth is statistics-uniform so the overlap stays
    high; the growth trigger fires regardless, which is exactly why
    the trigger is corpus growth and not a ranking diff) —
    relationally.

    100 TB posture: the dial is one count against the maintained
    table, the re-stat one aggregate pass over postings (group by
    doc_id then two scalars, plus a vocabulary-filtered df count),
    and the swap a metadata commit; serving stays
    vocabulary-filtered before any shuffle."""
    import shutil

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.text import lexical

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    dt = sinks.scratch_path("rstat_docs")
    it = sinks.scratch_path("rstat_index")
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)

    # --- docs lake: v0 = the 1/3 seed, v1 = the other 2/3 (CDF)
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(f"{dt}/s0")
    lakelog.commit(dt, 0, [{"add": "s0"}])
    docs.filter(F.col("doc_id") % 3 != 0).write.parquet(f"{dt}/s1")
    lakelog.commit(dt, 1, [{"add": "s1"}])

    # --- seed index: postings + epoch-0 statistics in ONE commit
    seed = lakelog.read_snapshot(spark, dt, 0)
    lexical.postings(seed).write.parquet(f"{it}/post/s0")
    seed_post = spark.read.parquet(f"{it}/post/s0")
    n0, avgdl0 = lexical.corpus_stats(seed_post)
    df0 = lexical.df_stats(seed_post, _RSTAT_TERMS)
    lexical.stats_to_df(spark, n0, avgdl0, df0, epoch=0).coalesce(
        1
    ).write.parquet(f"{it}/stats/c0")
    lakelog.commit(it, 0, [{"add": "post/s0"}, {"add": "stats/c0"}])

    # --- maintenance: the delta tokenizes ALONE and appends
    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
    )
    lexical.postings(ins).write.parquet(f"{it}/post/s1")
    lakelog.commit(it, 1, [{"add": "post/s1"}])

    def _serve(version: int):
        """Serve ENTIRELY from the table at one version: postings
        member + single-epoch statistics member (stats_from_df
        raises on a torn read)."""
        post_v = lakelog.read_table_snapshot(spark, it, "post", version)
        n, avgdl, dfm, epoch = lexical.stats_from_df(
            lakelog.read_table_snapshot(spark, it, "stats", version)
        )
        topk = lexical.bm25_topk(
            post_v, _RSTAT_TERMS, n, avgdl, dfm, k=_RSTAT_TOPK
        )
        return topk, epoch, n

    # --- pre-swap serving (frozen stats) + the dials
    v_pre = lakelog.latest_version(it)
    pre_topk, epoch_pre, frozen_n = _serve(v_pre)
    pre_topk = pre_topk.localCheckpoint()
    # the POST member only — a whole-table read would fold the stats
    # member's rows (NULL doc_id, term='spark' df rows) into the
    # aggregates and quietly inflate n_docs/df by one
    maintained = lakelog.read_table_snapshot(
        spark, it, "post", v_pre
    ).localCheckpoint()
    cur_n, cur_avgdl = lexical.corpus_stats(maintained)
    restat_triggered = int(cur_n / max(frozen_n, 1) >= _RSTAT_GROWTH)
    cur_df = lexical.df_stats(maintained, _RSTAT_TERMS)
    cur_topk_probe = lexical.bm25_topk(
        maintained, _RSTAT_TERMS, cur_n, cur_avgdl, cur_df, k=_RSTAT_TOPK
    )
    overlap_pre = pre_topk.join(
        cur_topk_probe, "doc_id", "left_semi"
    ).count()

    # --- the re-stat: recompute from the MAINTAINED index, swap the
    # statistics member atomically (postings untouched)
    lexical.stats_to_df(
        spark, cur_n, cur_avgdl, cur_df, epoch=1
    ).coalesce(1).write.parquet(f"{it}/stats/c1")
    lakelog.commit(
        it,
        lakelog.latest_version(it) + 1,
        [{"remove": "stats/c0"}, {"add": "stats/c1"}],
    )

    # --- post-swap serving + the time-travel replay
    v_post = lakelog.latest_version(it)
    post_topk, epoch_post, _n = _serve(v_post)
    post_topk = post_topk.localCheckpoint()
    replay_topk, epoch_replay, _n = _serve(v_pre)  # pinned old version
    replay_missing, replay_extra = _ann_key_diff(
        replay_topk, pre_topk, ["doc_id", "rank"]
    )
    head = lakelog.read_snapshot(spark, dt)
    rebuilt = lexical.postings(head).localCheckpoint()
    rn, ravgdl = lexical.corpus_stats(rebuilt)
    rdf = lexical.df_stats(rebuilt, _RSTAT_TERMS)
    r_topk = lexical.bm25_topk(
        rebuilt, _RSTAT_TERMS, rn, ravgdl, rdf, k=_RSTAT_TOPK
    )
    post_missing, post_extra = _ann_key_diff(
        post_topk, r_topk, ["doc_id", "rank"]
    )

    out = post_topk.select(
        "doc_id",
        F.col("rank").alias("text_rank"),
        F.round("score", 6).alias("bm25"),
        F.lit(int(overlap_pre)).cast("long").alias("overlap_pre"),
        F.lit(int(restat_triggered))
        .cast("long")
        .alias("restat_triggered"),
        F.lit(int(max(epoch_pre, epoch_replay)))
        .cast("long")
        .alias("epoch_pre"),
        F.lit(int(epoch_post)).cast("long").alias("epoch_post"),
        F.lit(int(replay_missing)).cast("long").alias("replay_missing"),
        F.lit(int(replay_extra)).cast("long").alias("replay_extra"),
        F.lit(int(post_missing)).cast("long").alias("post_missing"),
        F.lit(int(post_extra)).cast("long").alias("post_extra"),
    ).orderBy("text_rank")
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# PQ re-train loop: flip dial -> re-train books -> re-encode -> swap
# ---------------------------------------------------------------------------

_PQS_K = 5
_PQS_M = 16
_PQS_CODES = 32
_PQS_ITERS = 3
_PQS_RERANK = 3
_PQS_NQ = 30
_PQS_FLIP_THRESHOLD = 0.05

_PQS_ORACLE = """
    SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_head_vecs,
           CAST(2 * COUNT(*) AS BIGINT) AS n_codes_pre,
           CAST(2 * COUNT(*) AS BIGINT) AS n_codes_post,
           CAST(1 AS BIGINT) AS retrain_triggered,
           CAST(0 AS BIGINT) AS torn_pre,
           CAST(0 AS BIGINT) AS torn_post,
           CAST(0 AS BIGINT) AS replay_missing,
           CAST(0 AS BIGINT) AS replay_extra,
           CAST(1 AS BIGINT) AS recall_improved,
           CAST(1 AS BIGINT) AS recall_post_ok
    FROM embeddings
"""


@query("sim_pq_retrain_swap", oracle=_PQS_ORACLE)
def sim_pq_retrain_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE PQ RE-TRAIN LOOP — sim_ann_retrain_swap for the
    compressed-corpus family: the index is a multi-table lake log
    whose member rels are ``codes/`` (vec_id, codes, epoch — the
    32x-compressed corpus replacement) and ``books/`` (the (m, k,
    dsub) codebook tensor persisted via pq.codebooks_to_df), so ONE
    commit swaps both and a reader resolving any version decodes
    with a matched pair — pq.codebooks_from_df RAISES on a
    mixed-epoch read, so a torn ADC table cannot even be built.

    The loop: npipe13's drift fixture (8 tight clusters along novel
    directions) appends under FIXED epoch-0 codebooks (encode is a
    pure function of the vector — the maintenance contract); the
    re-train dial is the code-flip fraction under CANDIDATE
    codebooks one id-aligned Lloyd step ahead (pq.refine_codebooks,
    the same dial sim_pq_incremental_cdf measures) — the drifted
    corpus pushes it past the threshold; codebooks re-train on the
    current corpus (k_codes unchanged — PQ resolution is per-
    subspace, not per-row, so unlike IVF's cell count it does not
    scale with corpus size), the corpus re-encodes ONCE, and the
    swap is one commit.

    Pins, in-output: retrain_triggered = 1; torn_pre / torn_post = 0
    (codes member carries exactly one epoch matching the books
    member's at both versions); replay_missing / replay_extra = 0
    (a reader pinned at the pre-swap version re-serves ADC+re-rank
    top-k identically AFTER the swap — zero-downtime); and
    recall_improved / recall_post_ok — recall vs exact brute force
    over probes from BOTH populations, same shortlist budget
    (rerank x k) pre and post: the re-train must pay for itself.

    100 TB posture: the dial and the re-encode are one vectorized
    mapInPandas pass each against broadcast codebooks (the corpus
    never shuffles); training moves O(partitions * m * k * dsub)
    floats to the driver; serving scans BYTES (the codes member) and
    re-ranks only queries x rerank*k float rows; the swap is
    metadata. The old epoch stays time-travelable until vacuum."""
    import shutil

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.queries.npipe13 import (
        _SWAP_ID_OFFSET,
        _drift_delta,
    )
    from etl_lens_spark.similarity import knn, pq

    et = sinks.scratch_path("pqswap_emb")
    it = sinks.scratch_path("pqswap_index")
    shutil.rmtree(et, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    emb.write.parquet(f"{et}/s0")
    lakelog.commit(et, 0, [{"add": "s0"}])
    _drift_delta(spark, emb).write.parquet(f"{et}/s1")
    lakelog.commit(et, 1, [{"add": "s1"}])

    # --- seed index: codes + codebooks in ONE commit (epoch 0)
    seed = lakelog.read_snapshot(spark, et, 0)
    books0 = pq.train_codebooks(
        seed, 64, m=_PQS_M, k_codes=_PQS_CODES, iters=_PQS_ITERS
    )
    pq.encode(seed, books0).withColumn(
        "epoch", F.lit(0)
    ).write.parquet(f"{it}/codes/s0")
    pq.codebooks_to_df(spark, books0, epoch=0).coalesce(
        1
    ).write.parquet(f"{it}/books/b0")
    lakelog.commit(it, 0, [{"add": "codes/s0"}, {"add": "books/b0"}])

    # --- maintenance: the drifted delta encodes under FIXED books
    ins = (
        lakelog.table_changes(spark, et, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("vec_id", "embedding")
    )
    pq.encode(ins, books0).withColumn(
        "epoch", F.lit(0)
    ).write.parquet(f"{it}/codes/s1")
    lakelog.commit(it, 1, [{"add": "codes/s1"}])

    head = lakelog.read_snapshot(spark, et).localCheckpoint()
    n_head = head.count()
    queries = head.filter(
        (F.col("vec_id") < _PQS_NQ)
        | (
            (F.col("vec_id") >= _SWAP_ID_OFFSET)
            & (F.col("vec_id") < _SWAP_ID_OFFSET + _PQS_NQ)
        )
    ).localCheckpoint()
    bf = knn.brute_force_topk(head, queries, k=_PQS_K).localCheckpoint()

    def _serve(version: int):
        """Serve ENTIRELY from the table at one version: matched
        (codes, books) pair or codebooks_from_df raises."""
        codes_v = lakelog.read_table_snapshot(
            spark, it, "codes", version
        )
        books_v, b_epoch = pq.codebooks_from_df(
            lakelog.read_table_snapshot(spark, it, "books", version)
        )
        c_epochs = [
            r[0] for r in codes_v.select("epoch").distinct().collect()
        ]
        torn = int(len(c_epochs) != 1 or c_epochs[0] != b_epoch)
        topk = pq.pq_probe_topk(
            codes_v.drop("epoch"),
            head,
            queries,
            books_v,
            k=_PQS_K,
            rerank=_PQS_RERANK,
        )
        return topk, torn, codes_v

    # --- pre-swap serving (reader at vN)
    v_pre = lakelog.latest_version(it)
    pre_topk, torn_pre, pre_codes = _serve(v_pre)
    pre_topk = pre_topk.localCheckpoint()
    n_codes_pre = pre_codes.count()
    recall_pre = pre_topk.join(
        bf, ["qid", "neighbor_id"], "left_semi"
    ).count() / max(bf.count(), 1)

    # --- the dial fires: code flips under one-Lloyd-step candidates
    cand = pq.refine_codebooks(head, books0)
    cand_codes = pq.encode(head, cand)
    flips = (
        pre_codes.drop("epoch")
        .alias("a")
        .join(cand_codes.alias("b"), "vec_id")
        .select(
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("a.codes"),
                        F.col("b.codes"),
                        lambda x, y: x != y,
                    ),
                    lambda t: t,
                )
            ).alias("n_flip")
        )
        .agg(
            F.sum("n_flip").cast("long").alias("flips"),
            F.count(F.lit(1)).cast("long").alias("rows"),
        )
        .first()
    )
    flip_frac = flips["flips"] / max(flips["rows"] * _PQS_M, 1)
    retrain_triggered = int(flip_frac > _PQS_FLIP_THRESHOLD)

    # --- re-train on the current corpus, re-encode ONCE, atomic swap
    books1 = pq.train_codebooks(
        head, 64, m=_PQS_M, k_codes=_PQS_CODES, iters=_PQS_ITERS
    )
    pq.encode(head, books1).withColumn(
        "epoch", F.lit(1)
    ).write.parquet(f"{it}/codes/s2")
    pq.codebooks_to_df(spark, books1, epoch=1).coalesce(
        1
    ).write.parquet(f"{it}/books/b1")
    old_rels = list(lakelog.snapshot_actions(it))
    lakelog.commit(
        it,
        lakelog.latest_version(it) + 1,
        [{"remove": r} for r in old_rels]
        + [{"add": "codes/s2"}, {"add": "books/b1"}],
    )

    # --- post-swap serving + the time-travel replay
    v_post = lakelog.latest_version(it)
    post_topk, torn_post, post_codes = _serve(v_post)
    n_codes_post = post_codes.count()
    recall_post = post_topk.join(
        bf, ["qid", "neighbor_id"], "left_semi"
    ).count() / max(bf.count(), 1)
    replay_topk, torn_replay, _c = _serve(v_pre)  # pinned old version
    torn_pre = max(torn_pre, torn_replay)
    replay_missing, replay_extra = _ann_key_diff(
        replay_topk, pre_topk, ["qid", "neighbor_id", "rank_n"]
    )

    out = spark.createDataFrame(
        [
            (
                int(n_head),
                int(n_codes_pre),
                int(n_codes_post),
                int(retrain_triggered),
                int(torn_pre),
                int(torn_post),
                int(replay_missing),
                int(replay_extra),
                int(recall_post >= recall_pre),
                int(recall_post >= 0.6),
            )
        ],
        "n_head_vecs long, n_codes_pre long, n_codes_post long, "
        "retrain_triggered long, torn_pre long, torn_post long, "
        "replay_missing long, replay_extra long, recall_improved "
        "long, recall_post_ok long",
    )
    rows = out.collect()
    shutil.rmtree(et, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# Live lexical maintainer: BM25 postings from the streaming CDF source
# ---------------------------------------------------------------------------

_SBM_ORACLE = f"""
    WITH head AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 3
    ),
    toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM head
    ),
    p AS (SELECT doc_id, w FROM toks GROUP BY doc_id, w)
    SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS n_head_docs,
           CAST(COUNT(*) AS BIGINT) AS n_index_rows,
           CAST(0 AS BIGINT) AS idx_missing,
           CAST(0 AS BIGINT) AS idx_extra,
           CAST(0 AS BIGINT) AS topk_missing,
           CAST(0 AS BIGINT) AS topk_extra
    FROM p
"""


@query("streaming_bm25_live", oracle=_SBM_ORACLE)
def streaming_bm25_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE twin of text_bm25_incremental_cdf — the BM25 postings
    index maintained FROM BIRTH by the ``lakelog_cdf`` STREAMING
    source, completing the batch/live symmetry for the lexical
    family (the IVF and LSH families got theirs in rounds 9-10:
    streaming_ann_live / streaming_dedup_lsh_live). The maintainer
    starts with an EMPTY index; every commit's changes — v0's seed
    inserts included — flow through the two maintenance rules in
    commit order (inserts: tokenize the delta ALONE, append its
    postings; deletes: the doc ids' tombstone), with upsert pre/post
    images folded in and deletes applied before inserts within a
    version (live_index.split_version_changes — shared with BOTH
    other live maintainers, so the three cannot drift).

    Bootstrap, documented as part of the frozen-stats contract: the
    FROZEN statistics (n_docs, avgdl, per-term df) come from the v0
    snapshot and stay fixed — exactly the state a real deployment
    ships to its streaming maintainer alongside the empty index
    (the quantizer analog: streaming_ann_live's v0-trained
    centroids).

    In-session state is the shared streaming.live_index
    .LiveIndexState keyed on doc_id — ordered parts/tombstones (a
    deleted-then-reinserted doc survives), compacted every K epochs,
    plan depth bounded for any stream length.

    Pins: the stream-maintained postings equal a from-scratch
    tokenization of the head snapshot EXACTLY on (term, doc_id, tf,
    dlen) — idx_missing/extra = 0, with the index CARDINALITY
    value-matched by the DuckDB oracle's own relational tokenization
    (n_index_rows); frozen-stats top-10 served from the live index
    (lexical.bm25_topk, shared code) equals the rebuilt-index
    top-10 — topk_missing/extra = 0."""
    import shutil
    import uuid

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe11 import _lsh_dedup_build
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.sources.pyds import LakeLogCDFStreamDataSource
    from etl_lens_spark.streaming import live_index
    from etl_lens_spark.streaming.live_index import LiveIndexState
    from etl_lens_spark.text import lexical

    dt = _lsh_dedup_build(spark, sf_dir, "sbm25_docs")
    try:
        spark.dataSource.register(LakeLogCDFStreamDataSource)
    except Exception:
        pass  # already registered in this session

    seed_post = lexical.postings(lakelog.read_snapshot(spark, dt, 0))
    n_docs, avgdl = lexical.corpus_stats(seed_post)
    df_map = lexical.df_stats(seed_post, _RSTAT_TERMS)
    state = LiveIndexState("doc_id")

    def _apply_version(vdf) -> None:
        dels, ins_rows = live_index.split_version_changes(vdf)
        gone = dels.select(F.col("doc_id").alias("__gone")).distinct()
        if not gone.isEmpty():
            state.delete(gone.localCheckpoint())
        ins = ins_rows.select("doc_id", "text")
        if not ins.isEmpty():
            state.append(lexical.postings(ins).localCheckpoint())

    def sink(batch_df, epoch_id):
        b = batch_df.localCheckpoint()
        versions = sorted(
            r[0]
            for r in b.select("_commit_version").distinct().collect()
        )
        for v in versions:  # commit order inside the micro-batch
            _apply_version(b.filter(F.col("_commit_version") == v))

    ckpt = sinks.scratch_path(f"ckpt_sbm25_{uuid.uuid4().hex}")
    q = (
        spark.readStream.format("lakelog_cdf")
        .option("path", dt)
        .option("schema_ddl", "doc_id long, text string")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    maintained = state.view().localCheckpoint()
    head = lakelog.read_snapshot(spark, dt).localCheckpoint()
    rebuilt = lexical.postings(head).localCheckpoint()
    idx_missing, idx_extra = _ann_key_diff(
        maintained, rebuilt, ["term", "doc_id", "tf", "dlen"]
    )
    m_topk = lexical.bm25_topk(
        maintained, _RSTAT_TERMS, n_docs, avgdl, df_map, k=_RSTAT_TOPK
    ).localCheckpoint()
    r_topk = lexical.bm25_topk(
        rebuilt, _RSTAT_TERMS, n_docs, avgdl, df_map, k=_RSTAT_TOPK
    )
    topk_missing, topk_extra = _ann_key_diff(
        m_topk, r_topk, ["doc_id", "rank"]
    )

    out = spark.createDataFrame(
        [
            (
                int(head.count()),
                int(maintained.count()),
                int(idx_missing),
                int(idx_extra),
                int(topk_missing),
                int(topk_extra),
            )
        ],
        "n_head_docs long, n_index_rows long, idx_missing long, "
        "idx_extra long, topk_missing long, topk_extra long",
    )
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# The curated corpus as a maintained lake table (gate + dedup + promotion)
# ---------------------------------------------------------------------------

_CUR_OFFSET = 1_000_000  # planted duplicate ids: original + offset

_CUR_ORACLE = f"""
    WITH copies AS (
        SELECT doc_id + {_CUR_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 5 = 0
    ),
    all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM copies
    ),
    head AS (SELECT * FROM all_docs WHERE doc_id % 15 <> 0),
    gated AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 AS fp,
               doc_id,
               len(string_split(text, ' ')) AS n_tokens
        FROM head
        WHERE len(string_split(text, ' ')) BETWEEN 25 AND 5000
          AND len(list_distinct(string_split(lower(text), ' '))) * 1.0
                / len(string_split(text, ' ')) >= 0.35
    ),
    keepers AS (SELECT fp, MIN(doc_id) AS doc_id FROM gated GROUP BY fp),
    cur AS (
        SELECT k.doc_id, g.n_tokens
        FROM keepers k JOIN gated g
          ON k.fp = g.fp AND k.doc_id = g.doc_id
    ),
    pins AS (
        SELECT
          CAST((SELECT COUNT(*) FROM keepers
                WHERE doc_id >= {_CUR_OFFSET}) AS BIGINT) AS n_promoted,
          CAST((SELECT COUNT(*) FROM gated) AS BIGINT) AS n_support,
          CAST((SELECT COUNT(*) FROM head)
               - (SELECT COUNT(*) FROM gated) AS BIGINT) AS n_gate_fail
    )
    SELECT CAST(doc_id % 10 AS INT) AS key_mod,
           CAST(COUNT(*) AS BIGINT) AS n_curated,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
           pins.n_promoted,
           pins.n_support,
           pins.n_gate_fail,
           CAST(0 AS BIGINT) AS curated_missing,
           CAST(0 AS BIGINT) AS curated_extra,
           CAST(0 AS BIGINT) AS support_missing,
           CAST(0 AS BIGINT) AS support_extra
    FROM cur CROSS JOIN pins
    GROUP BY doc_id % 10, pins.n_promoted, pins.n_support,
             pins.n_gate_fail
    ORDER BY key_mod
"""


def _curation_source(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Documents lake with PLANTED exact duplicates: v0 = the whole
    corpus, v1 = byte-identical copies of every doc_id % 5 == 0 doc
    under doc_id + offset, v2 = predicate DELETE of doc_id % 15 == 0
    (cdf=True). Every deleted original is % 5 == 0, so each GATED
    deleted keeper has a surviving copy — the promotion case fires
    by construction; some copies land on the delete predicate too
    ((x + offset) % 15 == 0 for x % 15 == 5), exercising
    support-only departures."""
    import shutil

    from etl_lens_spark.operators import lakelog

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    base = sinks.scratch_path(tag)
    shutil.rmtree(base, ignore_errors=True)
    docs.write.parquet(f"{base}/s0")
    lakelog.commit(base, 0, [{"add": "s0"}])
    docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _CUR_OFFSET).alias("doc_id"), "text"
    ).write.parquet(f"{base}/s1")
    lakelog.commit(base, 1, [{"add": "s1"}])
    lakelog.delete_where(
        spark, base, F.col("doc_id") % 15 == 0, cdf=True
    )
    return base


@query(
    "pipeline_incremental_curation_cdf",
    headline=True,
    oracle=_CUR_ORACLE,
)
def pipeline_incremental_curation_cdf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE CURATED CORPUS AS A MAINTAINED LAKE TABLE — the capstone
    of the maintained-index program: rounds 9-11 maintained every
    retrieval INDEX from the CDF; this maintains the curation OUTPUT
    itself — the quality-gated, exact-deduped corpus manifest a
    training run consumes — as two member rels (support/ + curated/)
    of ONE multi-table log, committed atomically per epoch
    (text/curation.py data model).

    The hard case is KEEPER PROMOTION: the curated member keeps the
    min-doc_id representative per content fingerprint, so deleting a
    keeper must PROMOTE the next-smallest surviving duplicate — a
    rule a naive "maintained DISTINCT" silently gets wrong (the
    duplicate was rejected on insert, so the delete leaves a hole
    unless the support member remembers it). The fixture forces it:
    planted byte-identical copies arrive as v1 inserts (rejected
    from curated, recorded in support), then v2 deletes every
    doc_id % 15 == 0 original — each gated one a keeper with a
    surviving copy, which MUST surface in curated with its identity
    (doc_id >= offset) intact.

    Maintenance, each epoch one atomic commit (curation.py rules):
    - epoch 1 (inserts): gate the delta ALONE, per-fp in-delta
      minima probe the curated member (one fp join); new
      fingerprints append, smaller-id arrivals would replace (the
      rule is total; this fixture's copies all carry larger ids —
      the replacement path is unit-tested in tests/test_npipe14).
    - epoch 2 (deletes): departing ids leave support by anti-join;
      curated rows whose keeper departed re-elect from the SURVIVING
      support of exactly those fingerprints (broadcast-pruned before
      any shuffle).

    Pins, in-output: maintained curated ≡ from-scratch curation of
    the head snapshot on (fp, doc_id, n_tokens) — curated_missing/
    extra = 0 (this is also the no-torn-state statement: both
    members resolve at one version); maintained support ≡ gated head
    — support_missing/extra = 0; n_promoted (count of curated rows
    with copy-range ids — reachable ONLY through promotion),
    n_support, and n_gate_fail are value-matched by the DuckDB
    oracle's from-scratch curation, as is the per-id-bucket curated
    summary (count, id sum, token sum).

    100 TB posture: the gate is JVM expressions over the delta; the
    election is an algebraic min_by groupBy(fp) (map-side partial —
    a million-copy fingerprint reduces map-side); promotion reads
    only affected fingerprints' support rows; the per-epoch rewrite
    is the shared anti-join discipline (shardable by fp bucket);
    nothing ever re-gates or re-hashes the standing corpus."""
    import shutil

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.text import curation

    dt = _curation_source(spark, sf_dir, "icur_docs")
    ct = sinks.scratch_path("icur_index")
    shutil.rmtree(ct, ignore_errors=True)

    # --- seed: support + curated in ONE commit
    g0 = curation.gate(lakelog.read_snapshot(spark, dt, 0))
    g0.write.parquet(f"{ct}/support/s0")
    g0 = spark.read.parquet(f"{ct}/support/s0")
    curation.elect_keepers(g0).write.parquet(f"{ct}/curated/c0")
    lakelog.commit(
        ct, 0, [{"add": "support/s0"}, {"add": "curated/c0"}]
    )

    # --- epoch 1: the insert delta gates ALONE and probes curated
    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
    )
    gd = curation.gate(ins)
    gd.write.parquet(f"{ct}/support/s1")
    gd = spark.read.parquet(f"{ct}/support/s1")
    curated_0 = lakelog.read_table_snapshot(spark, ct, "curated")
    adds, replaced = curation.insert_deltas(gd, curated_0)
    n_replaced = replaced.count()
    adds.write.parquet(f"{ct}/curated/c1")
    if n_replaced == 0:
        lakelog.commit(
            ct,
            lakelog.latest_version(ct) + 1,
            [{"add": "support/s1"}, {"add": "curated/c1"}],
        )
    else:  # pragma: no cover - fixture ids are monotone; unit-tested
        survivors = curated_0.join(
            replaced.select("fp"), "fp", "left_anti"
        )
        survivors.write.parquet(f"{ct}/curated/c1r")
        lakelog.commit(
            ct,
            lakelog.latest_version(ct) + 1,
            [{"remove": "curated/c0"}]
            + [{"add": p} for p in
               ("support/s1", "curated/c1", "curated/c1r")],
        )

    # --- epoch 2: deletes leave support; affected fps re-elect
    gone = (
        lakelog.table_changes(spark, dt, 1, 2)
        .filter(F.col("_change_type") == "delete")
        .select(F.col("doc_id").alias("__gone"))
        .distinct()
        .localCheckpoint()
    )
    support_cur = lakelog.read_table_snapshot(spark, ct, "support")
    support_new = support_cur.join(
        F.broadcast(gone),
        F.col("doc_id") == F.col("__gone"),
        "left_anti",
    ).localCheckpoint()
    curated_cur = lakelog.read_table_snapshot(spark, ct, "curated")
    removed, promoted = curation.delete_deltas(
        support_new, curated_cur, gone
    )
    curated_new = curated_cur.join(
        removed.select("fp"), "fp", "left_anti"
    ).unionByName(promoted)
    support_new.write.parquet(f"{ct}/support/s2")
    curated_new.write.parquet(f"{ct}/curated/c2")
    old = list(lakelog.snapshot_actions(ct))
    lakelog.commit(
        ct,
        lakelog.latest_version(ct) + 1,
        [{"remove": r} for r in old]
        + [{"add": "support/s2"}, {"add": "curated/c2"}],
    )

    # --- audits: from-scratch curation of the head snapshot
    m_support = lakelog.read_table_snapshot(
        spark, ct, "support"
    ).localCheckpoint()
    m_curated = lakelog.read_table_snapshot(
        spark, ct, "curated"
    ).localCheckpoint()
    head = lakelog.read_snapshot(spark, dt)
    ref_support = curation.gate(head).localCheckpoint()
    ref_curated = curation.elect_keepers(ref_support)
    support_missing, support_extra = _ann_key_diff(
        m_support, ref_support, ["fp", "doc_id", "n_tokens"]
    )
    curated_missing, curated_extra = _ann_key_diff(
        m_curated, ref_curated, ["fp", "doc_id", "n_tokens"]
    )
    n_promoted = m_curated.filter(
        F.col("doc_id") >= _CUR_OFFSET
    ).count()
    n_support = m_support.count()
    n_gate_fail = head.count() - n_support

    out = (
        m_curated.groupBy(
            (F.col("doc_id") % 10).cast("int").alias("key_mod")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_curated"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("n_tokens").cast("long").alias("tok_sum"),
        )
        .select(
            "key_mod",
            "n_curated",
            "id_sum",
            "tok_sum",
            F.lit(int(n_promoted)).cast("long").alias("n_promoted"),
            F.lit(int(n_support)).cast("long").alias("n_support"),
            F.lit(int(n_gate_fail)).cast("long").alias("n_gate_fail"),
            F.lit(int(curated_missing))
            .cast("long")
            .alias("curated_missing"),
            F.lit(int(curated_extra))
            .cast("long")
            .alias("curated_extra"),
            F.lit(int(support_missing))
            .cast("long")
            .alias("support_missing"),
            F.lit(int(support_extra))
            .cast("long")
            .alias("support_extra"),
        )
        .orderBy("key_mod")
    )
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(ct, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@bench_setup("pipeline_incremental_curation_cdf")
def _bench_incremental_curation(spark: SparkSession, sf_dir: str):
    # setup: the source lake, the seed (support, curated) state, and
    # the two change feeds; timed: the INCREMENTAL work — gate the
    # insert delta, probe curated on fp, the delete anti-join, and
    # the affected-fp re-election (the nightly cost; the from-scratch
    # rebuild + diffs are the registered query's proof)
    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.text import curation

    dt = _curation_source(spark, sf_dir, "icur_bench_docs")
    g0 = curation.gate(
        lakelog.read_snapshot(spark, dt, 0)
    ).localCheckpoint()
    curated_0 = curation.elect_keepers(g0).localCheckpoint()
    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    gone = (
        lakelog.table_changes(spark, dt, 1, 2)
        .filter(F.col("_change_type") == "delete")
        .select(F.col("doc_id").alias("__gone"))
        .distinct()
        .localCheckpoint()
    )

    def _maintained() -> DataFrame:
        gd = curation.gate(ins)
        adds, _replaced = curation.insert_deltas(gd, curated_0)
        support_new = (
            g0.unionByName(gd)
            .join(
                F.broadcast(gone),
                F.col("doc_id") == F.col("__gone"),
                "left_anti",
            )
        )
        curated_1 = curated_0.unionByName(adds)
        removed, promoted = curation.delete_deltas(
            support_new, curated_1, gone
        )
        curated_final = curated_1.join(
            removed.select("fp"), "fp", "left_anti"
        ).unionByName(promoted)
        return curated_final.agg(
            F.count(F.lit(1)).cast("long").alias("n_curated"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )

    return _maintained


_SCUR_ORACLE = f"""
    WITH copies AS (
        SELECT doc_id + {_CUR_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 5 = 0
    ),
    all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM copies
    ),
    head AS (SELECT * FROM all_docs WHERE doc_id % 15 <> 0),
    gated AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 AS fp,
               doc_id
        FROM head
        WHERE len(string_split(text, ' ')) BETWEEN 25 AND 5000
          AND len(list_distinct(string_split(lower(text), ' '))) * 1.0
                / len(string_split(text, ' ')) >= 0.35
    ),
    keepers AS (SELECT fp, MIN(doc_id) AS doc_id FROM gated GROUP BY fp)
    SELECT CAST((SELECT COUNT(*) FROM gated) AS BIGINT) AS n_support,
           CAST(COUNT(*) AS BIGINT) AS n_curated,
           CAST((SELECT COUNT(*) FROM keepers
                 WHERE doc_id >= {_CUR_OFFSET}) AS BIGINT)
             AS n_promoted,
           CAST(0 AS BIGINT) AS support_missing,
           CAST(0 AS BIGINT) AS support_extra,
           CAST(0 AS BIGINT) AS curated_missing,
           CAST(0 AS BIGINT) AS curated_extra
    FROM keepers
"""


@query("streaming_curation_live", oracle=_SCUR_ORACLE)
def streaming_curation_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LIVE twin of pipeline_incremental_curation_cdf — the curated
    corpus maintained FROM BIRTH by the ``lakelog_cdf`` STREAMING
    source, completing the batch/live symmetry for the curation
    pipeline (the fourth live maintainer, after LSH / IVF / BM25 —
    all through the same LiveIndexState + split_version_changes
    machinery, so none can drift from the others).

    The live state is the SUPPORT relation (every gated doc, keyed
    by doc_id — inserts gate the delta alone and append; deletes
    tombstone), and the curated manifest is SERVED by electing
    keepers over the live support view (curation.elect_keepers, the
    shared one-shuffle algebraic min_by). This is the
    promotion-correct-by-construction formulation: a departed
    keeper's fingerprint re-elects automatically at the next
    election because the survivors are still in support — the
    support-is-the-state insight the batch twin materializes
    explicitly. (The batch twin's curated/ member is the
    incremental materialization of THIS election; the equality of
    the two paths is exactly what both queries' from-scratch pins
    certify.)

    Pins: live support ≡ gated head snapshot on (fp, doc_id,
    n_tokens); curated-served ≡ from-scratch curation on (fp,
    doc_id); n_support / n_curated / n_promoted value-matched by
    the DuckDB oracle's independent from-scratch curation."""
    import shutil
    import uuid

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.sources.pyds import LakeLogCDFStreamDataSource
    from etl_lens_spark.streaming import live_index
    from etl_lens_spark.streaming.live_index import LiveIndexState
    from etl_lens_spark.text import curation

    dt = _curation_source(spark, sf_dir, "scur_docs")
    try:
        spark.dataSource.register(LakeLogCDFStreamDataSource)
    except Exception:
        pass  # already registered in this session

    state = LiveIndexState("doc_id")

    def _apply_version(vdf) -> None:
        dels, ins_rows = live_index.split_version_changes(vdf)
        gone = dels.select(F.col("doc_id").alias("__gone")).distinct()
        if not gone.isEmpty():
            state.delete(gone.localCheckpoint())
        ins = ins_rows.select("doc_id", "text")
        if not ins.isEmpty():
            state.append(curation.gate(ins).localCheckpoint())

    def sink(batch_df, epoch_id):
        b = batch_df.localCheckpoint()
        versions = sorted(
            r[0]
            for r in b.select("_commit_version").distinct().collect()
        )
        for v in versions:  # commit order inside the micro-batch
            _apply_version(b.filter(F.col("_commit_version") == v))

    ckpt = sinks.scratch_path(f"ckpt_scur_{uuid.uuid4().hex}")
    q = (
        spark.readStream.format("lakelog_cdf")
        .option("path", dt)
        .option("schema_ddl", "doc_id long, text string")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    support = state.view().localCheckpoint()
    curated = curation.elect_keepers(support).localCheckpoint()
    head = lakelog.read_snapshot(spark, dt)
    ref_support = curation.gate(head).localCheckpoint()
    ref_curated = curation.elect_keepers(ref_support)
    support_missing, support_extra = _ann_key_diff(
        support, ref_support, ["fp", "doc_id", "n_tokens"]
    )
    curated_missing, curated_extra = _ann_key_diff(
        curated, ref_curated, ["fp", "doc_id"]
    )

    out = spark.createDataFrame(
        [
            (
                int(support.count()),
                int(curated.count()),
                int(
                    curated.filter(
                        F.col("doc_id") >= _CUR_OFFSET
                    ).count()
                ),
                int(support_missing),
                int(support_extra),
                int(curated_missing),
                int(curated_extra),
            )
        ],
        "n_support long, n_curated long, n_promoted long, "
        "support_missing long, support_extra long, curated_missing "
        "long, curated_extra long",
    )
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# Near-dup curation maintained from the CDF: exact Jaccard pairs + CC
# ---------------------------------------------------------------------------

_ND_T = 0.5  # trigram-set Jaccard threshold (integer-exact alpha)

_ND_ORACLE = f"""
    WITH RECURSIVE copies AS (
        SELECT doc_id + {_CUR_OFFSET} AS doc_id,
               text || ' zq1 zq2 zq3' AS text
        FROM documents WHERE doc_id % 5 = 0
    ),
    all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM copies
    ),
    head AS (SELECT * FROM all_docs WHERE doc_id % 15 <> 0),
    gated AS (
        SELECT doc_id, text FROM head
        WHERE len(string_split(text, ' ')) BETWEEN 25 AND 5000
          AND len(list_distinct(string_split(lower(text), ' '))) * 1.0
                / len(string_split(text, ' ')) >= 0.35
    ),
    tt AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+',
                                                ' ', 'g')), ' ') AS toks
        FROM gated
    ),
    tok AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS w
        FROM tt, LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) u
        WHERE len(toks) >= 3
    ),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM tok GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE 2 * i >= sa.n + sb.n - i
    ),
    e2 AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL SELECT doc_b AS s, doc_a AS d FROM pairs
    ),
    r(s, d) AS (
        SELECT s, d FROM e2
        UNION
        SELECT r.s, e.d FROM r JOIN e2 e ON r.d = e.s
    ),
    lab AS (
        SELECT s AS node, LEAST(s, MIN(d)) AS component
        FROM r GROUP BY s
    ),
    singles AS (
        SELECT g.doc_id AS node, g.doc_id AS component FROM gated g
        WHERE g.doc_id NOT IN (SELECT s FROM e2)
    ),
    comp AS (SELECT * FROM lab UNION ALL SELECT * FROM singles),
    keepers AS (
        SELECT component AS doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_members
        FROM comp GROUP BY component
    ),
    pins AS (
        SELECT
          CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_pairs,
          CAST((SELECT COUNT(*) FROM keepers
                WHERE doc_id >= {_CUR_OFFSET}) AS BIGINT)
            AS n_promoted,
          CAST((SELECT MAX(n_members) FROM keepers) AS BIGINT)
            AS max_component
    )
    SELECT CAST(doc_id % 10 AS INT) AS key_mod,
           CAST(COUNT(*) AS BIGINT) AS n_curated,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_members) AS BIGINT) AS member_sum,
           pins.n_pairs,
           pins.n_promoted,
           pins.max_component,
           CAST(0 AS BIGINT) AS tok_missing,
           CAST(0 AS BIGINT) AS tok_extra,
           CAST(0 AS BIGINT) AS pairs_missing,
           CAST(0 AS BIGINT) AS pairs_extra,
           CAST(0 AS BIGINT) AS curated_missing,
           CAST(0 AS BIGINT) AS curated_extra
    FROM keepers CROSS JOIN pins
    GROUP BY doc_id % 10, pins.n_pairs, pins.n_promoted,
             pins.max_component
    ORDER BY key_mod
"""


def _neardup_source(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Documents lake with planted NEAR-duplicates: v1's copies carry
    a 3-token suffix, so they are NOT exact duplicates (different
    fingerprint) but their trigram sets overlap at Jaccard ~0.9 —
    strictly above the 0.5 pair threshold, strictly below 1."""
    import shutil

    from etl_lens_spark.operators import lakelog

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    base = sinks.scratch_path(tag)
    shutil.rmtree(base, ignore_errors=True)
    docs.write.parquet(f"{base}/s0")
    lakelog.commit(base, 0, [{"add": "s0"}])
    docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _CUR_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq1 zq2 zq3")).alias("text"),
    ).write.parquet(f"{base}/s1")
    lakelog.commit(base, 1, [{"add": "s1"}])
    lakelog.delete_where(
        spark, base, F.col("doc_id") % 15 == 0, cdf=True
    )
    return base


@query("pipeline_incremental_neardup_curation_cdf", oracle=_ND_ORACLE)
def pipeline_incremental_neardup_curation_cdf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NEAR-DUP curation maintained from the CDF — the curation
    capstone extended past exact duplicates: the keep-list groups by
    EXACT trigram-set Jaccard >= 0.5 (setsim.py's PPJoin family —
    provably lossless prefix/positional filters, so unlike a
    MinHash keep-list this one has a true relational oracle) and
    keeps the min-id representative per CONNECTED COMPONENT of the
    pair graph.

    Why this maintains O(delta): a qualifying pair is a PAIRWISE
    property — inserts can only create pairs that touch the delta
    (delta-self via jaccard_self_join + delta-vs-standing via
    jaccard_rs_join, the module's documented nightly shape), and
    deletes can only remove pairs touching departed ids; no
    surviving pair's status ever changes. The COMPONENT structure is
    not pairwise (a new doc can MERGE two components; a departed doc
    can SPLIT one), so the curated member re-derives per epoch by
    connected components over the MAINTAINED PAIR SET — which is
    delta-sized relative to the corpus (pairs ≪ docs on a deduped
    corpus), the support-member insight again one level up.

    Index: three member rels of ONE log, committed atomically per
    epoch — tok/ (doc_id, w: gated docs' distinct trigrams — the
    probe index for future deltas AND the verify sets), pairs/
    (doc_a, doc_b), curated/ (doc_id = component-min keeper,
    n_members). The fixture's near-copies (3-token suffix, Jaccard
    ~0.9, fingerprint ≠) arrive as v1 inserts; v2 deletes every
    %15==0 original, splitting/shrinking components and promoting
    copy-range keepers.

    Pins, in-output: maintained tok ≡ from-scratch trigram sets of
    the gated head (tok_missing/extra = 0); maintained pairs ≡
    from-scratch jaccard_self_join of the head (pairs_missing/extra
    = 0 — the PPJoin exactness statement under maintenance);
    maintained curated ≡ from-scratch CC + election
    (curated_missing/extra = 0 on (doc_id, n_members)); n_pairs,
    n_promoted, max_component, and the per-bucket keeper summary all
    value-matched by the DuckDB oracle's independent quadratic
    recomputation with a RECURSIVE-CTE transitive closure.

    100 TB posture: delta work is the rs-join (prefix-filtered
    against the standing tok index — candidates near the true-pair
    count, never quadratic) plus a delta self-join; deletes are two
    anti-joins; CC runs over pairs only (O(log diameter) iterations,
    dedup/embedding.py pointer jumping); the quadratic oracle exists
    ONLY on the DuckDB side at test sf."""
    import shutil

    from etl_lens_spark.dedup.embedding import connected_components
    from etl_lens_spark.operators import lakelog, setsim
    from etl_lens_spark.queries.npipe4 import _trigram_sets
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.text import curation

    dt = _neardup_source(spark, sf_dir, "ind_docs")
    ct = sinks.scratch_path("ind_index")
    shutil.rmtree(ct, ignore_errors=True)

    def _gated_docs(docs: DataFrame) -> DataFrame:
        ids = curation.gate(docs).select("doc_id")
        return docs.join(ids, "doc_id", "left_semi")

    def _elect(pairs: DataFrame, tok: DataFrame) -> DataFrame:
        """Curated keepers from the maintained (pairs, tok) state:
        CC over the pair graph + gated singletons."""
        nodes = (
            pairs.select(F.col("doc_a").alias("node"))
            .unionByName(pairs.select(F.col("doc_b").alias("node")))
            .distinct()
        )
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        cc = connected_components(nodes, edges)
        singles = (
            tok.select("doc_id")
            .distinct()
            .join(nodes, F.col("doc_id") == F.col("node"), "left_anti")
            .select(
                F.col("doc_id").alias("node"),
                F.col("doc_id").alias("component"),
            )
        )
        return (
            cc.select("node", "component")
            .unionByName(singles)
            .groupBy(F.col("component").alias("doc_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        )

    # --- seed: tok + pairs + curated in ONE commit
    g0 = _gated_docs(lakelog.read_snapshot(spark, dt, 0))
    _trigram_sets(g0).write.parquet(f"{ct}/tok/t0")
    tok0 = spark.read.parquet(f"{ct}/tok/t0")
    setsim.jaccard_self_join(tok0, _ND_T).select(
        "doc_a", "doc_b"
    ).write.parquet(f"{ct}/pairs/p0")
    p0 = spark.read.parquet(f"{ct}/pairs/p0")
    _elect(p0, tok0).write.parquet(f"{ct}/curated/c0")
    lakelog.commit(
        ct,
        0,
        [{"add": "tok/t0"}, {"add": "pairs/p0"}, {"add": "curated/c0"}],
    )

    # --- epoch 1: delta-only pair discovery (self + rs), re-elect
    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
    )
    tokd = _trigram_sets(_gated_docs(ins)).localCheckpoint()
    tokd.write.parquet(f"{ct}/tok/t1")
    tokd = spark.read.parquet(f"{ct}/tok/t1")
    standing = lakelog.read_table_snapshot(spark, ct, "tok")
    new_pairs = (
        setsim.jaccard_self_join(tokd, _ND_T)
        .select("doc_a", "doc_b")
        .unionByName(
            setsim.jaccard_rs_join(tokd, standing, _ND_T).select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
        )
    )
    new_pairs.write.parquet(f"{ct}/pairs/p1")
    all_tok = standing.unionByName(tokd)
    all_pairs = lakelog.read_table_snapshot(
        spark, ct, "pairs"
    ).unionByName(spark.read.parquet(f"{ct}/pairs/p1"))
    _elect(all_pairs, all_tok).write.parquet(f"{ct}/curated/c1")
    lakelog.commit(
        ct,
        lakelog.latest_version(ct) + 1,
        [
            {"remove": "curated/c0"},
            {"add": "tok/t1"},
            {"add": "pairs/p1"},
            {"add": "curated/c1"},
        ],
    )

    # --- epoch 2: departed ids leave tok + pairs; re-elect
    gone = (
        lakelog.table_changes(spark, dt, 1, 2)
        .filter(F.col("_change_type") == "delete")
        .select(F.col("doc_id").alias("__gone"))
        .distinct()
        .localCheckpoint()
    )
    tok_cur = lakelog.read_table_snapshot(spark, ct, "tok")
    tok_new = tok_cur.join(
        F.broadcast(gone),
        F.col("doc_id") == F.col("__gone"),
        "left_anti",
    )
    pairs_cur = lakelog.read_table_snapshot(spark, ct, "pairs")
    pairs_new = pairs_cur.join(
        F.broadcast(gone),
        F.col("doc_a") == F.col("__gone"),
        "left_anti",
    ).join(
        F.broadcast(gone),
        F.col("doc_b") == F.col("__gone"),
        "left_anti",
    )
    tok_new.write.parquet(f"{ct}/tok/t2")
    pairs_new.write.parquet(f"{ct}/pairs/p2")
    tok_new = spark.read.parquet(f"{ct}/tok/t2")
    pairs_new = spark.read.parquet(f"{ct}/pairs/p2")
    _elect(pairs_new, tok_new).write.parquet(f"{ct}/curated/c2")
    old = list(lakelog.snapshot_actions(ct))
    lakelog.commit(
        ct,
        lakelog.latest_version(ct) + 1,
        [{"remove": r} for r in old]
        + [{"add": "tok/t2"}, {"add": "pairs/p2"}, {"add": "curated/c2"}],
    )

    # --- audits: from-scratch on the head snapshot
    m_tok = lakelog.read_table_snapshot(spark, ct, "tok").localCheckpoint()
    m_pairs = lakelog.read_table_snapshot(
        spark, ct, "pairs"
    ).localCheckpoint()
    m_curated = lakelog.read_table_snapshot(
        spark, ct, "curated"
    ).localCheckpoint()
    head_g = _gated_docs(lakelog.read_snapshot(spark, dt))
    ref_tok = _trigram_sets(head_g).localCheckpoint()
    ref_pairs = (
        setsim.jaccard_self_join(ref_tok, _ND_T)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    ref_curated = _elect(ref_pairs, ref_tok)
    tok_missing, tok_extra = _ann_key_diff(
        m_tok, ref_tok, ["doc_id", "w"]
    )
    pairs_missing, pairs_extra = _ann_key_diff(
        m_pairs, ref_pairs, ["doc_a", "doc_b"]
    )
    curated_missing, curated_extra = _ann_key_diff(
        m_curated, ref_curated, ["doc_id", "n_members"]
    )
    n_pairs = m_pairs.count()
    n_promoted = m_curated.filter(
        F.col("doc_id") >= _CUR_OFFSET
    ).count()
    max_component = m_curated.agg(F.max("n_members")).first()[0]

    out = (
        m_curated.groupBy(
            (F.col("doc_id") % 10).cast("int").alias("key_mod")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_curated"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("n_members").cast("long").alias("member_sum"),
        )
        .select(
            "key_mod",
            "n_curated",
            "id_sum",
            "member_sum",
            F.lit(int(n_pairs)).cast("long").alias("n_pairs"),
            F.lit(int(n_promoted)).cast("long").alias("n_promoted"),
            F.lit(int(max_component))
            .cast("long")
            .alias("max_component"),
            F.lit(int(tok_missing)).cast("long").alias("tok_missing"),
            F.lit(int(tok_extra)).cast("long").alias("tok_extra"),
            F.lit(int(pairs_missing))
            .cast("long")
            .alias("pairs_missing"),
            F.lit(int(pairs_extra)).cast("long").alias("pairs_extra"),
            F.lit(int(curated_missing))
            .cast("long")
            .alias("curated_missing"),
            F.lit(int(curated_extra))
            .cast("long")
            .alias("curated_extra"),
        )
        .orderBy("key_mod")
    )
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(ct, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# Training-run manifest: provenance committed atomically with the data
# ---------------------------------------------------------------------------

def _epoch_state_sql(docs_cte: str) -> str:
    """Oracle fragment: curation of one epoch's document state →
    (n_curated, n_support, digest) — digest is the order-independent
    bit_xor of a 60-bit md5 slice of each curated row, the same
    arithmetic the Spark side uses (verified identical literal by
    literal)."""
    return f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_curated,
               CAST(MAX(ns) AS BIGINT) AS n_support,
               CAST(bit_xor(CAST(concat('0x',
                    substr(md5(fp || '|' || CAST(doc_id AS VARCHAR)
                           || '|' || CAST(n_tokens AS VARCHAR)), 1, 15))
                    AS BIGINT)) AS BIGINT) AS digest
        FROM (
            WITH docs AS ({docs_cte}),
            gated AS (
                SELECT md5(trim(regexp_replace(lower(text), '\\s+',
                                               ' ', 'g'))) AS fp,
                       doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                         AS n_tokens
                FROM docs
                WHERE len(string_split(text, ' ')) BETWEEN 25 AND 5000
                  AND len(list_distinct(string_split(lower(text), ' ')))
                        * 1.0 / len(string_split(text, ' ')) >= 0.35
            ),
            keepers AS (
                SELECT fp, MIN(doc_id) AS doc_id FROM gated GROUP BY fp
            )
            SELECT k.fp, k.doc_id, g.n_tokens,
                   (SELECT COUNT(*) FROM gated) AS ns
            FROM keepers k
            JOIN gated g ON k.fp = g.fp AND k.doc_id = g.doc_id
        )
    """


_MANIF_ORACLE = f"""
    WITH e0 AS ({_epoch_state_sql(
        "SELECT doc_id, text FROM documents")}),
    e1 AS ({_epoch_state_sql(
        "SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + {_CUR_OFFSET}, text "
        "FROM documents WHERE doc_id % 5 = 0")}),
    e2 AS ({_epoch_state_sql(
        "SELECT * FROM (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + {_CUR_OFFSET}, text "
        "FROM documents WHERE doc_id % 5 = 0) "
        "WHERE doc_id % 15 <> 0")})
    SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS epoch,
               CAST(0 AS BIGINT) AS src_version,
               n_curated, n_support, digest,
               CAST(1 AS BIGINT) AS lockstep_ok,
               CAST(0 AS BIGINT) AS replay_mismatch,
               CAST(0 AS BIGINT) AS curated_missing,
               CAST(0 AS BIGINT) AS curated_extra
        FROM e0
        UNION ALL
        SELECT 1, 1, n_curated, n_support, digest, 1, 0, 0, 0 FROM e1
        UNION ALL
        SELECT 2, 2, n_curated, n_support, digest, 1, 0, 0, 0 FROM e2
    ) ORDER BY epoch
"""


def _curated_digest(curated: DataFrame):
    """Order-independent 60-bit content digest of a curated frame —
    the manifest's reproducibility token. bit_xor of a per-row md5
    slice: any row added, dropped, or changed flips it; row order
    and partitioning cannot."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "fp", "doc_id", "n_tokens")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    r = curated.select(h.alias("h")).agg(
        F.expr("bit_xor(h)").alias("d")
    ).first()
    return int(r["d"]) if r["d"] is not None else 0


@query("lake_training_manifest", oracle=_MANIF_ORACLE)
def lake_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-RUN PROVENANCE, COMMITTED WITH THE DATA — the
    reproducibility layer over the curation IVM: every maintenance
    epoch commits a MANIFEST row (epoch, source version, curated
    count, support count, content digest) as a member rel of the
    SAME atomic commit that changes the data, so provenance can
    never desync from the state it describes — there is no version
    at which the manifest claims a state the table does not hold
    (the lockstep pin reads every version and checks both the row
    count AND that the digest of the curated member AT that version
    equals the manifest row shipped WITH that version).

    The digest is an order-independent bit_xor of a 60-bit md5 slice
    per curated row — cheap (one aggregate), deterministic across
    engines, and sensitive to any row change. Two proofs ride it:

    - REPLAY (the reproducibility contract a training run needs):
      for every manifest row, re-derive the curation FROM SCRATCH
      against the SOURCE lake time-traveled to the recorded
      src_version — the digest must reproduce exactly. Anyone
      holding the manifest can rebuild the exact corpus any
      historical run trained on, from the pinned source version.
    - The DuckDB oracle independently recomputes all three epoch
      states (seed / +copies / post-delete) and value-matches
      n_curated, n_support, AND the digest itself — the digest
      arithmetic is cross-engine pinned, not just self-consistent.

    100 TB posture: the manifest row is O(1) per epoch inside the
    commit that already happens; the digest is one map + one
    algebraic aggregate over the curated member (map-side partial);
    replay cost is the from-scratch curation — paid only by audits,
    never by the maintenance loop."""
    import shutil

    from etl_lens_spark.operators import lakelog
    from etl_lens_spark.queries.npipe12 import _ann_key_diff
    from etl_lens_spark.text import curation

    dt = _curation_source(spark, sf_dir, "manif_docs")
    ct = sinks.scratch_path("manif_index")
    shutil.rmtree(ct, ignore_errors=True)

    def _manifest_row(epoch, src_v, idx_v, curated_df, n_support):
        d = _curated_digest(curated_df)
        spark.createDataFrame(
            [(int(epoch), int(src_v), int(idx_v), int(curated_df.count()),
              int(n_support), int(d))],
            "epoch long, src_version long, idx_version long, "
            "n_curated long, n_support long, digest long",
        ).coalesce(1).write.parquet(f"{ct}/manifest/m{epoch}")

    # --- epoch 0
    g0 = curation.gate(lakelog.read_snapshot(spark, dt, 0))
    g0.write.parquet(f"{ct}/support/s0")
    g0 = spark.read.parquet(f"{ct}/support/s0")
    c0 = curation.elect_keepers(g0).localCheckpoint()
    c0.write.parquet(f"{ct}/curated/c0")
    _manifest_row(0, 0, 0, c0, g0.count())
    lakelog.commit(
        ct,
        0,
        [{"add": "support/s0"}, {"add": "curated/c0"},
         {"add": "manifest/m0"}],
    )

    # --- epoch 1: inserts
    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
    )
    gd = curation.gate(ins)
    gd.write.parquet(f"{ct}/support/s1")
    gd = spark.read.parquet(f"{ct}/support/s1")
    adds, _repl = curation.insert_deltas(gd, c0)
    adds.write.parquet(f"{ct}/curated/c1")
    c1 = c0.unionByName(spark.read.parquet(f"{ct}/curated/c1"))
    _manifest_row(1, 1, 1, c1, g0.count() + gd.count())
    lakelog.commit(
        ct,
        1,
        [{"add": "support/s1"}, {"add": "curated/c1"},
         {"add": "manifest/m1"}],
    )

    # --- epoch 2: deletes with promotion
    gone = (
        lakelog.table_changes(spark, dt, 1, 2)
        .filter(F.col("_change_type") == "delete")
        .select(F.col("doc_id").alias("__gone"))
        .distinct()
        .localCheckpoint()
    )
    support_cur = lakelog.read_table_snapshot(spark, ct, "support")
    support_new = support_cur.join(
        F.broadcast(gone),
        F.col("doc_id") == F.col("__gone"),
        "left_anti",
    ).localCheckpoint()
    curated_cur = lakelog.read_table_snapshot(spark, ct, "curated")
    removed, promoted = curation.delete_deltas(
        support_new, curated_cur, gone
    )
    c2 = curated_cur.join(
        removed.select("fp"), "fp", "left_anti"
    ).unionByName(promoted).localCheckpoint()
    support_new.write.parquet(f"{ct}/support/s2")
    c2.write.parquet(f"{ct}/curated/c2")
    _manifest_row(2, 2, 2, c2, support_new.count())
    old = [
        r
        for r in lakelog.snapshot_actions(ct)
        if not r.startswith("manifest/")
    ]
    lakelog.commit(
        ct,
        2,
        [{"remove": r} for r in old]
        + [{"add": "support/s2"}, {"add": "curated/c2"},
           {"add": "manifest/m2"}],
    )

    # --- lockstep: at every version, the manifest has exactly one
    # row per shipped epoch AND its digest matches the curated
    # member AT THAT VERSION
    lockstep_ok = 1
    for v in (0, 1, 2):
        man_v = lakelog.read_table_snapshot(
            spark, ct, "manifest", v
        ).localCheckpoint()
        if man_v.count() != v + 1:
            lockstep_ok = 0
        rec = man_v.filter(F.col("epoch") == v).first()
        cur_v = lakelog.read_table_snapshot(spark, ct, "curated", v)
        if rec is None or _curated_digest(cur_v) != rec["digest"]:
            lockstep_ok = 0

    # --- replay: every manifest row reproduces from its pinned
    # source version, from scratch
    manifest = lakelog.read_table_snapshot(
        spark, ct, "manifest"
    ).localCheckpoint()
    replay_mismatch = 0
    for rec in manifest.collect():
        src = lakelog.read_snapshot(spark, dt, int(rec["src_version"]))
        rebuilt = curation.elect_keepers(curation.gate(src))
        if _curated_digest(rebuilt) != rec["digest"]:
            replay_mismatch += 1

    # --- final equality vs from-scratch
    m_curated = lakelog.read_table_snapshot(spark, ct, "curated")
    head = lakelog.read_snapshot(spark, dt)
    ref_curated = curation.elect_keepers(curation.gate(head))
    curated_missing, curated_extra = _ann_key_diff(
        m_curated, ref_curated, ["fp", "doc_id", "n_tokens"]
    )

    out = manifest.select(
        "epoch",
        "src_version",
        "n_curated",
        "n_support",
        "digest",
        F.lit(int(lockstep_ok)).cast("long").alias("lockstep_ok"),
        F.lit(int(replay_mismatch))
        .cast("long")
        .alias("replay_mismatch"),
        F.lit(int(curated_missing))
        .cast("long")
        .alias("curated_missing"),
        F.lit(int(curated_extra)).cast("long").alias("curated_extra"),
    ).orderBy("epoch")
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(ct, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# Mergeable sketch maintained from the CDF: merge on insert, rebuild
# dial on delete
# ---------------------------------------------------------------------------

_SKI_K = 64

_SKI_V_SQL = """
    list_reduce(list_transform(range(1, 14),
      i -> CAST(strpos('0123456789abcdef',
             substr(md5(CAST(o_custkey AS VARCHAR)), i, 1)) - 1
           AS BIGINT)),
      (a, b) -> a * 16 + b)
"""

_SKI_ORACLE = f"""
    WITH hv_all AS (
      SELECT DISTINCT o_orderpriority AS grp, o_custkey,
             {_SKI_V_SQL} AS v
      FROM orders
    ),
    hv_head AS (
      SELECT DISTINCT o_orderpriority AS grp, o_custkey,
             {_SKI_V_SQL} AS v
      FROM orders WHERE o_orderkey % 17 <> 3
    ),
    sk_all AS (
      SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS r
      FROM (SELECT DISTINCT grp, v FROM hv_all)
    ),
    gone_keys AS (
      SELECT grp, v FROM hv_all
      EXCEPT SELECT grp, v FROM hv_head
    ),
    contaminated AS (
      SELECT COUNT(*) AS n FROM sk_all s
      JOIN gone_keys g ON s.grp = g.grp AND s.v = g.v
      WHERE s.r <= {_SKI_K}
    ),
    sk_head AS (
      SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS r
      FROM (SELECT DISTINCT grp, v FROM hv_head)
    ),
    sk AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS n_sk,
             MAX(CASE WHEN r = {_SKI_K} THEN v END) AS kth
      FROM sk_head WHERE r <= {_SKI_K} GROUP BY grp
    ),
    ex AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
      FROM orders WHERE o_orderkey % 17 <> 3 GROUP BY o_orderpriority
    )
    SELECT s.grp,
           CASE WHEN s.n_sk < {_SKI_K} THEN CAST(s.n_sk AS DOUBLE)
                ELSE {float(_SKI_K - 1)} /
                     (CAST(s.kth AS DOUBLE) / 4503599627370496.0)
           END AS est_custs,
           e.exact_custs,
           CAST(c.n AS BIGINT) AS contaminated_n,
           CAST(1 AS BIGINT) AS rebuild_triggered,
           CAST(0 AS BIGINT) AS merge_missing,
           CAST(0 AS BIGINT) AS merge_extra,
           CAST(0 AS BIGINT) AS post_missing,
           CAST(0 AS BIGINT) AS post_extra
    FROM sk s JOIN ex e USING (grp) CROSS JOIN contaminated c
    ORDER BY s.grp
"""


@query("sketch_kmv_incremental_cdf", oracle=_SKI_ORACLE)
def sketch_kmv_incremental_cdf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE MERGEABLE SKETCH JOINS THE MAINTAINED LOOP — the last
    artifact family still build-per-query gets the CDF pattern, with
    the asymmetry that DEFINES sketches driving the design: inserts
    MERGE in O(delta + k·groups) (bottom-k of the union — the
    mergeability that justifies sketches at 100 TB), but a KMV
    cannot subtract, so deletes drive a CONTAMINATION DIAL and a
    REBUILD — the sketch family's instance of the round's
    dial → re-train → swap contract.

    The maintained artifact is a per-group bottom-64 KMV sketch of
    distinct o_custkey per o_orderpriority, one member rel of a lake
    log (k·groups rows — the 100 TB point is precisely that this
    table is tiny while the corpus is not). Epochs:

    - insert commit: the delta's (grp, hash) set unions with the
      standing sketch and re-ranks — the standing CORPUS is never
      rescanned. Pinned: merged sketch ≡ from-scratch sketch of the
      post-insert snapshot EXACTLY on (grp, v) — KMV merge is
      lossless by construction, and because kmv_value is md5-based
      the DuckDB oracle reproduces the sketch BIT-FOR-BIT.
    - delete commit: contamination = sketch rows whose hash belongs
      to a key that FULLY left its group (a customer with other
      surviving orders in the group does not contaminate — the dial
      is exact, computed by one distinct-key anti-join, and
      value-matched by the oracle's EXCEPT). Any contamination
      over-estimates distincts, so contaminated_n > 0 triggers the
      rebuild: one from-scratch sketch of the head snapshot, one
      commit. Pinned: rebuilt sketch ≡ the oracle's head sketch,
      and the estimate lands within KMV error of the exact count
      (est and exact both value-matched columns).

    100 TB posture: the merge epoch touches delta + k·groups rows
    only; the contamination audit is one anti-join over distinct
    (group, key) sets (the price of DELETE-correctness for any
    non-subtractable summary — cheaper than the rebuild it gates);
    the rebuild is the same one-pass bottom-k as the seed build,
    paid only when the dial fires."""
    import shutil

    from etl_lens_spark.operators import kmv, lakelog
    from etl_lens_spark.queries.npipe12 import _ann_key_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        "o_custkey",
    )
    dt = sinks.scratch_path("ski_orders")
    it = sinks.scratch_path("ski_sketch")
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)
    orders.filter(F.col("o_orderkey") % 10 < 8).write.parquet(
        f"{dt}/s0"
    )
    lakelog.commit(dt, 0, [{"add": "s0"}])
    orders.filter(F.col("o_orderkey") % 10 >= 8).write.parquet(
        f"{dt}/s1"
    )
    lakelog.commit(dt, 1, [{"add": "s1"}])
    lakelog.delete_where(
        spark, dt, F.col("o_orderkey") % 17 == 3, cdf=True
    )

    def _hashes(df: DataFrame) -> DataFrame:
        return df.select(
            "grp", kmv.kmv_value(F.col("o_custkey")).alias("v")
        ).distinct()

    # --- seed sketch
    seed = lakelog.read_snapshot(spark, dt, 0)
    kmv.kmv_topk(_hashes(seed), ["grp"], _SKI_K).write.parquet(
        f"{it}/sketch/s0"
    )
    lakelog.commit(it, 0, [{"add": "sketch/s0"}])

    # --- insert epoch: merge = bottom-k of (standing sketch ∪ delta)
    ins = (
        lakelog.table_changes(spark, dt, 0, 1)
        .filter(F.col("_change_type") == "insert")
        .select("grp", "o_custkey")
    )
    standing = lakelog.read_table_snapshot(spark, it, "sketch")
    kmv.kmv_topk(
        standing.select("grp", "v").unionByName(_hashes(ins)),
        ["grp"],
        _SKI_K,
    ).write.parquet(f"{it}/sketch/s1")
    lakelog.commit(
        it, 1, [{"remove": "sketch/s0"}, {"add": "sketch/s1"}]
    )
    merged = lakelog.read_table_snapshot(
        spark, it, "sketch"
    ).localCheckpoint()
    v1_state = lakelog.read_snapshot(spark, dt, 1)
    merge_ref = kmv.kmv_topk(_hashes(v1_state), ["grp"], _SKI_K)
    merge_missing, merge_extra = _ann_key_diff(
        merged, merge_ref, ["grp", "v"]
    )

    # --- delete epoch: the contamination dial, then the rebuild
    head = lakelog.read_snapshot(spark, dt).localCheckpoint()
    gone_keys = _hashes(v1_state).exceptAll(_hashes(head))
    contaminated_n = merged.join(
        gone_keys, ["grp", "v"], "left_semi"
    ).count()
    rebuild_triggered = int(contaminated_n > 0)
    rebuilt = kmv.kmv_topk(_hashes(head), ["grp"], _SKI_K)
    rebuilt.write.parquet(f"{it}/sketch/s2")
    lakelog.commit(
        it, 2, [{"remove": "sketch/s1"}, {"add": "sketch/s2"}]
    )
    post = lakelog.read_table_snapshot(
        spark, it, "sketch"
    ).localCheckpoint()
    post_ref_sql_equiv = kmv.kmv_topk(_hashes(head), ["grp"], _SKI_K)
    post_missing, post_extra = _ann_key_diff(
        post, post_ref_sql_equiv, ["grp", "v"]
    )

    est = kmv.kmv_estimate(post, ["grp"], _SKI_K)
    exact = head.groupBy("grp").agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_custs")
    )
    out = (
        est.join(exact, "grp")
        .select(
            "grp",
            F.col("est").alias("est_custs"),
            "exact_custs",
            F.lit(int(contaminated_n))
            .cast("long")
            .alias("contaminated_n"),
            F.lit(int(rebuild_triggered))
            .cast("long")
            .alias("rebuild_triggered"),
            F.lit(int(merge_missing)).cast("long").alias("merge_missing"),
            F.lit(int(merge_extra)).cast("long").alias("merge_extra"),
            F.lit(int(post_missing)).cast("long").alias("post_missing"),
            F.lit(int(post_extra)).cast("long").alias("post_extra"),
        )
        .orderBy("grp")
    )
    rows = out.collect()
    shutil.rmtree(dt, ignore_errors=True)
    shutil.rmtree(it, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)
