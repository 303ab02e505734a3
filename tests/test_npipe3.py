"""Unit tests for the third [N] tranche: segment-level corpus dedup,
n-gram containment, bigram-LM scoring, partial-aggregate merge."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.dedup import minhash as mh
from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.text import pipeline as tp


class TestSegmentDedup:
    def _run(self, spark, rows, seg_tokens=3):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = tp.segment_dedup(df, seg_tokens=seg_tokens)
        return {r["doc_id"]: r for r in out.collect()}

    def test_exact_clone_loses_everything(self, spark):
        r = self._run(
            spark,
            [(1, "a b c d e f"), (2, "a b c d e f")],
        )
        assert r[1]["n_segs"] == 2 and r[1]["n_kept"] == 2
        assert r[1]["rebuilt_text"] == "a b c d e f"
        assert r[2]["n_kept"] == 0 and r[2]["rebuilt_text"] == ""

    def test_partial_overlap_keeps_unique_tail(self, spark):
        # doc 2 repeats doc 1's first segment but has a unique second
        r = self._run(spark, [(1, "a b c d e f"), (2, "a b c x y z")])
        assert r[2]["n_kept"] == 1
        assert r[2]["rebuilt_text"] == "x y z"

    def test_first_seen_ordered_by_doc_then_idx(self, spark):
        # the same segment inside ONE doc: first position wins
        r = self._run(spark, [(7, "a b c a b c")])
        assert r[7]["n_segs"] == 2 and r[7]["n_kept"] == 1
        assert r[7]["rebuilt_text"] == "a b c"

    def test_short_doc_single_segment(self, spark):
        r = self._run(spark, [(1, "hello")], seg_tokens=20)
        assert r[1]["n_segs"] == 1 and r[1]["n_kept"] == 1
        assert r[1]["rebuilt_text"] == "hello"


class TestNgramContainment:
    def test_subset_is_directional(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d e f g h i j")],
            ["doc_id", "text"],
        )
        out = mh.ngram_containment_pairs(df, n=2, min_containment=0.8)
        rows = {(r["doc_sub"], r["doc_sup"]): r["containment"] for r in out.collect()}
        # all 3 of doc1's bigrams appear in doc2 -> containment 1.0
        assert rows == {(1, 2): pytest.approx(1.0)}

    def test_both_directions_when_similar(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d e f")], ["doc_id", "text"]
        )
        out = mh.ngram_containment_pairs(df, n=2, min_containment=0.5)
        rows = {(r["doc_sub"], r["doc_sup"]): r["containment"] for r in out.collect()}
        assert rows[(1, 2)] == pytest.approx(1.0)
        assert rows[(2, 1)] == pytest.approx(3 / 5)


class TestBigramLmScore:
    def test_matches_python_reference(self, spark, sf_dir):
        from etl_lens_spark.queries.npipe3 import text_lm_bigram_score

        out = text_lm_bigram_score(spark, sf_dir)
        got = {r["doc_id"]: r for r in out.collect()}

        import duckdb

        con = duckdb.connect()
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
        from collections import Counter

        cb: Counter = Counter()
        vocab = set()
        doc_bi = {}
        for doc_id, text in docs:
            toks = " ".join(text.strip().split()).split(" ")
            vocab.update(toks)
            bis = list(zip(toks, toks[1:]))
            doc_bi[doc_id] = bis
            cb.update(bis)
        cu: Counter = Counter()
        for (w1, _), c in cb.items():
            cu[w1] += c
        V = len(vocab)
        for doc_id, bis in doc_bi.items():
            if not bis:
                assert got[doc_id]["n_bigrams"] == 0
                assert got[doc_id]["avg_logp"] is None
                continue
            lp = sum(
                math.log((cb[b] + 1.0) / (cu[b[0]] + V)) for b in bis
            ) / len(bis)
            assert got[doc_id]["n_bigrams"] == len(bis)
            assert got[doc_id]["avg_logp"] == pytest.approx(lp, rel=1e-9)


class TestIncrementalAggMerge:
    def test_merge_equals_direct_aggregate(self, spark, sf_dir):
        from etl_lens_spark.queries.npipe3 import incremental_agg_merge

        merged = incremental_agg_merge(spark, sf_dir)
        orders = load_table(spark, sf_dir, "orders")
        direct = (
            orders.groupBy(
                F.date_format("o_orderdate", "yyyy-MM").alias("ym")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("o_totalprice").cast("double").alias("total_price"),
                F.min("o_totalprice").alias("min_price"),
                F.max("o_totalprice").alias("max_price"),
                F.avg("o_totalprice").alias("avg_price"),
            )
            .orderBy("ym")
        )
        m = {r["ym"]: r for r in merged.collect()}
        for r in direct.collect():
            g = m[r["ym"]]
            assert g["n_orders"] == r["n_orders"]
            assert g["total_price"] == pytest.approx(r["total_price"])
            assert g["min_price"] == pytest.approx(r["min_price"])
            assert g["max_price"] == pytest.approx(r["max_price"])
            assert g["avg_price"] == pytest.approx(r["avg_price"])
            assert 1 <= g["n_partials"] <= 2
