"""Unit tests for text/pipeline.py — the edge cases the fixture-backed
oracles can't reach (short docs, utm orderings, PII adjacency)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.text import pipeline as tp


def _one(spark, expr, **cols):
    df = spark.createDataFrame([cols or {"x": 1}])
    return df.select(expr.alias("v")).collect()[0]["v"]


class TestWordNgrams:
    def test_short_doc_yields_empty_not_descending(self, spark):
        # 2 tokens, n=3: sequence(1, 0) would DESCEND without the guard
        v = _one(
            spark, tp.word_ngrams(F.split(F.lit("a b"), " "), 3)
        )
        assert v == []

    def test_exact_length(self, spark):
        v = _one(spark, tp.word_ngrams(F.split(F.lit("a b c"), " "), 3))
        assert v == ["a b c"]

    def test_bigrams(self, spark):
        v = _one(spark, tp.word_ngrams(F.split(F.lit("a b c"), " "), 2))
        assert v == ["a b", "b c"]


class TestRepetitionSignals:
    def test_degenerate_repetition_flags_high(self, spark):
        df = spark.createDataFrame(
            [
                (1, "spam spam spam spam spam spam"),
                (2, "one two three four five six"),
                (3, "x"),  # shorter than any n-gram: zero-filled
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r
            for r in tp.repetition_signals(df, ns=(2, 3)).collect()
        }
        assert rows[1]["top2_frac"] == 1.0
        assert rows[1]["dup2_frac"] == 1.0
        assert rows[2]["top2_frac"] == pytest.approx(1 / 5)
        assert rows[2]["dup2_frac"] == 0.0
        assert rows[3]["top2_frac"] == 0.0 and rows[3]["dup3_frac"] == 0.0


class TestChunkSliding:
    def test_covers_all_tokens_with_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(50))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = tp.chunk_sliding(df, chunk_tokens=32, stride=24).collect()
        assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
        assert rows[0]["n_chunk_tokens"] == 32
        assert rows[0]["chunk_text"].split()[:2] == ["t0", "t1"]
        # stride 24: second chunk starts at token 24, overlaps 8
        assert rows[1]["chunk_text"].split()[0] == "t24"
        assert rows[2]["chunk_text"].split()[0] == "t48"
        assert rows[2]["n_chunk_tokens"] == 2

    def test_doc_shorter_than_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        rows = tp.chunk_sliding(df).collect()
        assert len(rows) == 1
        assert rows[0]["chunk_text"] == "a b c"

    def test_bad_stride_rejected(self, spark):
        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            tp.chunk_sliding(df, stride=0)


class TestRedactPii:
    @pytest.mark.parametrize(
        "dirty,clean",
        [
            ("mail bob.smith+x@a-b.example.co now", "mail [EMAIL] now"),
            ("call +1-415-555-0142 now", "call [PHONE] now"),
            ("from 10.2.0.199 now", "from [IPV4] now"),
            (
                "a@b.io and c@d.io, +44-207-946-0958, 192.168.0.1",
                "[EMAIL] and [EMAIL], [PHONE], [IPV4]",
            ),
            ("no pii here 12.34 v1.2.3.4beta", "no pii here 12.34 v1.2.3.4beta"),
        ],
    )
    def test_patterns(self, spark, dirty, clean):
        assert _one(spark, tp.redact_pii(F.lit(dirty))) == clean

    def test_counts(self, spark):
        cs = tp.pii_counts(F.lit("a@b.io c@d.io 10.0.0.1"))
        df = spark.range(1).select(
            *[c.alias(k) for k, c in cs.items()]
        )
        r = df.collect()[0]
        assert r["n_email"] == 2 and r["n_ipv4"] == 1 and r["n_phone"] == 0


class TestNormalizeUrl:
    @pytest.mark.parametrize(
        "raw,norm",
        [
            ("HTTPS://WWW.Ex.COM/Path/", "https://ex.com/Path"),
            ("https://ex.com/p#frag", "https://ex.com/p"),
            ("https://ex.com/p?utm_source=x", "https://ex.com/p"),
            ("https://ex.com/p?utm_source=x&id=2", "https://ex.com/p?id=2"),
            ("https://ex.com/p?id=2&utm_medium=m", "https://ex.com/p?id=2"),
            (
                "https://ex.com/p?utm_a=1&utm_b=2#f",
                "https://ex.com/p",
            ),
            ("https://ex.com", "https://ex.com"),
            # path/query case is preserved — only authority lowercases
            ("http://Ex.Com/CaseSensitive?Q=V", "http://ex.com/CaseSensitive?Q=V"),
        ],
    )
    def test_normalize(self, spark, raw, norm):
        assert _one(spark, tp.normalize_url(F.lit(raw))) == norm


class TestContamination:
    def test_planted_leak_detected(self, spark):
        leak = "alpha beta gamma delta epsilon zeta eta theta iota"
        train = spark.createDataFrame(
            [(1, leak + " tail tokens here"), (2, "totally unrelated words only")],
            ["doc_id", "text"],
        )
        evalset = spark.createDataFrame(
            [(100, "prefix " + leak)], ["doc_id", "text"]
        )
        rows = tp.contamination_overlap(train, evalset, k=8).collect()
        assert [r["doc_id"] for r in rows] == [1]
        # 9-token leak shared → two overlapping 8-grams
        assert rows[0]["n_overlap_kgrams"] == 2
