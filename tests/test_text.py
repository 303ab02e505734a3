"""Text analysis signals on literal documents."""

from __future__ import annotations

import pytest

from etl_lens_spark.text import analysis as ta


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, 42 times!"), (2, "one")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ta.add_token_counts(df).collect()}
    assert out[1]["n_ws_tokens"] == 4
    # ello + H? BPE-ish: [Hello][world][,][42][times][!] → H is upper+lower run
    assert out[1]["n_bpe_ish_tokens"] == 6
    assert out[2]["n_ws_tokens"] == 1


def test_quality_signals(spark):
    text = "The quick brown fox. " * 10  # 40 tokens, repetitive
    df = spark.createDataFrame([(1, text.strip())], "doc_id long, text string")
    r = ta.add_quality_signals(df).collect()[0]
    assert r["n_tokens"] == 40
    assert r["punct_ratio"] == pytest.approx(10 / r["n_chars_actual"])
    assert r["n_distinct_tokens"] == 4  # The / quick / brown / "fox."
    assert 0.0 <= r["quality_score"] <= 1.0


def test_langid_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is big"),
            (2, "el perro de la casa que los gatos"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in ta.add_langid(df).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"
