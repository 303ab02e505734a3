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


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing theorem: documents sharing a substring of length
    >= k + w - 1 (= 8 for k=5, w=4) share at least one fingerprint;
    and a doc has no fingerprint in common with unrelated text."""
    from etl_lens_spark.text.fingerprint import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"AAA {shared} BBB"),
            (2, f"zzz totally different prefix {shared}"),
            (3, "unrelated content with nothing in common at all xyzw"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring produced no shared fp"
    assert not (by_doc[1] & by_doc[3]), "false positive vs unrelated text"


def test_fingerprint_candidates_hot_bucket_guard(spark):
    """A fingerprint present in more docs than max_bucket must not
    generate pairs (boilerplate guard)."""
    from etl_lens_spark.text.fingerprint import fingerprint_candidates

    rows = [(i, 999) for i in range(10)] + [(1, 7), (2, 7)]
    fps = spark.createDataFrame(rows, "doc_id long, fp long")
    out = fingerprint_candidates(fps, min_shared=1, max_bucket=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
