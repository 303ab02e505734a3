"""Text analysis for training-data pipelines: token counting, quality
signals, heuristic language ID, document fingerprinting.

Everything here is built-in-function Spark (regexp/split/length
arithmetic) — no UDFs — so it runs inside whole-stage codegen and
costs one scan. These are the filters that run over *every* document
at 100 TB, so staying JVM-side is the difference between scan-bound
and Python-bound.

Regex note: patterns are restricted to the class syntax that Java
regex (Spark) and RE2 (DuckDB, for oracles) interpret identically —
explicit character classes, no lookaround, no \\p{...}.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"
BPE_ISH = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}


def whitespace_tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword-unit count (regex over
    letter-runs / digit-runs / single symbols — a deterministic proxy
    for tokenizer cost used to budget training data)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_ws_tokens": F.size(whitespace_tokens(t)).cast("long"),
            "n_bpe_ish_tokens": F.size(
                F.regexp_extract_all(t, F.lit(BPE_ISH), F.lit(0))
            ).cast("long"),
        }
    )


def add_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / casing / repetition signals + a composite
    quality score. All ratios are double arithmetic over exact integer
    counts, so they are engine-portable bit-for-bit."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(whitespace_tokens(t)).cast("long")
    n_distinct_tokens = F.size(F.array_distinct(whitespace_tokens(t))).cast("long")
    n_punct = (F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))).cast("long")
    n_upper = (F.length(t) - F.length(F.regexp_replace(t, "[A-Z]", ""))).cast("long")
    n_digit = (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("long")
    avg_token_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    upper_ratio = n_upper.cast("double") / n_chars
    digit_ratio = n_digit.cast("double") / n_chars
    distinct_ratio = n_distinct_tokens.cast("double") / n_tokens
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), 0.4).otherwise(0.0)
        + F.when((avg_token_len >= 3) & (avg_token_len <= 12), 0.3).otherwise(0.0)
        + (distinct_ratio * 0.3)
    )
    return df.withColumns(
        {
            "n_chars_actual": n_chars,
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct_tokens,
            "avg_token_len": avg_token_len,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "digit_ratio": digit_ratio,
            "distinct_token_ratio": distinct_ratio,
            "quality_score": quality,
        }
    )


def _marker_count(tokens: Column, markers: list[str]) -> Column:
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(
        F.filter(tokens, lambda tok: F.array_contains(marker_arr, tok))
    ).cast("long")


def add_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count per-language stopword markers over
    lowercase tokens, predict the argmax (ties broken by fixed
    language order en > es > fr, 'und' when no marker hits)."""
    tokens = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    scores = {
        lang: _marker_count(tokens, markers)
        for lang, markers in LANG_MARKERS.items()
    }
    en, es, fr = scores["en"], scores["es"], scores["fr"]
    pred = (
        F.when((en == 0) & (es == 0) & (fr == 0), "und")
        .when((en >= es) & (en >= fr), "en")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return df.withColumns(
        {
            "score_en": en,
            "score_es": es,
            "score_fr": fr,
            "lang_pred": pred,
        }
    )
