"""Jaro-Winkler kernel vs DuckDB's native implementation on
adversarial pairs, plus metric properties."""

from __future__ import annotations

import duckdb
import pytest

from etl_lens_spark.functions.strsim import jaro, jaro_winkler

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("abc", "abc"),
    ("", "abc"),
    ("", ""),
    ("a", "b"),
    ("ab", "ba"),
    ("crate", "trace"),
    ("dwayne", "duane"),
    ("kitten", "sitting"),
    ("aaaa", "aaaaaaaaaaaa"),
    ("prefix match long tail", "prefix match other tail"),
    ("x" * 60, "x" * 59 + "y"),
]


@pytest.mark.parametrize("a,b", PAIRS)
def test_matches_duckdb_native(a, b):
    want = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(jaro_winkler(a, b) - want) < 1e-12


def test_symmetry_and_bounds():
    for a, b in PAIRS:
        assert jaro_winkler(a, b) == jaro_winkler(b, a)
        assert 0.0 <= jaro(a, b) <= 1.0
        assert jaro(a, b) <= jaro_winkler(a, b) <= 1.0
