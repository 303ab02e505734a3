"""String-similarity kernels for entity resolution.

Jaro-Winkler (the record-linkage standard since Winkler 1990, public
algorithm) — textbook parameters: prefix scale p=0.1, max prefix 4,
boost threshold 0.7. Verified bit-equal against DuckDB's native
``jaro_winkler_similarity`` on adversarial pairs
(tests/test_strsim.py), which is what makes an oracle-checked fuzzy
join possible. Exposed as an Arrow-batched pandas UDF — the scoring
loop is per-candidate-pair Python, so keep it BEHIND a blocking join
(never all-pairs): the blocking key bounds the quadratic term, the
UDF only prices survivors.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf


def jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    # empty-first, matching DuckDB: two empty strings score 0, not 1
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (
        matches / l1 + matches / l2 + (matches - t) / matches
    ) / 3


def jaro_winkler(s1: str, s2: str, p: float = 0.1, bt: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j > bt:
        pref = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pref += 1
        j += pref * p * (1 - j)
    return j


def jaro_winkler_udf():
    """Build the Arrow-batched JW column function. Constructed at
    call time (not import time) so executor-side re-imports of this
    module never touch the SparkSession."""
    jw = jaro_winkler

    def _score(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [jw(a, b) for a, b in zip(s1, s2)], dtype="float64"
        )

    return pandas_udf(_score, "double")
