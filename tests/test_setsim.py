"""Property-based exactness fuzz for operators/setsim.py: the prefix,
length, and positional filters must be lossless on ARBITRARY set
collections, not just the fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_lens_spark.operators import setsim

_corpus = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=25), min_size=1, max_size=12
    ),
    min_size=2,
    max_size=14,
)


def _brute(sets: dict[int, set], t: float, pairs):
    out = []
    for a, b in pairs:
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if u and i / u >= t:
            out.append((a, b, round(i / u, 9)))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_self_join_exact_on_random_corpora(spark, raw):
    t = 0.5
    sets = {i: set(ws) for i, ws in enumerate(raw)}
    rows = [
        (i, f"w{w}") for i, ws in sets.items() for w in ws
    ]
    tok = spark.createDataFrame(rows, "doc_id long, w string")
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jac"], 9))
        for r in setsim.jaccard_self_join(tok, t).collect()
    )
    want = _brute(
        sets,
        t,
        [(a, b) for a in sets for b in sets if a < b],
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(_corpus, _corpus)
def test_rs_join_exact_on_random_corpora(spark, raw_p, raw_i):
    t = 0.5
    probe = {i: set(ws) for i, ws in enumerate(raw_p)}
    index = {1000 + i: set(ws) for i, ws in enumerate(raw_i)}
    tok_p = spark.createDataFrame(
        [(i, f"w{w}") for i, ws in probe.items() for w in ws],
        "doc_id long, w string",
    )
    tok_i = spark.createDataFrame(
        [(i, f"w{w}") for i, ws in index.items() for w in ws],
        "doc_id long, w string",
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jac"], 9))
        for r in setsim.jaccard_rs_join(tok_p, tok_i, t).collect()
    )
    both = {**probe, **index}
    want = _brute(both, t, [(a, b) for a in probe for b in index])
    assert got == want
