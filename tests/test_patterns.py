"""MATCH_RECOGNIZE operator: greedy NFA semantics on known
sequences (quantifier bounds, skip-past-last-row non-overlap,
optional steps, run-breaking labels)."""

from __future__ import annotations

import pandas as pd

from etl_lens_spark.operators.patterns import Step, _find_matches, match_pattern


def spans(labels, steps):
    return list(_find_matches(labels, steps))


def test_greedy_unbounded_takes_whole_run():
    labels = ["D", "D", "D", "U", "U"]
    out = spans(labels, [Step("D", 2), Step("U", 2)])
    assert out == [[(0, 3), (3, 5)]]


def test_min_count_unmet_no_match():
    assert spans(["D", "U", "U"], [Step("D", 2), Step("U", 2)]) == []


def test_max_count_bounds_consumption():
    # D{2,2} U{1,}: only two of the three Ds are consumed, so the
    # match must start at index 1 for U to be adjacent
    out = spans(
        ["D", "D", "D", "U"], [Step("D", 2, 2), Step("U", 1)]
    )
    assert out == [[(1, 3), (3, 4)]]


def test_skip_past_last_row_non_overlapping():
    labels = ["E", "E", "E", "E", "E", "E", None, "E", "E", "E"]
    out = spans(labels, [Step("E", 3)])
    # one maximal match per island (greedy eats all six), not sliding
    assert out == [[(0, 6)], [(7, 10)]]


def test_optional_step_zero_rows():
    # A{1,} B{0,} C{1,} with no Bs present
    out = spans(["A", "C"], [Step("A", 1), Step("B", 0), Step("C", 1)])
    assert out == [[(0, 1), (1, 1), (1, 2)]]


def test_breaker_label_splits_runs():
    out = spans(["E", "E", None, "E", "E"], [Step("E", 3)])
    assert out == []


def test_match_pattern_end_to_end(spark):
    # two users: u1 has a V (10,8,6,7,9); u2 monotonic up (no match)
    rows = [
        (1, i, float(v)) for i, v in enumerate([10, 8, 6, 7, 9])
    ] + [(2, i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "u long, i long, v double")

    def classify(pdf: pd.DataFrame) -> pd.Series:
        d = pdf["v"].diff()
        return pd.Series(
            ["D" if x < 0 else "U" if x > 0 else None for x in d],
            index=pdf.index,
            dtype=object,
        )

    def measures(pdf, sp):
        (d0, d1), (u0, u1) = sp
        return {
            "strt_i": int(pdf["i"].iloc[d0 - 1]),
            "end_i": int(pdf["i"].iloc[u1 - 1]),
            "n_down": d1 - d0,
            "n_up": u1 - u0,
        }

    out = match_pattern(
        df,
        ["u"],
        ["i"],
        classify,
        [Step("D", 2), Step("U", 2)],
        measures,
        "u long, strt_i long, end_i long, n_down long, n_up long",
    ).collect()
    assert [(r.u, r.strt_i, r.end_i, r.n_down, r.n_up) for r in out] == [
        (1, 0, 4, 2, 2)
    ]


def test_bucketed_equals_per_key(spark):
    import pandas as pd

    rows = []
    vals = [10, 8, 6, 7, 9, 9, 5, 3, 4, 6]
    for u in range(20):
        for i, v in enumerate(vals):
            rows.append((u, i, float(v + (u % 3))))
    df = spark.createDataFrame(rows, "u long, i long, v double")

    def classify(pdf):
        d = pdf["v"].diff()
        return pd.Series(
            ["D" if x < 0 else "U" if x > 0 else None for x in d],
            index=pdf.index,
            dtype=object,
        )

    def measures(pdf, sp):
        (d0, d1), (u0, u1) = sp
        return {
            "strt_i": int(pdf["i"].iloc[d0 - 1]),
            "end_i": int(pdf["i"].iloc[u1 - 1]),
        }

    kwargs = dict(
        key_cols=["u"],
        order_cols=["i"],
        classify=classify,
        steps=[Step("D", 2), Step("U", 2)],
        measures=measures,
        output_schema="u long, strt_i long, end_i long",
    )
    per_key = sorted(
        (r.u, r.strt_i, r.end_i)
        for r in match_pattern(df, **kwargs).collect()
    )
    bucketed = sorted(
        (r.u, r.strt_i, r.end_i)
        for r in match_pattern(df, n_buckets=4, **kwargs).collect()
    )
    assert per_key == bucketed and len(per_key) > 0


def test_fuzz_greedy_semantics_properties():
    """Hypothesis fuzz: on random label sequences and random
    quantifier specs, every match must satisfy the four greedy
    invariants (label purity, quantifier bounds, greedy maximality,
    skip-past-last-row completeness)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    labels_st = st.lists(
        st.sampled_from(["A", "B", None]), min_size=0, max_size=40
    )
    steps_st = st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=3),
            st.sampled_from([None, 1, 2, 3]),
        ),
        min_size=1,
        max_size=3,
    )

    @settings(max_examples=300, deadline=None)
    @given(labels=labels_st, raw_steps=steps_st)
    def check(labels, raw_steps):
        steps = [
            Step(n, mn, mx if (mx is None or mx >= mn) else mn)
            for n, mn, mx in raw_steps
        ]
        matches = list(_find_matches(labels, steps))
        prev_end = -1
        covered_starts = set()
        for spans in matches:
            assert len(spans) == len(steps)
            cur = spans[0][0]
            assert cur > prev_end  # non-overlapping, ordered
            for (s0, s1), step in zip(spans, steps):
                assert s0 == cur  # contiguous
                n = s1 - s0
                assert n >= step.min_count
                if step.max_count is not None:
                    assert n <= step.max_count
                for i in range(s0, s1):
                    assert labels[i] == step.name  # label purity
                # greedy maximality: stopped only at max, label
                # break, or end of input
                if step.max_count is None or n < step.max_count:
                    assert (
                        s1 >= len(labels) or labels[s1] != step.name
                    )
                cur = s1
            assert cur > spans[0][0]  # non-empty match
            covered_starts.update(range(spans[0][0], cur))
            prev_end = cur - 1
        # completeness: at any position not inside a match, greedy
        # matching must fail (otherwise the scan would have matched)
        for pos in range(len(labels)):
            if pos in covered_starts:
                continue
            sub = list(
                _find_matches(labels[pos:], steps)
            )
            if sub:
                # a match may exist further right (the scan finds it
                # later) but never AT an uncovered position itself
                assert sub[0][0][0] != 0

    check()
