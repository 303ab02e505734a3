"""Incremental view maintenance (operators/ivm.py): the delta-rule
algebra is pinned against full recomputation — maintained view ==
recompute from final states, exactly, on every change shape: insert,
delete, update (image pair), group creation, group disappearance,
simultaneous churn on BOTH join sides, and a seeded random soak."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_lens_spark.operators import ivm


def _view(o, c):
    """Reference recompute: γ_nk(count, sum cents)(O ⋈ C)."""
    return (
        o.join(c, "custkey")
        .groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _maintained(spark, o0, c0, o1, c1, do_rows, dc_rows):
    do = spark.createDataFrame(
        do_rows, "k long, custkey long, cents long, _change_type string"
    )
    dc = spark.createDataFrame(
        dc_rows, "custkey long, nk long, _change_type string"
    )
    dz_o = ivm.changes_to_zset(do, ["k", "custkey", "cents"])
    dz_c = ivm.changes_to_zset(dc, ["custkey", "nk"])
    delta = ivm.delta_join(o0, dz_o, c0, dz_c, ["custkey"])
    return ivm.maintain_agg(
        _view(o0, c0), delta, ["nk"], "n", {"s": F.col("cents")}
    )


def test_ivm_matches_recompute_all_change_shapes(spark):
    o0 = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 300), (4, 30, 400)],
        "k long, custkey long, cents long",
    )
    c0 = spark.createDataFrame(
        [(10, 1), (20, 1), (30, 2)], "custkey long, nk long"
    )
    # orders: update k=1 (image pair), delete k=3, insert k=5 (new
    # customer 40 — group creation path exercised via c delta too)
    do_rows = [
        (1, 10, 100, "update_preimage"),
        (1, 10, 150, "update_postimage"),
        (3, 20, 300, "delete"),
        (5, 40, 500, "insert"),
    ]
    # customers: move custkey 30 from nk=2 to nk=3 (its group nk=2
    # DISAPPEARS — count reaches zero), insert custkey 40 at nk=9
    dc_rows = [
        (30, 2, "update_preimage"),
        (30, 3, "update_postimage"),
        (40, 9, "insert"),
    ]
    o1 = spark.createDataFrame(
        [(1, 10, 150), (2, 10, 200), (4, 30, 400), (5, 40, 500)],
        "k long, custkey long, cents long",
    )
    c1 = spark.createDataFrame(
        [(10, 1), (20, 1), (30, 3), (40, 9)], "custkey long, nk long"
    )
    got = _rows(_maintained(spark, o0, c0, o1, c1, do_rows, dc_rows))
    want = _rows(_view(o1, c1))
    assert got == want
    assert (2,) not in {(r[0],) for r in got}  # nk=2 really vanished


def test_ivm_delta_on_one_side_only(spark):
    o0 = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k long, custkey long, cents long"
    )
    c0 = spark.createDataFrame(
        [(10, 1), (20, 2)], "custkey long, nk long"
    )
    do_rows = [(9, 10, 900, "insert")]
    o1 = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (9, 10, 900)],
        "k long, custkey long, cents long",
    )
    got = _rows(_maintained(spark, o0, c0, o1, c0, do_rows, []))
    assert got == _rows(_view(o1, c0))


def test_ivm_consolidate_nets_churn(spark):
    z = spark.createDataFrame(
        [
            (1, 10, 100, "insert"),
            (1, 10, 100, "delete"),
            (1, 10, 100, "insert"),
            (2, 10, 200, "update_preimage"),
        ],
        "k long, custkey long, cents long, _change_type string",
    )
    out = _rows(
        ivm.consolidate(
            ivm.changes_to_zset(z, ["k", "custkey", "cents"])
        )
    )
    assert out == [(1, 10, 100, 1), (2, 10, 200, -1)]


def test_ivm_random_soak_matches_recompute(spark):
    rng = random.Random(1234)
    custs = list(range(100, 120))
    o0_rows = [
        (k, rng.choice(custs), rng.randrange(1, 1000))
        for k in range(1, 61)
    ]
    c0_rows = [(c, rng.randrange(0, 5)) for c in custs]
    o0 = spark.createDataFrame(
        o0_rows, "k long, custkey long, cents long"
    )
    c0 = spark.createDataFrame(c0_rows, "custkey long, nk long")

    o_state = {k: (c, v) for k, c, v in o0_rows}
    do_rows = []
    for k in list(o_state):
        r = rng.random()
        if r < 0.2:  # delete
            c, v = o_state.pop(k)
            do_rows.append((k, c, v, "delete"))
        elif r < 0.4:  # update cents
            c, v = o_state[k]
            nv = rng.randrange(1, 1000)
            do_rows.append((k, c, v, "update_preimage"))
            do_rows.append((k, c, nv, "update_postimage"))
            o_state[k] = (c, nv)
    for k in range(61, 76):  # inserts
        c, v = rng.choice(custs), rng.randrange(1, 1000)
        do_rows.append((k, c, v, "insert"))
        o_state[k] = (c, v)

    c_state = dict(c0_rows)
    dc_rows = []
    for c in custs:
        if rng.random() < 0.3:  # move nation
            old = c_state[c]
            new = (old + rng.randrange(1, 5)) % 5
            dc_rows.append((c, old, "update_preimage"))
            dc_rows.append((c, new, "update_postimage"))
            c_state[c] = new

    o1 = spark.createDataFrame(
        [(k, c, v) for k, (c, v) in o_state.items()],
        "k long, custkey long, cents long",
    )
    c1 = spark.createDataFrame(
        list(c_state.items()), "custkey long, nk long"
    )
    got = _rows(_maintained(spark, o0, c0, o1, c1, do_rows, dc_rows))
    assert got == _rows(_view(o1, c1))


def test_maintain_distinct_support_and_underflow(spark):
    import pytest

    support0 = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (2, 10, 1)],
        "g long, v long, cnt long",
    )
    # delete one of g=1's two refs to v=10 (distinct unchanged),
    # delete g=1's only ref to v=11 (distinct drops), insert a new
    # value into g=2 (distinct grows)
    delta = spark.createDataFrame(
        [
            (1, 10, "delete"),
            (1, 11, "delete"),
            (2, 12, "insert"),
        ],
        "g long, v long, _change_type string",
    )
    from etl_lens_spark.operators import ivm

    dz = ivm.changes_to_zset(delta, ["g", "v"])
    new = ivm.maintain_distinct(support0, dz, ["g"], "v")
    got = sorted(tuple(r) for r in new.collect())
    assert got == [(1, 10, 1), (2, 10, 1), (2, 12, 1)]
    dcounts = {
        r.g: r["count"] for r in new.groupBy("g").count().collect()
    }
    assert dcounts == {1: 1, 2: 2}
    # deleting a value the support never held must refuse, not clamp
    bad = ivm.changes_to_zset(
        spark.createDataFrame(
            [(9, 99, "delete")], "g long, v long, _change_type string"
        ),
        ["g", "v"],
    )
    with pytest.raises(ValueError, match="underflow"):
        ivm.maintain_distinct(support0, bad, ["g"], "v")


def test_maintain_minmax_extrema_move_and_group_death(spark):
    support0 = spark.createDataFrame(
        [(1, 5, 1), (1, 9, 2), (2, 7, 1)], "g long, v long, cnt long"
    )
    view0 = spark.createDataFrame(
        [(1, 5, 9, 3), (2, 7, 7, 1)],
        "g long, vmin long, vmax long, n long",
    )
    # kill g=1's minimum (min must move to 9), kill g=2 entirely,
    # create g=3
    delta = ivm.changes_to_zset(
        spark.createDataFrame(
            [
                (1, 5, "delete"),
                (2, 7, "delete"),
                (3, 4, "insert"),
            ],
            "g long, v long, _change_type string",
        ),
        ["g", "v"],
    )
    support1 = ivm.maintain_distinct(support0, delta, ["g"], "v")
    touched = delta.select("g").distinct()
    view1 = ivm.maintain_minmax(view0, support1, touched, ["g"], "v")
    got = sorted(tuple(r) for r in view1.collect())
    assert got == [(1, 9, 9, 2), (3, 4, 4, 1)]


def test_maintain_minmax_untouched_groups_pass_through(spark):
    support0 = spark.createDataFrame(
        [(g, v, 1) for g in range(5) for v in (g, g + 10)],
        "g long, v long, cnt long",
    )
    view0 = support0.groupBy("g").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("cnt").cast("long").alias("n"),
    )
    delta = ivm.changes_to_zset(
        spark.createDataFrame(
            [(0, 0, "delete")], "g long, v long, _change_type string"
        ),
        ["g", "v"],
    )
    support1 = ivm.maintain_distinct(support0, delta, ["g"], "v")
    touched = delta.select("g").distinct()
    view1 = ivm.maintain_minmax(view0, support1, touched, ["g"], "v")
    got = {r.g: (r.vmin, r.vmax, r.n) for r in view1.collect()}
    assert got[0] == (10, 10, 1)  # min moved
    for g in range(1, 5):  # untouched groups identical
        assert got[g] == (g, g + 10, 2)


def test_maintain_topk_rank_movement_and_pass_through(spark):
    """Deleting a ranked value must pull the invisible next one into
    the view; untouched groups keep their rows verbatim; a group
    shrinks below k when its support does."""
    support0 = spark.createDataFrame(
        [(1, v, 1) for v in (50, 40, 30, 20)]
        + [(2, 9, 1), (2, 8, 1)]
        + [(3, 7, 2)],
        "g long, v long, cnt long",
    )
    w_rows = [
        (1, 1, 50, 1), (1, 2, 40, 1), (1, 3, 30, 1),
        (2, 1, 9, 1), (2, 2, 8, 1),
        (3, 1, 7, 2),
    ]
    view0 = spark.createDataFrame(
        w_rows, "g long, rank long, v long, cnt long"
    )
    # kill g=1's 2nd-largest (40): 20 must surface at rank 3;
    # kill one of g=3's two refs to 7 (view row survives, cnt drops);
    # g=2 untouched
    delta = ivm.changes_to_zset(
        spark.createDataFrame(
            [(1, 40, "delete"), (3, 7, "delete")],
            "g long, v long, _change_type string",
        ),
        ["g", "v"],
    )
    support1 = ivm.maintain_distinct(support0, delta, ["g"], "v")
    touched = delta.select("g").distinct()
    view1 = ivm.maintain_topk(view0, support1, touched, ["g"], "v", 3)
    got = sorted(tuple(r) for r in view1.collect())
    assert got == [
        (1, 1, 50, 1), (1, 2, 30, 1), (1, 3, 20, 1),
        (2, 1, 9, 1), (2, 2, 8, 1),
        (3, 1, 7, 1),
    ]
