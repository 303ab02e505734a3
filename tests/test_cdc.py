"""Micro-fixture tests for the CDC operators (operators/cdc.py):
hand-computed diff statuses, MERGE latest-wins/delete/insert
semantics, and checksum drift localization."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.operators.cdc import (
    merge_apply,
    row_digest,
    snapshot_diff,
    table_checksum,
)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, None, "d")],
        "k int, v int, s string",
    )
    new = spark.createDataFrame(
        [(2, 20, "b"), (3, 31, "c"), (4, None, "d"), (5, 50, "e")],
        "k int, v int, s string",
    )
    out = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, "k", ["v", "s"]).collect()
    }
    assert out == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # null == null under eqNullSafe
        5: "added",
    }


def test_snapshot_diff_null_transitions(spark):
    old = spark.createDataFrame([(1, None), (2, 5)], "k int, v int")
    new = spark.createDataFrame([(1, 7), (2, None)], "k int, v int")
    out = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    # Presence comes from join-side markers: a NULL→value or
    # value→NULL transition is a CHANGE, never absence.
    assert out == {1: "changed", 2: "changed"}


def test_merge_apply_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k int, name string, bal int",
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 10, "a2", 110),  # update, superseded below
            (1, "U", 20, "a3", 120),  # latest wins
            (2, "D", 11, None, None),  # delete
            (4, "U", 12, "d", 400),  # insert of a new key
            (5, "D", 13, None, None),  # delete of a missing key: no-op
        ],
        "k int, op string, seq int, name string, bal int",
    )
    rows = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_apply(base, changes, "k").collect()
    }
    assert rows == {1: ("a3", 120), 3: ("c", 300), 4: ("d", 400)}


def test_merge_apply_delete_then_reinsert_latest_wins(spark):
    base = spark.createDataFrame([(1, "x")], "k int, name string")
    changes = spark.createDataFrame(
        [(1, "D", 1, None), (1, "U", 2, "y")],
        "k int, op string, seq int, name string",
    )
    rows = merge_apply(base, changes, "k").collect()
    assert [(r["k"], r["name"]) for r in rows] == [(1, "y")]


def _checksums(df):
    d = row_digest([F.col("k").cast("string"), F.col("v")])
    out = table_checksum(df, d, F.col("k") % 4)
    return {r["bucket"]: (r["n_rows"], r["checksum"]) for r in out.collect()}


def test_table_checksum_localizes_drift(spark):
    rows = [(i, f"v{i}") for i in range(40)]
    a = spark.createDataFrame(rows, "k int, v string")
    # One perturbed value (k=6 → bucket 2) and one dropped row
    # (k=13 → bucket 1): exactly those two buckets must mismatch.
    rows_b = [(k, "CORRUPT" if k == 6 else v) for k, v in rows if k != 13]
    b = spark.createDataFrame(rows_b, "k int, v string")
    ca, cb = _checksums(a), _checksums(b)
    bad = {bkt for bkt in ca if ca[bkt] != cb.get(bkt)}
    assert bad == {1, 2}
    assert ca[0] == cb[0] and ca[3] == cb[3]


def test_table_checksum_is_order_independent(spark):
    rows = [(i, f"v{i}") for i in range(40)]
    a = spark.createDataFrame(rows, "k int, v string")
    shuffled = spark.createDataFrame(rows[::-1], "k int, v string").repartition(
        7
    )
    assert _checksums(a) == _checksums(shuffled)


def _scd2_rows(df):
    return sorted(
        (
            r["k"],
            r["version_seq"],
            r["v"],
            r["valid_from_us"],
            r["valid_to_us"],
            r["is_current"],
        )
        for r in df.collect()
    )


def test_scd2_apply_changes_single_batch(spark):
    """One CDF batch: update closes+opens, delete closes, insert
    opens; untouched keys pass through bit-identical."""
    from etl_lens_spark.operators.cdc import scd2_apply_changes

    dim = spark.createDataFrame(
        [(1, 1, "a", 100, None, 1), (2, 1, "b", 100, None, 1),
         (3, 1, "c", 100, None, 1)],
        "k int, version_seq long, v string, valid_from_us long, "
        "valid_to_us long, is_current long",
    )
    feed = spark.createDataFrame(
        [(1, "a", "update_preimage"), (1, "a2", "update_postimage"),
         (2, "b", "delete"), (4, "d", "insert")],
        "k int, v string, _change_type string",
    )
    out = scd2_apply_changes(dim, feed, ["k"], ["v"], 200)
    assert _scd2_rows(out) == [
        (1, 1, "a", 100, 200, 0),
        (1, 2, "a2", 200, None, 1),
        (2, 1, "b", 100, 200, 0),
        (3, 1, "c", 100, None, 1),
        (4, 1, "d", 200, None, 1),
    ]


def test_scd2_apply_changes_reinsert_continues_sequence(spark):
    """Two sequential batches: a key deleted in batch 1 and
    re-inserted in batch 2 CONTINUES its version sequence (max
    historical seq + 1), so (k, version_seq) stays unique; a
    twice-updated key accumulates three versions."""
    from etl_lens_spark.operators.cdc import scd2_apply_changes

    dim = spark.createDataFrame(
        [(1, 1, "a", 100, None, 1), (2, 1, "b", 100, None, 1)],
        "k int, version_seq long, v string, valid_from_us long, "
        "valid_to_us long, is_current long",
    )
    b1 = spark.createDataFrame(
        [(1, "a", "delete"),
         (2, "b", "update_preimage"), (2, "b2", "update_postimage")],
        "k int, v string, _change_type string",
    )
    d1 = scd2_apply_changes(dim, b1, ["k"], ["v"], 200)
    b2 = spark.createDataFrame(
        [(1, "a-back", "insert"),
         (2, "b2", "update_preimage"), (2, "b3", "update_postimage")],
        "k int, v string, _change_type string",
    )
    d2 = scd2_apply_changes(d1, b2, ["k"], ["v"], 300)
    assert _scd2_rows(d2) == [
        (1, 1, "a", 100, 200, 0),
        (1, 2, "a-back", 300, None, 1),   # seq continues past the delete
        (2, 1, "b", 100, 200, 0),
        (2, 2, "b2", 200, 300, 0),
        (2, 3, "b3", 300, None, 1),
    ]


def test_scd2_apply_changes_matches_from_scratch_build(spark):
    """Self-audit at micro scale: maintaining the dimension through
    two incremental batches equals the from-scratch SCD2 build over
    the concatenated change history (the warehouse_scd2_build
    change-point algorithm, replayed in-test)."""
    from etl_lens_spark.operators.cdc import scd2_apply_changes

    # history: (k, t, v) change points, t0=100 snapshot then batches
    dim = spark.createDataFrame(
        [(1, 1, "x", 100, None, 1), (2, 1, "y", 100, None, 1)],
        "k int, version_seq long, v string, valid_from_us long, "
        "valid_to_us long, is_current long",
    )
    batches = [
        (200, [(1, "x", "update_preimage"), (1, "x2", "update_postimage")]),
        (300, [(2, "y", "delete"), (1, "x2", "update_preimage"),
               (1, "x3", "update_postimage")]),
    ]
    cur = dim
    for t, rows in batches:
        feed = spark.createDataFrame(
            rows, "k int, v string, _change_type string"
        )
        cur = scd2_apply_changes(cur, feed, ["k"], ["v"], t)
    # from scratch: validity intervals from the full change history
    expected = [
        (1, 1, "x", 100, 200, 0),
        (1, 2, "x2", 200, 300, 0),
        (1, 3, "x3", 300, None, 1),
        (2, 1, "y", 100, 300, 0),
    ]
    assert _scd2_rows(cur) == expected


def test_scd2_apply_changes_no_broadcast_path(spark):
    """broadcast_feed=False (backfill-sized feed) produces identical
    results through the shuffle-join path."""
    from etl_lens_spark.operators.cdc import scd2_apply_changes

    dim = spark.createDataFrame(
        [(1, 1, "a", 100, None, 1), (2, 1, "b", 100, None, 1)],
        "k int, version_seq long, v string, valid_from_us long, "
        "valid_to_us long, is_current long",
    )
    feed = spark.createDataFrame(
        [(1, "a", "update_preimage"), (1, "a2", "update_postimage")],
        "k int, v string, _change_type string",
    )
    a = scd2_apply_changes(dim, feed, ["k"], ["v"], 200)
    b = scd2_apply_changes(dim, feed, ["k"], ["v"], 200,
                           broadcast_feed=False)
    assert _scd2_rows(a) == _scd2_rows(b)


def test_scd2_apply_changes_null_keys_null_safe(spark):
    """Round-7 review fix: every key join is eqNullSafe, so a
    NULL-key update closes the NULL-key open row and continues its
    version sequence — no duplicate current rows, no seq collision."""
    from etl_lens_spark.operators.cdc import scd2_apply_changes

    dim = spark.createDataFrame(
        [(None, 1, "a", 100, None, 1), (2, 1, "b", 100, None, 1)],
        "k int, version_seq long, v string, valid_from_us long, "
        "valid_to_us long, is_current long",
    )
    feed = spark.createDataFrame(
        [(None, "a", "update_preimage"), (None, "a2", "update_postimage")],
        "k int, v string, _change_type string",
    )
    out = scd2_apply_changes(dim, feed, ["k"], ["v"], 200)
    rows = sorted(
        [
            (
                r["k"],
                r["version_seq"],
                r["v"],
                r["valid_to_us"],
                r["is_current"],
            )
            for r in out.collect()
        ],
        key=lambda t: (t[0] is not None, t[1]),
    )
    assert rows == [
        (None, 1, "a", 200, 0),    # closed, not duplicated
        (None, 2, "a2", None, 1),  # sequence continued
        (2, 1, "b", None, 1),      # untouched passthrough
    ]
