"""Governed reads (operators/governance.py): masking is role-aware
and type-preserving, the row policy filters BEFORE masking, and the
policy predicate still reaches the parquet scan (PushedFilters)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_lens_spark.operators import governance as gov


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "13-555-0101", 100.0, 3),
            (2, "bob", "14-555-0202", 200.0, 12),
            (3, "carol", "15-555-0303", 300.0, 7),
        ],
        "id long, name string, phone string, bal double, nation long",
    )


MASKS = {
    "name": gov.unless_role({"admin"}, gov.mask_hash()),
    "phone": gov.unless_role({"admin"}, gov.mask_partial(4)),
    "bal": gov.unless_role({"admin"}, gov.mask_null()),
}


def _row_policy(role):
    return None if role == "admin" else F.col("nation") < 10


def test_admin_sees_everything_unchanged(spark):
    df = _df(spark)
    got = gov.apply_governance(df, "admin", MASKS, _row_policy)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_analyst_rows_filtered_and_columns_masked(spark):
    got = {
        r.id: r
        for r in gov.apply_governance(
            _df(spark), "analyst", MASKS, _row_policy
        ).collect()
    }
    assert set(got) == {1, 3}  # nation 12 filtered by the row policy
    assert got[1].name == hashlib.sha256(b"alice").hexdigest()
    assert got[1].phone == "***-0101"
    assert got[1].bal is None  # redacted but type-preserved
    # schema identical to the clear read: downstream queries unchanged
    assert (
        gov.apply_governance(_df(spark), "analyst", MASKS, _row_policy).schema
        == _df(spark).schema
    )


def test_hash_mask_stays_joinable(spark):
    a = gov.apply_governance(_df(spark), "analyst", MASKS, _row_policy)
    b = gov.apply_governance(_df(spark), "analyst", MASKS, _row_policy)
    assert (
        a.select("name").join(b.select("name"), "name").distinct().count()
        == 2
    )


def test_unknown_mask_column_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="missing columns"):
        gov.apply_governance(
            _df(spark), "x", {"ghost": gov.unless_role(set(), gov.mask_hash())}
        )


def test_row_policy_pushes_down_to_parquet_scan(spark, tmp_path):
    p = str(tmp_path / "gov.parquet")
    _df(spark).write.parquet(p)
    governed = gov.apply_governance(
        spark.read.parquet(p), "analyst", MASKS, _row_policy
    )
    plan = governed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(nation), LessThan(nation,10)]" in plan
