"""Registry-wide smoke: every declared query runs at sf0.001 and
returns a stable schema; oracle coverage matches the contract."""

from __future__ import annotations

import pytest

from etl_lens_spark.queries import REGISTRY, _load

_load()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    # schema must be stable across construction
    df2 = spec.fn(spark, sf_dir)
    assert df.schema == df2.schema


def test_driver_contract():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40
    # SQL-expressible coverage stays high
    assert len(osql) / len(qs) > 0.8
