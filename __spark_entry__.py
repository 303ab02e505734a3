"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the declared-query registry
(etl_lens_spark.queries) that mirrors SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-analog pricing summary) on sf0.001."""
    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_lens_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for ops whose
    hashing primitives are Spark-only — recorded rows-only)."""
    from etl_lens_spark.queries import all_oracles

    return all_oracles()
