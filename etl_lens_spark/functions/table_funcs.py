"""Python UDTF surface — the Spark analog of SQLite virtual tables /
table-valued functions (``sqlite3.h:7586-7592``, the natural way the
reference would have exposed ETW traces to SQL; SURVEY §2.2 UDTF row).

A UDTF turns one input row into N output rows with a declared schema,
used via LATERAL join in SQL. Arrow-batched like other Python UDF
paths; per-row fan-out happens executor-side, so output cardinality
never touches the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos: long, part: string")
class SplitParts:
    """Explode a delimited string into (1-based position, part) rows —
    the canonical table-function shape (SQLite's generate_series /
    json_each analog)."""

    def eval(self, text: str, delim: str):
        if text is None:
            return
        for i, part in enumerate(text.split(delim), start=1):
            yield (i, part)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF library for SQL LATERAL use."""
    spark.udtf.register("split_parts", SplitParts)
