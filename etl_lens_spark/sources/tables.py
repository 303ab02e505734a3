"""Dataset loading: the driver-provided parquet star schema + event log.

The reference's only source is a sequential scan of one ``.etl`` trace
file (``/root/reference/src/main.cpp:995-1014``). Here the equivalent
source is columnar parquet read through the Spark DataSource V2 path,
which gives us predicate pushdown, column pruning, and partition-level
parallelism for free — the properties the reference's single-threaded
scan lacks and that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough (at any realistic scale ratio) to broadcast.
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain ``spark.read.parquet`` — filters/projections
    composed on top are pushed into the scan by Catalyst.

    ``events.ts`` has shipped in two physical layouts across fixture
    generations — TIMESTAMP(NANOS) (no Spark type: read as raw ns via
    ``nanosAsLong`` and floor to µs, the truncation every µs engine
    applies) and plain µs-without-timezone (Spark 4 reads it as
    TIMESTAMP_NTZ). Both normalize to utc-instant TimestampType so
    every downstream ``unix_micros``/watermark/window sees one type;
    the session timezone is pinned UTC here (runtime-settable) so the
    NTZ→instant cast is layout- and host-independent even on a
    vanilla driver-built session.
    """
    if name == "events":
        # session-level confs (safe to set at runtime; also set in
        # get_spark for sessions we build ourselves)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div — a double division would lose precision on
            # ~1.7e18 ns values (53-bit mantissa)
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # naive wall time == UTC instant under the pinned UTC tz
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the Spark SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
