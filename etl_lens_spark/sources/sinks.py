"""Write paths (sinks) + read-back: parquet (partitioned), csv, json,
orc — the ``spark.read/write`` surface SURVEY §2.2 maps from SQLite's
single-file-DB + CSV-extension sources.

Scale notes baked into each writer:
- partitioned parquet: ``partitionBy`` on a low-cardinality column
  gives partition pruning on read-back (filters on the partition
  column never touch non-matching files);
- every writer repartitions to a bounded file count first — at 100 TB
  the failure mode is thousands of tiny files per partition (one per
  task), which murders the next reader's planning phase;
- csv/json are schema-on-read formats: read-back always passes an
  explicit schema (inference = an extra full scan, and csv inference
  can mistype).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SCRATCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def scratch_path(name: str) -> str:
    os.makedirs(SCRATCH_DIR, exist_ok=True)
    return os.path.join(SCRATCH_DIR, name)


def write_partitioned_parquet(
    df: DataFrame, name: str, partition_by: list[str], files_per_partition: int = 1
) -> str:
    """Overwrite-write as parquet partitioned by the given columns."""
    path = scratch_path(name)
    (
        df.repartition(files_per_partition, *partition_by)
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(path)
    )
    return path


def write_csv(df: DataFrame, name: str) -> tuple[str, str]:
    """Overwrite-write as headered csv; returns (path, ddl_schema) for
    schema-locked read-back."""
    path = scratch_path(name)
    df.coalesce(4).write.mode("overwrite").option("header", "true").csv(path)
    return path, df.schema.simpleString()[7:-1].replace(":", " ")


def write_json(df: DataFrame, name: str) -> tuple[str, str]:
    path = scratch_path(name)
    df.coalesce(4).write.mode("overwrite").json(path)
    return path, df.schema.simpleString()[7:-1].replace(":", " ")


def write_orc(df: DataFrame, name: str) -> str:
    path = scratch_path(name)
    df.coalesce(4).write.mode("overwrite").orc(path)
    return path


def read_csv(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    return spark.read.schema(ddl).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    return spark.read.schema(ddl).json(path)
