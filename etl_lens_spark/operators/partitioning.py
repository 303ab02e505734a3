"""Partitioning helpers — the knobs that make a plan survive a 100x
scale-up.

Parquet scans parallelize by file splits (``maxPartitionBytes``),
which is right for scan-bound work but starves compute-bound stages
on small-but-expensive inputs (a 2 MB file of 5k documents reads as
ONE partition; a MinHash pass over it then runs on one core). The
inverse problem — thousands of tiny partitions after a selective
filter — wastes task overhead. These helpers normalize both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a CPU-heavy downstream stage has at least
    ``min_partitions`` (default: cluster default parallelism).

    A round-robin repartition: one cheap shuffle of the *input* rows
    (pre-explosion, pre-UDF) buys full-core utilization of the
    expensive stage. No-op when the input is already parallel enough
    — so it's safe to leave in place for the 100 TB run, where scans
    already produce thousands of partitions.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
