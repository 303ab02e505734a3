"""Sink round-trip mechanics: partition pruning actually prunes, and
the UDTF handles nulls/empties."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.sources import sinks


def test_partitioned_write_prunes_on_readback(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = sinks.write_partitioned_parquet(
        o, "test_orders_part", ["o_orderpriority"]
    )
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("o_orderpriority") == "1-URGENT")
    # the partition predicate must land in PartitionFilters (directory
    # pruning), not PushedFilters / a post-scan Filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "1-URGENT" in m.group(1), f"no partition filter in:\n{plan}"
    n_total_dirs = len({f.rsplit("/", 2)[1] for f in back.inputFiles()})
    assert n_total_dirs > 1  # pruning was actually possible
    assert pruned.count() > 0


def test_udtf_null_and_empty(spark):
    from etl_lens_spark.functions.table_funcs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a  b"), (2, None), (3, "")], "id long, text string"
    ).createOrReplaceTempView("udtf_probe")
    rows = spark.sql(
        """
        SELECT id, p.pos, p.part
        FROM udtf_probe, LATERAL split_parts(text, ' ') AS p
        ORDER BY id, pos
        """
    ).collect()
    got = [(r.id, r.pos, r.part) for r in rows]
    # 'a  b' -> ['a', '', 'b'] (explicit-sep split keeps empties);
    # NULL text -> no rows; '' -> one empty part
    assert got == [
        (1, 1, "a"),
        (1, 2, ""),
        (1, 3, "b"),
        (3, 1, ""),
    ]
