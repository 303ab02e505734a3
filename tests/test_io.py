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


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    from etl_lens_spark.sources import sinks

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    sinks.write_bucketed_table(o, "t_b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    sinks.write_bucketed_table(
        li, "t_b_lineitem", ["l_orderkey"], 8, ["l_orderkey"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = spark.table("t_b_orders"), spark.table("t_b_lineitem")
        j = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert j.count() > 0
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_equals_plain_join(spark, sf_dir):
    from etl_lens_spark.operators.partitioning import salted_join
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("w"))
    plain = ev.join(dim, "event_type")
    salted = salted_join(ev, dim, on=["event_type"], salt=4)
    assert plain.count() == salted.count()
    a = {tuple(r) for r in plain.select("event_id", "w").collect()}
    b = {tuple(r) for r in salted.select("event_id", "w").collect()}
    assert a == b

    # left join keeps unmatched left rows exactly once
    dim_partial = dim.filter(F.col("event_type") != "click")
    pl = ev.join(dim_partial, "event_type", "left")
    sl = salted_join(ev, dim_partial, on=["event_type"], how="left")
    assert pl.count() == sl.count()


def test_join_hints_steer_physical_strategy(spark, sf_dir):
    # the [L] surface exposes optimizer control the way SQLite never
    # could: per-join strategy hints, honored by Catalyst
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")

    merged = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    plan_m = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_m

    bcast = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    plan_b = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    shj = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    plan_s = shj._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_s


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir):
    from etl_lens_spark.sources import sinks

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = sinks.scratch_path("orders_fragmented")
    # simulate a fragmented append-heavy directory: 64 tiny files
    o.repartition(64).write.mode("overwrite").parquet(path)
    before_rows = spark.read.parquet(path).count()
    n_before, n_after = sinks.compact_parquet(
        spark, path, target_file_bytes=4 * 1024 * 1024
    )
    assert n_before == 64
    assert n_after < n_before
    assert spark.read.parquet(path).count() == before_rows


def test_bloom_prefilter_prunes_without_false_negatives(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_lens_spark.operators import bloom
    from etl_lens_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = bloom.bloom_positions(o, "o_orderkey", m_bits=1 << 16, k_hashes=2)
    pruned = bloom.bloom_prefilter(li, pos, "l_orderkey", 1 << 16, 2)
    n_all, n_pruned = li.count(), pruned.count()
    # pruning is real: urgent orders are ~20% of keys, so the bloom
    # pass must drop well over half of lineitem (false positives only
    # widen, never shrink, the survivor set)
    assert n_pruned < 0.5 * n_all, (n_pruned, n_all)
    # zero false negatives: every truly-matching row survives
    true_keys = {r[0] for r in o.select("o_orderkey").collect()}
    surviving = {r[0] for r in pruned.select("l_orderkey").distinct().collect()}
    matching = {
        r[0]
        for r in li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    assert matching <= surviving
    assert matching <= true_keys


def test_compact_small_files_counts(spark, sf_dir):
    import glob

    from etl_lens_spark.queries.io_q import sink_compact_small_files
    from etl_lens_spark.sources.sinks import scratch_path

    sink_compact_small_files(spark, sf_dir).collect()
    frag = glob.glob(scratch_path("compact_fragmented") + "/part-*")
    comp = glob.glob(scratch_path("compact_rewritten") + "/part-*")
    assert len(frag) == 64
    assert len(comp) == 4


def test_dpp_plan_has_dynamic_pruning(spark, sf_dir):
    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    df = REGISTRY["dpp_partition_pruned_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_parquet_footprint_matches_duckdb_metadata(spark):
    import duckdb

    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = {
            r["name"]: (
                r["n_row_groups"],
                r["max_rg_rows"],
                r["compressed_bytes"],
                r["uncompressed_bytes"],
            )
            for r in REGISTRY["diag_parquet_footprint"]
            .fn(spark, sf_dir)
            .collect()
        }
        for name in ("customer", "lineitem", "orders"):
            want = duckdb.sql(
                f"""SELECT CAST(COUNT(DISTINCT row_group_id) AS BIGINT),
                       CAST(MAX(row_group_num_rows) AS BIGINT),
                       CAST(SUM(total_compressed_size) AS BIGINT),
                       CAST(SUM(total_uncompressed_size) AS BIGINT)
                FROM parquet_metadata('{sf_dir}/{name}.parquet')"""
            ).fetchone()
            assert got[name] == tuple(want), (sf_dir, name)
