"""Round-4 additions: banded interval join knob, sharded packing,
quantile scale twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.operators.joins import interval_overlap_join_banded

SF = "/root/testdata/sf0.001"


def _sides(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    promo = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        F.col("o_orderdate").cast("date").alias("a_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("a_e"),
    )
    ordw = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("b_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("b_e"),
    )
    return promo, ordw


def test_band_width_never_changes_output(spark):
    """The band width is a capacity knob, not a semantics knob: every
    width must produce the identical pair set (reference = the literal
    theta join)."""
    promo, ordw = _sides(spark)
    want = sorted(
        (r["promo_id"], r["order_id"])
        for r in promo.join(
            ordw,
            (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")),
        )
        .select("promo_id", "order_id")
        .collect()
    )
    assert want, "fixture selectivity produced no overlaps"
    for band_days in (1, 7, 30, 90):
        got = sorted(
            (r["promo_id"], r["order_id"])
            for r in interval_overlap_join_banded(
                promo, ordw, "a_s", "a_e", "b_s", "b_e", band_days=band_days
            )
            .select("promo_id", "order_id")
            .collect()
        )
        assert got == want, f"band_days={band_days} changed the result"


@pytest.mark.parametrize("band_days", [1, 30])
def test_banded_join_plan_is_equi_not_cartesian(spark, band_days):
    promo, ordw = _sides(spark)
    res = interval_overlap_join_banded(
        promo, ordw, "a_s", "a_e", "b_s", "b_e", band_days=band_days
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_late_drop_metric_fires(spark):
    """The late-drop demo must drop via the watermark (drop metric
    > 0 in the late batch), not accidentally pass because the late
    row's window was excluded some other way. Measured semantics this
    pins: Spark's late-data filter lags the eviction watermark by one
    batch, hence the on-time spacer file between the
    watermark-advancing batch and the late row."""
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from etl_lens_spark.sources.sinks import scratch_path

    run = uuid.uuid4().hex
    watch = scratch_path(f"t_late_{run}")
    os.makedirs(watch)
    rows0 = [
        ("2024-01-01 00:10:00", "a", 1.0),
        ("2024-01-01 01:10:00", "a", 1.0),
        ("2024-01-01 05:10:00", "a", 1.0),
    ]
    rows1 = [("2024-01-01 05:10:00", "a", 1.0)]  # on-time spacer
    rows2 = [("2024-01-01 00:20:00", "a", 99.0)]  # provably late

    def emit(rows, name, mtime):
        df = spark.createDataFrame(
            rows, "s string, event_type string, value double"
        ).select(F.col("s").cast("timestamp").alias("ts"), "event_type", "value")
        tmp = scratch_path(f"t_late_tmp_{run}_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(watch, f"{name}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (mtime, mtime))
        shutil.rmtree(tmp, ignore_errors=True)

    emit(rows0, "f0", 1_600_000_000.0)
    emit(rows1, "f1", 1_600_000_100.0)
    emit(rows2, "f2", 1_600_000_200.0)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(watch)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"t_late_{run}")
        .option("checkpointLocation", scratch_path(f"t_late_ckpt_{run}"))
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p["stateOperators"]
        )
    finally:
        q.stop()
    assert dropped == 1, f"expected exactly the late row dropped, got {dropped}"
    out = spark.sql(f"SELECT * FROM t_late_{run}").collect()
    h0 = [r for r in out if r["w"]["start"].hour == 0]
    assert len(h0) == 1 and h0[0]["n"] == 1 and h0[0]["tv"] == 1.0
    shutil.rmtree(watch, ignore_errors=True)
