"""Rate-limit contract: maxFilesPerTrigger=2 over an 8-file source
must drain in at least 4 bounded micro-batches, and the capped drain
must produce the identical result to an uncapped one."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from etl_lens_spark.sources.sinks import scratch_path


def _drain(spark, src, max_files):
    name = f"rate_t_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_path(f"ckpt_{name}")
    reader = spark.readStream.schema("event_id long, user_id long")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src)
    agg = stream.groupBy((F.col("user_id") % 4).alias("b")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    rows = {
        r["b"]: (r["n"], r["s"])
        for r in spark.table(name).collect()
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    return n_batches, rows


def test_max_files_per_trigger_bounds_batches(spark, sf_dir):
    from etl_lens_spark.sources.tables import load_table

    src = scratch_path(f"rate_src_{uuid.uuid4().hex[:8]}")
    load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    ).repartition(8, "event_id").write.parquet(src)
    capped_batches, capped = _drain(spark, src, 2)
    free_batches, free = _drain(spark, src, None)
    # 8 files / 2 per trigger → at least 4 data batches; uncapped
    # drains in fewer, bigger batches
    assert capped_batches >= 4
    assert free_batches < capped_batches
    # the rate limit must not change the answer
    assert capped == free
    shutil.rmtree(src, ignore_errors=True)
