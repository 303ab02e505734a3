"""Streaming/batch equivalence: the same operator graph over the
events fixture must produce identical results through the streaming
engine (file-source replay → memory sink) and the batch engine
(whose results the DuckDB oracle already validates).

Aggregations run in 'complete' output mode: with a single-file
replay the watermark never advances past the data, so 'append' would
(correctly) hold all windows open and emit nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.streaming import stream_ops as so


def _batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_tumbling_counts_match_batch(spark, sf_dir):
    stream = so.tumbling_window_counts(so.events_stream(spark, sf_dir))
    got = so.run_to_memory(stream, "t_tumbling", output_mode="complete")
    ev = _batch_events(spark, sf_dir)
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )
    g = {(r["win_start"], r["event_type"]): (r["n"], r["total_value"]) for r in got.collect()}
    w = {(r["win_start"], r["event_type"]): (r["n"], r["total_value"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_session_windows_match_batch_session_window(spark, sf_dir):
    stream = so.session_window_stats(so.events_stream(spark, sf_dir), gap="30 minutes")
    got = so.run_to_memory(stream, "t_sessions", output_mode="complete")
    ev = _batch_events(spark, sf_dir)
    want = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    g = {(r["user_id"], r["session_start"]): r["n_events"] for r in got.collect()}
    w = {(r["user_id"], r["session_start"]): r["n_events"] for r in want.collect()}
    assert g == w and len(g) > 0


def test_sliding_windows_overlap_factor(spark, sf_dir):
    stream = so.sliding_window_counts(
        so.events_stream(spark, sf_dir), window="1 hour", slide="15 minutes"
    )
    got = so.run_to_memory(stream, "t_sliding", output_mode="complete")
    ev = _batch_events(spark, sf_dir)
    total_events = ev.count()
    # every event lands in exactly window/slide = 4 sliding windows
    assert got.agg(F.sum("n")).collect()[0][0] == 4 * total_events


def test_stateful_dedup_first_seen(spark, sf_dir):
    stream = so.stateful_dedup(so.events_stream(spark, sf_dir), keys=["event_type", "user_id"])
    got = so.run_to_memory(stream, "t_dedup", output_mode="append")
    ev = _batch_events(spark, sf_dir)
    n_keys = ev.select("event_type", "user_id").distinct().count()
    assert got.count() == n_keys
    # one row per key
    assert got.select("event_type", "user_id").distinct().count() == n_keys


def test_stateful_totals_across_multiple_microbatches(spark, sf_dir):
    """State must carry across micro-batch boundaries: split the
    events fixture into 8 files and trigger 2 files per batch (4
    micro-batches); the final per-user state must still equal the
    batch aggregate. Guards the applyInPandasWithState merge logic —
    a single-batch replay can't catch a broken state carry."""
    import uuid

    from pyspark.sql import functions as F

    from etl_lens_spark.sources.sinks import scratch_path
    from etl_lens_spark.streaming import stream_ops as so

    from etl_lens_spark.sources.tables import load_table

    src = scratch_path(f"multibatch_events_{uuid.uuid4().hex[:8]}")
    # load_table normalizes ts to utc-instant timestamp regardless of
    # the fixture's physical layout; the rewrite is then µs-instant
    ev_batch = load_table(spark, sf_dir, "events")
    ev_batch.repartition(8).write.mode("overwrite").parquet(src)

    raw = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .format("parquet")
        .option("maxFilesPerTrigger", 2)
        .load(src)
    )
    stream = so.user_totals_stateful(raw)
    out = so.run_to_memory(stream, "t_multibatch", output_mode="update")
    # >1 update row per user proves multiple micro-batches ran
    n_updates = out.count()
    n_users = out.select("user_id").distinct().count()
    assert n_updates > n_users, "replay collapsed into a single micro-batch"

    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    got = {r["user_id"]: r["n_events"] for r in final}
    expected = {
        r["user_id"]: r["n"]
        for r in ev_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_burst_carries_across_microbatch_boundary(spark):
    """A burst split across two micro-batches must count as ONE
    maximal run (2 errors in batch 1 + 1 error in batch 2 = one
    burst of 3), and a trailing never-closed run must still be
    counted — the two properties the islands oracle encodes."""
    import os
    import time
    import uuid

    from pyspark.sql import functions as F

    from etl_lens_spark.sources.sinks import scratch_path
    from etl_lens_spark.streaming import stream_ops as so

    src = scratch_path(f"burst_split_{uuid.uuid4().hex[:8]}")
    os.makedirs(src, exist_ok=True)

    def write_file(rows, name):
        # the file stream source does not recurse into subdirs:
        # write to a staging dir, then move the part file up as a
        # single top-level parquet file
        import glob
        import shutil

        stage = f"{src}/_stage_{name}"
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, f"{src}/{name}.parquet")
        shutil.rmtree(stage)

    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, user, typ):
        return (i, t0 + datetime.timedelta(seconds=i), user, typ, 1.0, "{}")

    # batch 1: user 1 opens a run of 2
    write_file([ev(1, 1, "error"), ev(2, 1, "error")], "f1")
    time.sleep(1.1)  # distinct mtime so file order is deterministic
    # batch 2: user 1 extends to 3 then closes; user 2 trailing open run
    write_file(
        [
            ev(3, 1, "error"),
            ev(4, 1, "click"),
            ev(5, 2, "error"),
            ev(6, 2, "error"),
            ev(7, 2, "error"),
        ],
        "f2",
    )

    raw = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    stream = so.burst_stateful(raw)
    out = so.run_to_memory(stream, "t_burst_split", output_mode="update")
    final = {
        r.user_id: r
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_bursts").alias("n_bursts"),
            F.max("longest").alias("longest"),
        )
        .collect()
    }
    assert final[1].n_bursts == 1 and final[1].longest == 3
    assert final[2].n_bursts == 1 and final[2].longest == 3


def test_streaming_cms_cells_equal_batch_bitexact(spark, sf_dir):
    """The live CMS state after a full replay must equal the batch
    sketch CELL-FOR-CELL (counts are linear and monotone), not just
    in the per-row summary the oracle checks."""
    from etl_lens_spark.operators.kmv import kmv_value
    from etl_lens_spark.queries import streaming_q as sq
    from etl_lens_spark.sources.tables import load_table
    from etl_lens_spark.streaming import stream_ops as so

    ev = so.events_stream(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    pos = [
        F.struct(
            F.lit(r).alias("r"),
            (
                kmv_value(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("|"),
                        F.lit(str(r)),
                    )
                )
                % sq._SCMS_WIDTH
            ).alias("c"),
        )
        for r in range(sq._SCMS_DEPTH)
    ]
    cells = (
        ev.select(F.explode(F.array(*pos)).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = so.run_to_memory(cells, "t_stream_cms", output_mode="update")
    live = {
        (r["r"], r["c"]): r["cnt"]
        for r in out.groupBy("r", "c")
        .agg(F.max("cnt").alias("cnt"))
        .collect()
    }
    batch_ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    batch = {
        (r["r"], r["c"]): r["cnt"]
        for r in batch_ev.select(F.explode(F.array(*pos)).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert live == batch
