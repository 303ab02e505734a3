"""Probe: copy-on-write MERGE cost vs table width.

Builds lakehouse tables of F = 4 / 16 / 64 key-clustered files over
the same orders data, then merges an identical small update batch
(keys %256==1 — 256 is a multiple of every tested width, so the
batch is clustered in exactly ONE file at every F) into each. If the DML
design is right, wall time is FLAT in F: the prune join reads file
names only, and the rewrite touches one file regardless of how many
exist. A rising curve would mean per-file overhead leaked into the
write path.

``python tools/probe_lake_dml.py [sf_dir]``
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_lens_spark import get_spark
from etl_lens_spark.operators import lakelog
from etl_lens_spark.sources.sinks import scratch_path
from etl_lens_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe-lake-dml")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    updates = orders.filter(F.col("o_orderkey") % 256 == 1).select(
        "o_orderkey", (F.col("price") * 2).cast("decimal(18,2)").alias("price")
    )
    updates.count()  # materialize once, warm
    for n_files in (4, 16, 64):
        base = scratch_path(f"probe_dml_{n_files}")
        shutil.rmtree(base, ignore_errors=True)
        actions = []
        for i in range(n_files):
            rel = f"f{i}"
            orders.filter(
                F.col("o_orderkey") % n_files == i
            ).write.mode("overwrite").parquet(f"{base}/{rel}")
            actions.append({"add": rel})
        lakelog.commit(base, 0, actions)
        t0 = time.perf_counter()
        stats = lakelog.merge_upsert(spark, base, updates, ["o_orderkey"])
        dt = time.perf_counter() - t0
        n = lakelog.read_snapshot(spark, base).count()
        print(
            f"files={n_files}: merge {dt:.2f}s "
            f"rewritten={stats['n_files_rewritten']} rows={n}",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
