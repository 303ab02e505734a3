"""Growth probe for the approx-quantile scale twins.

Replicates the sf0.1 ``orders`` table 1x/10x/30x (key-offset copies,
disjoint customer universes) and times the exact global-window anchors
(feature_quantile_bins, customer_rfm_segments — NTILE over ONE
reducer) against their sketch twins (feature_quantile_bins_approx,
customer_rfm_segments_approx — approx_percentile cutpoints + local
range binning, no window). The 100 TB claim being measured: the exact
forms funnel every row/customer through a single partition and grow
super-linearly in wall time, the twins stay flat-per-row.

``python tools/probe_quantile_twins.py`` → markdown rows for PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_lens_spark import get_spark
from etl_lens_spark.queries import REGISTRY, _load
from etl_lens_spark.sources.sinks import scratch_path

SRC = "/root/testdata/sf0.1"
FACTORS = [1, 10, 30]
PAIRS = [
    ("feature_quantile_bins", "feature_quantile_bins_approx"),
    ("customer_rfm_segments", "customer_rfm_segments_approx"),
]


def build_replica(spark, factor: int) -> str:
    out_dir = scratch_path(f"qprobe_{factor}x")
    dest = os.path.join(out_dir, "orders.parquet")
    if os.path.exists(dest):
        return out_dir
    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    n_keys = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_cust = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    (
        orders.crossJoin(copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * n_keys)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("copy") * n_cust)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(dest)
    )
    return out_dir


def main() -> None:
    spark = get_spark()
    _load()
    print("| query | " + " | ".join(f"{f}x sec" for f in FACTORS) + " |")
    print("|---|" + "---|" * len(FACTORS))
    from etl_lens_spark.queries.npipe4 import _quantile_bins_sketch

    runners = []
    for exact, approx in PAIRS:
        runners.append((exact, REGISTRY[exact].fn))
        runners.append((approx, REGISTRY[approx].fn))
    # the registry twin pins SATURATING sketch accuracy (oracle-exact);
    # production runs the same plan at default-ish accuracy — time it
    # too so the probe shows the flat 100 TB path, not just the pin
    runners.append(
        (
            "feature_quantile_bins_approx@prod_acc",
            lambda s, d: _quantile_bins_sketch(s, d, accuracy=10000),
        )
    )
    for name, fn in runners:
        row = [name]
        for f in FACTORS:
            sf_dir = build_replica(spark, f)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            row.append(f"{time.time() - t0:.2f}")
        print("| " + " | ".join(row) + " |")
    for f in FACTORS:
        shutil.rmtree(scratch_path(f"qprobe_{f}x"), ignore_errors=True)


if __name__ == "__main__":
    main()
