"""Measured shuffle-conf sizing evidence (100 TB posture): sweep
``spark.sql.shuffle.partitions`` and ``spark.sql.files.
maxPartitionBytes`` over representative headliners at sf0.1 and print
the wall time per cell — the data behind the session defaults
(session.py pins shuffle.partitions=32 for local[32]).

``python tools/probe_conf_tuning.py``

Representative plans: q1 (scan→agg), q18 (grouped-HAVING semi-join),
dedup_minhash_lsh (banded self-join + window), part_pareto_abc
(range-partitioned prefix sum). Each cell is min-of-2 noop-sink runs
(steady state, all columns materialized).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q1_pricing_summary",
    "q18_large_orders",
    "dedup_minhash_lsh",
    "part_pareto_abc",
]
SHUFFLE_PARTS = [8, 32, 128]
MAX_PART_BYTES = ["134217728", "16777216"]  # 128 MB (default), 16 MB


def main() -> None:
    from etl_lens_spark import get_spark
    from etl_lens_spark.queries import REGISTRY, all_queries

    all_queries()
    spark = get_spark(app_name="conf-tuning-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm
    REGISTRY[QUERIES[0]].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    print(f"sf_dir={SF_DIR}  cells are min-of-2 noop-sink seconds")
    header = "query".ljust(24) + "".join(
        f"sp={p}/mpb={int(m)//(1<<20)}M".rjust(16)
        for p in SHUFFLE_PARTS
        for m in MAX_PART_BYTES
    )
    print(header)
    for name in QUERIES:
        cells = []
        for p in SHUFFLE_PARTS:
            for m in MAX_PART_BYTES:
                spark.conf.set("spark.sql.shuffle.partitions", str(p))
                spark.conf.set("spark.sql.files.maxPartitionBytes", m)
                cells.append(f"{run(name):.2f}".rjust(16))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", "134217728"
        )
        print(name.ljust(24) + "".join(cells))


if __name__ == "__main__":
    main()
