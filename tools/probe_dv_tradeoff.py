"""Measure the deletion-vector trade-off: DELETE cost (merge-on-read
vs copy-on-write) and the read amplification a DV imposes until it is
materialized — the operating data behind lakelog.delete_where_mor.

Run: python tools/probe_dv_tradeoff.py  (uses sf0.1 orders)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/lakelog_dv_probe"
SF = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.1")


def du(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def build(spark, name: str) -> str:
    from pyspark.sql import functions as F

    from etl_lens_spark.operators import lakelog

    d = f"{BASE}/{name}"
    shutil.rmtree(d, ignore_errors=True)
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    for i in range(4):
        orders.filter(F.col("o_orderkey") % 4 == i).coalesce(1)\
            .write.parquet(f"{d}/f{i}")
    lakelog.commit(d, 0, [{"add": f"f{i}"} for i in range(4)])
    return d


def timeit(fn, reps=3):
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from pyspark.sql import functions as F

    from etl_lens_spark import get_spark
    from etl_lens_spark.operators import lakelog

    spark = get_spark(app_name="dv-probe")
    scan = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)), F.sum("o_totalprice")
    ).collect()

    # predicate selectivities: rows deleted per 4-file table
    for mod, label in [(1600, "sparse ~0.06%"), (80, "~1.2%"), (8, "12.5%")]:
        cond = F.col("o_orderkey") % mod == 3

        cow = build(spark, "cow")
        b0 = du(cow)
        t_cow = timeit(
            lambda: lakelog.delete_where(spark, cow, cond), reps=1
        )
        cow_bytes = du(cow) - b0

        mor = build(spark, "mor")
        b0 = du(mor)
        t_mor = timeit(
            lambda: lakelog.delete_where_mor(spark, mor, cond), reps=1
        )
        mor_bytes = du(mor) - b0

        clean = build(spark, "clean")
        t_clean = timeit(lambda: scan(lakelog.read_snapshot(spark, clean)))
        t_morread = timeit(
            lambda: scan(lakelog.read_snapshot_mor(spark, mor))
        )
        t_mat = timeit(
            lambda: lakelog.materialize_deletion_vectors(spark, mor),
            reps=1,
        )
        t_after = timeit(
            lambda: scan(lakelog.read_snapshot_mor(spark, mor))
        )
        print(
            f"[{label:>12}] delete: CoW {t_cow*1e3:7.0f} ms / "
            f"{cow_bytes/1e6:6.2f} MB rewritten | MOR {t_mor*1e3:7.0f} ms / "
            f"{mor_bytes/1e3:7.1f} KB sidecar || read: clean "
            f"{t_clean*1e3:6.0f} ms, with-DV {t_morread*1e3:6.0f} ms "
            f"({t_morread/t_clean:4.2f}x), materialize {t_mat*1e3:6.0f} ms, "
            f"after {t_after*1e3:6.0f} ms"
        )
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
