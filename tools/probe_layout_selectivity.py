"""Measure files-opened under Z-order vs Hilbert vs scatter layouts
across box-query selectivities (the lake_layout_pruning_compare
census parameterized by box width) — the data for PLANS.md's
'which curve wins at which selectivity' note. Usage:
``python tools/probe_layout_selectivity.py [sf_dir]``."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_lens_spark import get_spark  # noqa: E402
from etl_lens_spark.operators import layout as lay  # noqa: E402
from etl_lens_spark.sources.tables import load_table  # noqa: E402

BITS = 8
N_BUCKET_BITS = int(os.environ.get("PROBE_BUCKET_BITS", "6"))
SHIFT = 2 * BITS - N_BUCKET_BITS


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long").alias("rid"),
        F.col("o_custkey").cast("long").alias("xk"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("yk"),
    )
    mode = os.environ.get("PROBE_BUCKET_MODE", "topbits")
    n_buckets_env = 1 << N_BUCKET_BITS
    if mode == "topbits":
        # quadtree cells: IDENTICAL for both curves by construction
        # (top-k bits of Morton or Hilbert index = the same 2^k
        # quadrants; only the traversal ORDER differs)
        hb = lay.with_hilbert_value(o, "xk", "yk", bits=BITS).select(
            F.expr(f"hval >> {SHIFT}").alias("bucket"), "xk", "yk"
        )
        zb = lay.with_zvalue(o, "xk", "yk", bits=BITS).select(
            F.expr(f"zval >> {SHIFT}").alias("bucket"), "xk", "yk"
        )
    else:
        # equal-row RANGE partitioning of the curve order — the
        # repartitionByRange(zval) write shape, where seam jumps
        # actually matter
        from pyspark.sql import Window as W

        def rangebucket(df, col):
            w = W.orderBy(col, "rid")
            return df.withColumn("rn", F.row_number().over(w)).select(
                F.floor(
                    (F.col("rn") - 1) * n_buckets_env
                    / df.count()
                ).alias("bucket"),
                "xk",
                "yk",
            )

        hb = rangebucket(
            lay.with_hilbert_value(o, "xk", "yk", bits=BITS), "hval"
        )
        zb = rangebucket(
            lay.with_zvalue(o, "xk", "yk", bits=BITS), "zval"
        )
    n_buckets = 1 << N_BUCKET_BITS
    kb = o.select((F.col("rid") % n_buckets).alias("bucket"), "xk", "yk")

    def boxes(df, name):
        return (
            df.groupBy("bucket")
            .agg(
                F.min("xk").alias("mnx"),
                F.max("xk").alias("mxx"),
                F.min("yk").alias("mny"),
                F.max("yk").alias("mxy"),
            )
            .select(F.lit(name).alias("layout"), "*")
        )

    allb = (
        boxes(hb, "hilbert")
        .unionByName(boxes(zb, "zorder"))
        .unionByName(boxes(kb, "scatter"))
        .localCheckpoint()
    )
    b = o.agg(
        F.min("xk").alias("xlo"), F.max("xk").alias("xhi"),
        F.min("yk").alias("ylo"), F.max("yk").alias("yhi"),
    ).first()
    print(f"{'width%':>7} {'rows_in_box':>11} {'hilbert':>8} {'zorder':>7} {'scatter':>8}")
    for pct in (1, 2, 5, 10, 20, 40):
        qx_lo = b.xlo + (b.xhi - b.xlo) * 25 // 100
        qx_hi = b.xlo + (b.xhi - b.xlo) * (25 + pct) // 100
        qy_lo = b.ylo + (b.yhi - b.ylo) * 25 // 100
        qy_hi = b.ylo + (b.yhi - b.ylo) * (25 + pct) // 100
        scans = {
            r["layout"]: r["ns"]
            for r in allb.groupBy("layout")
            .agg(
                F.sum(
                    F.when(
                        (F.col("mxx") < qx_lo) | (F.col("mnx") > qx_hi)
                        | (F.col("mxy") < qy_lo) | (F.col("mny") > qy_hi),
                        0,
                    ).otherwise(1)
                ).alias("ns")
            )
            .collect()
        }
        n_rows = o.filter(
            F.col("xk").between(qx_lo, qx_hi)
            & F.col("yk").between(qy_lo, qy_hi)
        ).count()
        print(f"{pct:>7} {n_rows:>11} {scans['hilbert']:>8} "
              f"{scans['zorder']:>7} {scans['scatter']:>8}")


if __name__ == "__main__":
    main()
