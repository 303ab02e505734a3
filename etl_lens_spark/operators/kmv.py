"""KMV (k-minimum-values) distinct-count sketch — oracle-exact.

The classic bottom-k sketch (Bar-Yossef et al. 2002): hash every key
to a uniform value, keep the k smallest per group; the k-th smallest
order statistic h_(k) estimates distinct count as (k-1)/h_(k).
Sketches MERGE by taking the k smallest of the union — the property
that lets per-day/per-shard sketches roll up into any aggregate
without rescanning, same posture as `sketch_hll_mergeable`.

Unlike HLL (engine-private register layout → rows-only check), KMV is
built here from md5 — deterministic and identical in Spark and DuckDB
— so the ORACLE can recompute the sketch bit-for-bit. We truncate the
md5 hex to 13 chars (52 bits) so the integer value and every derived
double stay exactly representable in IEEE-754 on both engines.

Reference parity: the reference keeps one exact in-memory hash map
per catalog (`src/main.cpp:152`); a mergeable sketch is its 100 TB
replacement when the exact map no longer fits one node.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

HEX_WIDTH = 13  # 13 hex chars = 52 bits: exact in a double both engines
SCALE = float(1 << 52)  # normalizing denominator for [0, 1) values


def kmv_value(col: Column) -> Column:
    """Uniform 52-bit hash value of ``col`` (long in [0, 2^52)).

    md5 over the value's canonical string form — both engines render
    a BIGINT the same way, and md5 bytes agree, so the value is
    cross-engine deterministic (the whole point vs xxhash64, which
    DuckDB lacks).
    """
    hx = F.md5(col.cast("string").cast("binary"))
    return F.conv(F.substring(hx, 1, HEX_WIDTH), 16, 10).cast("long")


def kmv_topk(df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Keep the k smallest distinct ``v`` per group.

    Input must carry a ``v`` column (from :func:`kmv_value`). The
    dedup + rank both partition on the group key — no global shuffle,
    no single-reducer window; per-group state is bounded by k.
    """
    w = Window.partitionBy(*group_cols).orderBy("v")
    return (
        df.select(*group_cols, "v")
        .dropDuplicates([*group_cols, "v"])
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .drop("r")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch.

    ``(k-1) / (h_(k) / 2^52)`` when the sketch is full; exact count
    of retained values when the group has fewer than k distinct keys
    (the sketch degenerates to the exact set — zero error).
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sk"),
        F.max("v").alias("kth"),
    )
    est = F.when(
        F.col("n_sk") < k, F.col("n_sk").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(SCALE))
    )
    return agg.select(*group_cols, est.alias("est"), "n_sk")
