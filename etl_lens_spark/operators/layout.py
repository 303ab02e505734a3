"""Z-order (Morton-curve) data layout — multi-dimensional clustering
so that a range predicate on ANY of the clustered columns prunes
files/row-groups, not just the single lead sort key.

A linear sort on (a, b) prunes scans filtered on `a` but does nothing
for filters on `b` alone. Interleaving the bits of both dimensions
into one Morton code and range-partitioning + sorting on it gives
every file a small bounding BOX in (a, b) space: parquet min/max
stats on the raw columns then prune for predicates on either
dimension. This is the layout trick lakehouse table formats (Delta
OPTIMIZE ZORDER BY, Iceberg sort orders) apply before compaction; here
it is a plain DataFrame operator feeding any sink.

Everything is integer arithmetic in JVM codegen (no UDFs): dimensions
scale to [0, 2^bits) via global min/max (an O(1) broadcast), and the
interleave is a fixed OR-of-shifts expression tree. The same
expression text runs on DuckDB (declared query
``zorder_cluster_stats`` pins the arithmetic cross-engine).

At 100 TB: min/max is one cheap agg over parquet stats-friendly
columns; ``repartitionByRange`` on the z-value samples the key space
(one extra job over the sampled key only), and the final
``sortWithinPartitions`` is the pre-write clustering pass a
compaction job runs anyway. Skewed dimensions degrade the curve's
balance, not its correctness — range partitioning absorbs skew by
splitting hot z-ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_expr(xname: str, yname: str, bits: int) -> str:
    """SQL text for the Morton interleave of two already-scaled
    non-negative ints in [0, 2^bits). Pure `>> & << |` — parses
    identically in Spark SQL and DuckDB, so oracles can share it."""
    terms = []
    for b in range(bits):
        terms.append(f"((({xname} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({yname} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def scale_expr(name: str, lo: str, hi: str, bits: int, idiv: str) -> str:
    """SQL text scaling ``name`` from [lo, hi] to [0, 2^bits) by
    integer division (``idiv``: 'div' for Spark, '//' for DuckDB)."""
    return (
        f"(({name} - {lo}) * {1 << bits}) {idiv} ({hi} - {lo} + 1)"
    )


def with_zvalue(
    df: DataFrame, xcol: str, ycol: str, bits: int = 8, out: str = "zval"
) -> DataFrame:
    """Append the Morton code of (xcol, ycol), scaling each dimension
    by its global min/max (computed once, broadcast as a 1-row cross
    join — the scalar-subquery shape)."""
    bounds = df.agg(
        F.min(xcol).cast("long").alias("__xlo"),
        F.max(xcol).cast("long").alias("__xhi"),
        F.min(ycol).cast("long").alias("__ylo"),
        F.max(ycol).cast("long").alias("__yhi"),
    )
    sx = scale_expr(xcol, "__xlo", "__xhi", bits, "div")
    sy = scale_expr(ycol, "__ylo", "__yhi", bits, "div")
    z = interleave_expr(f"({sx})", f"({sy})", bits)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, F.expr(z))
        .drop("__xlo", "__xhi", "__ylo", "__yhi")
    )


def zorder_by(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Morton curve of (xcol, ycol): every
    output partition covers a compact 2-d box, so parquet min/max
    stats on BOTH raw columns become selective after writing."""
    zdf = with_zvalue(df, xcol, ycol, bits)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        zdf.repartitionByRange(parts, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
    )
