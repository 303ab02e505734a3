"""Exact (order-independent) aggregation of money-like doubles.

Floating-point SUM depends on accumulation order, which differs
between engines and — worse — between runs as partitioning changes.
For fixed-point data (prices, rates with <= ``scale`` decimals) the
cure is to accumulate in DECIMAL: bit-exact, associative, portable,
and still fully vectorized/partial-aggregated in Tungsten. This is
also the correct behavior at 100 TB, where a double SUM over 1e12
rows silently loses whole dollars.

Every oracle-checked query with a large SUM uses these; the DuckDB
side mirrors the same casts (``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS
DOUBLE)``), making results identical rather than merely close.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """SUM of a fixed-point double, exact via decimal accumulation,
    returned as double."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """AVG as exact decimal sum / count — one double division of
    identical operands instead of an order-dependent running mean."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast(
        "double"
    ) / F.count(col)


def exact_sum_expr(a: Column, b: Column, scale_a: int = 2, scale_b: int = 2) -> Column:
    """SUM(a*b) with both factors cast to decimal first (exact product
    of fixed-point values), as double."""
    return F.sum(
        a.cast(f"decimal(18,{scale_a})") * b.cast(f"decimal(8,{scale_b})")
    ).cast("double")
