"""Row-level security and column masking — governed reads.

The Unity Catalog / Snowflake governance shape, composed from plain
Catalyst expressions so policy enforcement costs nothing at scale:

- a COLUMN MASKING policy is ``(role, column) -> column`` — the
  governed read replaces the column expression in the projection;
- a ROW ACCESS policy is ``(role) -> boolean column | None`` — the
  governed read injects it as a filter BEFORE masking, so masking
  can never hide rows from the row policy and the predicate still
  reaches the parquet scan (PushedFilters — pinned in tests).

Reference parity: the reference has no multi-user governance at all
(single-operator GUI, SURVEY §1); this extends the [L] SQL surface
the way production warehouses do.

100 TB posture: masks are pure JVM projection expressions (zero extra
scans, no Python); the row policy is an ordinary pushdown-eligible
predicate, so a governed read of a partition-pruned table scans
exactly what the equivalent hand-written filtered query would.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MaskFn = Callable[[str, Column], Column]

__all__ = [
    "apply_governance",
    "mask_hash",
    "mask_null",
    "mask_partial",
    "unless_role",
]


def mask_hash() -> Callable[[Column], Column]:
    """Deterministic one-way mask: sha2-256 hex — joinable/groupable
    across governed queries without revealing the value."""
    return lambda col: F.sha2(col.cast("string"), 256)


def mask_partial(
    keep_last: int = 4, prefix: str = "***-"
) -> Callable[[Column], Column]:
    """Show only the last ``keep_last`` characters."""
    return lambda col: F.concat(
        F.lit(prefix), F.substring(col, -keep_last, keep_last)
    )


def mask_null() -> Callable[[Column], Column]:
    """Full redaction, type-preserving (NULL of the column's type)."""
    return lambda col: F.when(F.lit(False), col)


def unless_role(
    privileged: set[str], mask: Callable[[Column], Column]
) -> MaskFn:
    """Lift a plain mask into a role-aware policy: privileged roles
    see the clear column, everyone else the masked expression."""
    return lambda role, col: col if role in privileged else mask(col)


def apply_governance(
    df: DataFrame,
    role: str,
    masks: dict[str, MaskFn] | None = None,
    row_policy: Callable[[str], Column | None] | None = None,
) -> DataFrame:
    """The governed read: row policy first (a pushdown-eligible
    filter), then masking policies as projection rewrites. Columns
    without a policy pass through untouched; masked columns keep
    their name, so downstream queries are unchanged."""
    if row_policy is not None:
        pred = row_policy(role)
        if pred is not None:
            df = df.filter(pred)
    if masks:
        unknown = sorted(set(masks) - set(df.columns))
        if unknown:
            raise ValueError(f"masking policies on missing columns {unknown}")
        df = df.select(
            *[
                masks[c](role, F.col(c)).alias(c) if c in masks else F.col(c)
                for c in df.columns
            ]
        )
    return df
