"""Shared drift-monitor arithmetic: the Laplace-smoothed PSI fold
used by both the batch monitor (feature_psi_drift) and its streaming
twin (streaming_psi_drift_live) — one definition of the smoothing
constant and the contribution formula, in BOTH engines' dialects, so
a future change cannot drift between the twins (the exact failure
mode a review pass caught in the cut-selection step)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SMOOTH = 0.5  # Laplace mass per bin: an emptied bin reports a large
# finite contribution instead of ln(0)


def smoothed_psi_frame(cnt: DataFrame, n_bins: int = 10) -> DataFrame:
    """(bin, n_ref, n_cur) → per-bin smoothed proportions, PSI
    contribution, and the windowed total (bounded n_bins-row frame).
    PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur) with
    p = (n + SMOOTH) / (N + n_bins·SMOOTH)."""
    tot = cnt.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    denom = float(n_bins * SMOOTH)
    p = cnt.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        ((F.col("n_ref") + SMOOTH) / (F.col("tr") + denom)).alias(
            "p_ref"
        ),
        ((F.col("n_cur") + SMOOTH) / (F.col("tc") + denom)).alias(
            "p_cur"
        ),
    )
    contrib = (F.col("p_ref") - F.col("p_cur")) * F.log(
        F.col("p_ref") / F.col("p_cur")
    )
    return (
        p.withColumn("psi_contrib", contrib)
        .withColumn(
            "psi_total",
            F.sum("psi_contrib").over(Window.partitionBy()),
        )
        .orderBy("bin")
    )


def psi_oracle_tail(n_bins: int = 10) -> str:
    """DuckDB SQL from a CTE ``cnt(bin, n_ref, n_cur)`` to the final
    per-bin PSI rows — the exact mirror of smoothed_psi_frame."""
    denom = float(n_bins * SMOOTH)
    return f"""
    tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
                   CAST(SUM(n_cur) AS BIGINT) AS tc FROM cnt),
    p AS (
      SELECT bin, n_ref, n_cur,
             (n_ref + {SMOOTH}) / (tr + {denom}) AS p_ref,
             (n_cur + {SMOOTH}) / (tc + {denom}) AS p_cur
      FROM cnt CROSS JOIN tot
    )
    SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur, p_ref, p_cur,
           (p_ref - p_cur) * ln(p_ref / p_cur) AS psi_contrib,
           SUM((p_ref - p_cur) * ln(p_ref / p_cur)) OVER () AS psi_total
    FROM p ORDER BY bin
    """
