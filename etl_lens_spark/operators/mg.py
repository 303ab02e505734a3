"""Misra–Gries mergeable heavy-hitter summary.

The DETERMINISTIC member of the frequency-sketch family (CMS is its
probabilistic sibling in operators/cms.py): k−1 counters track
candidate heavy items; processing decrements all counters when a new
item arrives with no free slot. Guarantees, for true count c(x) over
n items with summary size k:

    ĉ(x) ∈ [c(x) − n/k, c(x)]       (one-sided undercount ≤ n/k)

and every item with c(x) > n/k is PRESENT in the summary — the
property that makes it the standard pre-filter for exact heavy-hitter
verification at scale.

Distribution: the Agarwal et al. (2013) merge — sum counters
item-wise, then subtract the (k)-th largest combined counter from all
and drop non-positives — preserves the same bound over the COMBINED
stream, so per-partition summaries + a tree of merges is the 100 TB
plan: one pass over the data, O(k) state per partition, O(P·k) rows
to the driver-free final merge.

Summary contents depend on partitioning (which ties get decremented),
so MG queries are rows-only; the ε-bound is the testable contract
(tests/test_mg.py), exactly like the GK live-quantile twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summarize(
    df: DataFrame, item_col: str, k: int = 16
) -> DataFrame:
    """Per-partition Misra–Gries pass + one global merge.

    Returns (item, mg_count) with ≤ k−1 rows. The per-partition pass
    runs in Arrow batches (mapInPandas — O(k) state per task, items
    never shuffle raw); partial summaries (≤ (k−1) rows per
    partition) merge with the counter-sum + k-th-largest-subtraction
    rule, implemented relationally: a grouped SUM then a rank window
    over the ≤ P·(k−1)-row partials frame.
    """
    import pandas as pd

    def per_partition(batches):
        c: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[item_col].dropna():
                if item in c:
                    c[item] += 1
                elif len(c) < k - 1:
                    c[item] = 1
                else:
                    c = {i: v - 1 for i, v in c.items() if v > 1}
        if c:
            yield pd.DataFrame(
                {"item": list(c), "partial": list(c.values())}
            )

    partials = df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        per_partition, schema="item string, partial long"
    )
    return mg_merge_partials(partials, k)


def mg_merge_partials(partials: DataFrame, k: int) -> DataFrame:
    """Agarwal et al. mergeable-summaries combine over (item, partial)
    rows from any number of MG summaries: sum counters item-wise,
    subtract the k-th largest combined counter (0 if fewer than k
    items), keep positives. Runs relationally over the tiny partials
    frame (≤ summaries·(k−1) rows); the rank window rides that
    reduced frame, not data."""
    summed = partials.groupBy("item").agg(
        F.sum("partial").cast("long").alias("c")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("c"), "item")
    ranked = summed.withColumn("rk", F.row_number().over(w))
    kth = ranked.filter(F.col("rk") == k).select(
        F.col("c").alias("kth")
    )
    return (
        ranked.crossJoin(
            F.broadcast(
                kth.unionByName(
                    ranked.sparkSession.createDataFrame(
                        [(0,)], "kth long"
                    )
                ).agg(F.max("kth").alias("kth"))
            )
        )
        .filter(F.col("rk") < k)
        .select(
            "item", (F.col("c") - F.col("kth")).cast("long").alias("mg_count")
        )
        .filter(F.col("mg_count") > 0)
    )
