"""Deterministic sampling and sequence-packing operators — the
dataset-assembly half of a training-data pipeline ([N] surface,
BASELINE.json north-star: operations a 100 TB curation job runs after
dedup/quality filtering).

Design constraints that shape everything here:

- **Determinism**: sampling decisions must be a pure function of the
  row key (+ an explicit salt), never of partitioning, task order, or
  an RNG stream — so reruns, retries, and incremental backfills pick
  the SAME rows. Implemented as md5-bucket hashing (first 8 hex chars
  → uint32 → per-myriad bucket), which any engine can recompute —
  including DuckDB, which is what makes the oracles possible.
- **One pass, no shuffle for sampling**: the predicate is row-local.
  Mixing N sources with different rates is one scan with a per-stratum
  rate lookup, not N scans.
- **Packing is order-defined**: bin assignment must name an explicit
  total order; anything else is nondeterministic under Spark's
  parallel scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000  # per-myriad resolution for rates


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from the row key: first 8
    hex chars of md5(salt || key) as uint32, mod 10⁴. Stable across
    engines, partitionings, and reruns."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS
    )


def hash_sample(
    df: DataFrame, key: Column, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key
    hash. Row-local predicate — pushes past joins, no shuffle, no RNG."""
    return df.filter(hash_bucket(key, salt) < int(fraction * BUCKETS))


def mix_sources(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key: Column,
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted dataset mixing: keep each stratum (e.g. source corpus)
    at its own sampling rate — the 'data mixture' step of a training
    pipeline, as ONE deterministic scan.

    ``rates`` maps stratum value → keep fraction; unlisted strata get
    ``default_rate``. The per-row cost is a hash + a map lookup, all
    JVM-side."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    thresh = (
        F.coalesce(
            rate_map[F.col(stratum_col)], F.lit(float(default_rate))
        )
        * BUCKETS
    ).cast("long")
    return df.filter(hash_bucket(key, salt) < thresh)


def pack_offset_bins(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    capacity: int,
    bin_col: str = "bin_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Token-budget binning by running offset: items in ``order_cols``
    order are laid end-to-end and ``bin_id = floor(offset/capacity)``
    — items may straddle a boundary (chunked, not greedy), which is
    exactly the semantics of packing a token stream into fixed
    context windows. Pure prefix-sum: one window pass, SQL-expressible
    in any engine (the oracle recomputes it).

    ``shard_col`` is the 100 TB lever: with it the window PARTITIONS
    by shard — offsets reset per shard, every shard packs in parallel
    on its own partition, and no stage sees the global order. Without
    it the window is global (one reducer) — keep that form for small
    curated sets and oracle anchoring only. A distributed packer
    wants per-shard bins anyway: one output file per shard."""
    base = (
        Window.partitionBy(shard_col) if shard_col else Window
    )
    w = base.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offset = F.sum(F.col(size_col)).over(w) - F.col(size_col)
    return df.withColumn(
        bin_col, F.floor(offset / F.lit(capacity)).cast("long")
    )


def pack_greedy_bins(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    capacity: int,
    shard_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """TRUE greedy packing: a bin takes items (in order) until the
    next would overflow ``capacity``, then a new bin starts — no item
    straddles. The bin-boundary reset makes this non-prefix-sum, so it
    runs as an ordered per-group scan in ``applyInPandas`` (Arrow
    batches, O(n) per shard). Shard by a partition key at scale
    (``shard_col``); bins are then local to a shard, which is what a
    distributed packer wants anyway (one output file per shard).
    Oversized single items get a bin of their own."""
    shard = shard_col or "__shard"
    d = df if shard_col else df.withColumn(shard, F.lit(0))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields
    ) + f", {bin_col} bigint"
    order_keys = list(order_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_keys, kind="mergesort")
        bins = []
        cur_bin, cur_fill = 0, 0
        for sz in pdf[size_col]:
            s = int(sz)
            if cur_fill > 0 and cur_fill + s > capacity:
                cur_bin += 1
                cur_fill = 0
            bins.append(cur_bin)
            cur_fill += s
        pdf[bin_col] = pd.Series(bins, index=pdf.index, dtype="int64")
        return pdf

    packed = d.groupBy(shard).applyInPandas(pack, out_schema)
    return packed.drop("__shard") if not shard_col else packed


def sample_stratified_n(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key: Column,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-n-per-stratum deterministic sample: rank rows inside
    each stratum by key hash (ties broken by the key itself) and keep
    the first n. Unlike fraction sampling this guarantees quota
    fulfillment for skewed strata — the 'n examples per source/
    language' step of eval-set construction.

    One shuffle on the stratum column; the rank is a window over the
    hash order, so the choice is stable across partitionings and
    reruns (no RNG). At 100 TB prefer a two-phase quantile cut for
    very hot strata; the window form is exact and fine while each
    stratum fits a reducer's spill budget."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(key, salt).asc(), key.cast("string").asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )
