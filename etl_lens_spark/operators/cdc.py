"""Change-data-capture / snapshot-maintenance operators.

The reference is a read-only viewer (SURVEY §2.2 scopes DML out), but
any engine that *feeds* a 100 TB lakehouse needs the batch CDC
algebra: diff two snapshots into a changelog, apply a changelog onto a
snapshot (the Delta/Iceberg MERGE shape, expressed as plain joins so
Catalyst plans it), and cheap order-independent table checksums for
replica reconciliation without a global sort.

Scale posture (the whole point of these shapes):
- ``snapshot_diff`` / ``merge_apply`` — ONE shuffle per side, keyed on
  the merge key; everything after the co-partitioned full-outer join
  is row-local. No broadcast needed (both sides are big); AQE picks
  the join strategy.
- ``table_checksum`` — a single scan per replica projecting a 64-bit
  row digest, then an algebraic SUM/COUNT per bucket: the shuffle
  carries ``n_buckets`` rows, not the table. This is how you verify a
  100 TB replica nightly: no sort, no row transfer, map-side combine
  does all the work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from etl_lens_spark.operators.staging import stage


def row_digest(cols: Sequence[Column]) -> Column:
    """Order-independent-summable 64-bit-ish digest of a row.

    md5 over a '|'-joined canonical string, first 8 hex chars as a
    BIGINT — the same expression is writable verbatim in DuckDB
    (``('0x' || substring(md5(...), 1, 8))::BIGINT``), so oracle
    queries can recompute it. Inputs must already be deterministic
    strings (cast floats to scaled integers first — engine float
    formatting differs).
    """
    joined = F.concat_ws("|", *cols)
    return F.conv(F.substring(F.md5(joined.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Diff two keyed snapshots into a changelog.

    Output: one row per key present in either side with
    ``status ∈ {added, removed, changed, unchanged}`` plus the old/new
    values of every compared column (old_<c>, new_<c>).

    Plan: full outer join on the key — one shuffle per side, then a
    row-local CASE. Change detection compares the columns directly
    (null-safe), not a hash, so a digest collision can never mask a
    change.
    """
    o = old.select(
        key,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        key,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    joined = o.join(n, key, "full_outer")
    # Presence comes from join-side markers, never from value columns —
    # a legitimately-NULL compared value must not read as absence.
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    return joined.withColumn(
        "status",
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed")),
    ).drop("_in_old", "_in_new")


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a changelog to a snapshot (batch MERGE).

    ``changes`` rows carry ``op`` ('U' = upsert, 'D' = delete) and a
    monotone ``seq``; for each key only the latest change (max seq,
    op as deterministic tie-break) is applied. Semantics match a
    Delta-style ``MERGE WHEN MATCHED UPDATE / DELETE WHEN NOT MATCHED
    INSERT`` driven by a deduplicated changelog.

    Plan: latest-change election is one window over the key shuffle;
    the apply is a full outer join that reuses the same hash
    partitioning — two exchanges total, both on the merge key, then
    row-local coalescing. Nothing is collected; no broadcast assumed.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    data_cols = [c for c in base.columns if c != key]
    ch = latest.select(
        key,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_ch_{c}") for c in data_cols],
    )
    joined = base.join(ch, key, "full_outer")
    out = joined.filter(
        F.col("_op").isNull() | (F.col("_op") != F.lit("D"))
    )
    picked = [
        F.when(F.col("_op") == "U", F.col(f"_ch_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in data_cols
    ]
    return out.select(key, *picked)


def table_checksum(
    df: DataFrame,
    digest: Column,
    bucket: Column,
) -> DataFrame:
    """Per-bucket order-independent checksum: (bucket, n_rows, sum of
    row digests). Comparing two replicas' outputs localizes drift to a
    bucket without moving any rows — the aggregate is algebraic, so
    map-side combine reduces each scan partition to ``n_buckets``
    rows before the (tiny) shuffle.
    """
    return (
        df.select(bucket.alias("bucket"), digest.alias("_d"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_d").cast("long").alias("checksum"),
        )
    )


def scd2_apply_changes(
    dim: DataFrame,
    feed: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    effective_us: int,
    broadcast_feed: bool = True,
) -> DataFrame:
    """Incremental Type-2 SCD maintenance from a change data feed —
    the consumer of lakelog.change_feed that keeps a dimension
    current WITHOUT re-scanning its history (the from-scratch
    builder is warehouse_scd2_build; this is its per-batch
    maintenance twin).

    ``dim`` is an SCD2 dimension: ``key_cols``, ``version_seq``
    (per-key 1-based), ``attr_cols``, ``valid_from_us``,
    ``valid_to_us`` (NULL = open), ``is_current`` (long 0/1).
    ``feed`` carries ``key_cols`` + ``attr_cols`` + ``_change_type``
    in lakelog.change_feed's vocabulary (insert / delete /
    update_preimage / update_postimage). The batch is applied at
    instant ``effective_us``:

    - delete / update → the key's CURRENT row closes
      (valid_to = effective_us, is_current = 0);
    - insert / update → a new current row opens at effective_us with
      version_seq = (key's max historical seq) + 1, so a key
      re-inserted after a delete CONTINUES its sequence rather than
      colliding with closed history.

    Incrementality posture: dimension rows are split by ONE
    left-semi/anti pair on the (small) feed key set — broadcast by
    default, so untouched keys (at 100 TB: almost all of them) pass
    through with zero shuffle and zero rewrite; the per-key max-seq
    aggregate runs over touched keys' rows only, O(|feed| × versions
    per key), never the corpus. Set ``broadcast_feed=False`` when a
    backfill-sized feed would not fit a broadcast.

    The feed must be a consistent CDF batch: an `insert` key has no
    open row, a `delete`/`update` key has exactly one. (Malformed
    feeds are not detected — garbage in, garbage out, same as Delta's
    APPLY CHANGES.)

    Every key join is NULL-SAFE (``eqNullSafe`` — round-7 review
    fix), matching lakelog.change_feed's null-safe diff: a NULL-key
    delete/update closes the NULL-key open row and a NULL-key update
    continues that key's version sequence instead of colliding."""
    import functools

    keys = list(key_cols)
    bc = F.broadcast if broadcast_feed else (lambda d: d)

    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"{prefix}{k}") for k in keys],
            *[c for c in df.columns if c not in keys],
        )

    def key_cond(prefix: str):
        return functools.reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"{prefix}{k}")) for k in keys],
        )

    if broadcast_feed:
        # the feed fans out into four derived frames (closers,
        # openers, feed_keys, max_seq join) — materialize its
        # projection ONCE instead of recomputing the upstream CDF
        # lineage per broadcast; it is small by the same assumption
        # that makes broadcasting it correct
        feed = stage(
            feed.select(*keys, *attr_cols, "_change_type"),
            "cdc_feed",
        )
    closers = (
        feed.filter(F.col("_change_type").isin("delete", "update_preimage"))
        .select(*keys)
        .distinct()
    )
    openers = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select(*keys, *attr_cols)
    feed_keys = closers.unionByName(openers.select(*keys)).distinct()

    fk = keyed(feed_keys, "__fk_")
    untouched = dim.join(bc(fk), key_cond("__fk_"), "left_anti")
    touched = dim.join(bc(fk), key_cond("__fk_"), "left_semi")
    # close the current row of every closing key; other touched rows
    # (closed history of the same keys) pass through unchanged
    cl = keyed(closers, "__cl_").withColumn("__close", F.lit(1))
    closing = touched.join(bc(cl), key_cond("__cl_"), "left")
    adjusted = closing.select(
        *keys,
        "version_seq",
        *attr_cols,
        "valid_from_us",
        F.when(
            (F.col("is_current") == 1) & F.col("__close").isNotNull(),
            F.lit(effective_us).cast("long"),
        )
        .otherwise(F.col("valid_to_us"))
        .alias("valid_to_us"),
        F.when(
            (F.col("is_current") == 1) & F.col("__close").isNotNull(),
            F.lit(0),
        )
        .otherwise(F.col("is_current"))
        .cast("long")
        .alias("is_current"),
    )
    max_seq = keyed(
        touched.groupBy(*keys).agg(
            F.max("version_seq").alias("__prev_seq")
        ),
        "__ms_",
    )
    new_rows = openers.join(bc(max_seq), key_cond("__ms_"), "left").select(
        *keys,
        (F.coalesce(F.col("__prev_seq"), F.lit(0)) + 1)
        .cast("long")
        .alias("version_seq"),
        *attr_cols,
        F.lit(effective_us).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(1).cast("long").alias("is_current"),
    )
    cols = [
        *keys,
        "version_seq",
        *attr_cols,
        "valid_from_us",
        "valid_to_us",
        "is_current",
    ]
    return (
        untouched.select(*cols)
        .unionByName(adjusted.select(*cols))
        .unionByName(new_rows.select(*cols))
    )
