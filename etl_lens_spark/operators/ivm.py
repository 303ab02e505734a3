"""Incremental view maintenance over change feeds — Z-set delta rules.

The lakehouse CDF loop's last mile: a materialized JOIN-AGGREGATE
view kept current from the tables' change feeds WITHOUT recomputing
it. The algebra is the classic delta-rule / Z-set (weighted multiset)
formulation used by every published IVM system (Gupta & Mumick's
delta rules; DBSP, VLDB 2023; differential dataflow):

- a change-feed row becomes a weighted row: insert/update_postimage
  carry weight +1, delete/update_preimage carry -1 — an UPDATE is
  exactly (-old, +new), which the CDF already emits as its image
  pair;
- join is bilinear, so
  ``(R+ΔR) ⋈ (S+ΔS) − R ⋈ S  =  ΔR⋈S + R⋈ΔS + ΔR⋈ΔS``
  with weights multiplying — three joins whose delta sides are tiny
  and broadcast, never a re-join of the full tables;
- COUNT/SUM aggregates are linear: the view absorbs the delta by
  adding ``Σ w`` to its count and ``Σ w·x`` to each sum per group,
  and a group whose maintained count reaches zero leaves the view.

Reference parity: the reference engine (src/main.cpp) has no view
maintenance at all; this extends the SURVEY §2.2 "Tx/DML" row's CDF
machinery (operators/lakelog.py::table_changes) the same way
cdc.scd2_apply_changes extends it for dimensions.

100 TB posture: maintenance cost is O(changes × matching rows), not
O(view input). ΔR⋈S and R⋈ΔS each read the OTHER side only where the
(broadcast) delta's keys hit — with key-clustered layout the lake
log's file skipping prunes those scans to touched files; the full
tables are never joined against each other again. That asymmetry —
recompute is a 100 TB shuffle, maintenance is a broadcast probe — is
the entire reason production warehouses run delta rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "changes_to_zset",
    "consolidate",
    "delta_join",
    "maintain_agg",
    "maintain_distinct",
    "maintain_minmax",
    "maintain_topk",
]

_WEIGHT = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def changes_to_zset(changes: DataFrame, cols: list[str]) -> DataFrame:
    """Project a CDF frame (``_change_type`` labelled) to a Z-set:
    ``cols`` + integer weight column ``__w``. An unknown (or NULL)
    change type raises AT SCAN TIME rather than silently dropping the
    row — a typo'd label in a hand-built feed or a future new change
    type must not make the maintained view quietly diverge (the same
    refuse-don't-clamp stance as maintain_distinct)."""
    w = F.when(F.lit(False), F.lit(0))
    for ct, wt in _WEIGHT.items():
        w = w.when(F.col("_change_type") == ct, F.lit(wt))
    w = w.otherwise(
        F.raise_error(
            F.concat(
                F.lit("changes_to_zset: unknown _change_type "),
                F.coalesce(F.col("_change_type"), F.lit("NULL")),
            )
        ).cast("int")
    )
    return changes.select(*cols, w.cast("long").alias("__w"))


def consolidate(zset: DataFrame) -> DataFrame:
    """Collapse a Z-set to one row per distinct tuple with its net
    weight, dropping zero-weight tuples. Optional (the algebra is
    correct without it) but shrinks a feed in which the same row
    churned repeatedly before it fans into three joins."""
    cols = [c for c in zset.columns if c != "__w"]
    return (
        zset.groupBy(*cols)
        .agg(F.sum("__w").alias("__w"))
        .filter(F.col("__w") != 0)
    )


def delta_join(
    r_old: DataFrame,
    dr: DataFrame,
    s_old: DataFrame,
    ds: DataFrame,
    on: list[str],
) -> DataFrame:
    """Δ(R ⋈ S) as a Z-set, from the OLD states and the two deltas:
    ``ΔR⋈S + R⋈ΔS + ΔR⋈ΔS`` (bilinearity), weights multiplying.
    ``r_old``/``s_old`` carry implicit weight 1 (plain snapshots);
    ``dr``/``ds`` carry ``__w``. Both deltas are broadcast — the old
    states are only ever PROBED, never shuffled. Non-key column
    names must be disjoint between the two sides (alias first)."""
    t1 = F.broadcast(dr).join(s_old, on)
    t2 = r_old.join(F.broadcast(ds), on)
    t3 = (
        F.broadcast(dr.withColumnRenamed("__w", "__wr"))
        .join(F.broadcast(ds.withColumnRenamed("__w", "__ws")), on)
        .withColumn("__w", F.col("__wr") * F.col("__ws"))
        .drop("__wr", "__ws")
    )
    return t1.unionByName(t2).unionByName(t3)


def maintain_agg(
    view_old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str,
    sums: dict[str, Column],
) -> DataFrame:
    """Absorb a Z-set ``delta`` into a COUNT/SUM view: per group add
    ``Σ w`` to ``count_col`` and ``Σ w·expr`` to each sum column;
    groups the delta creates appear, groups whose count reaches zero
    disappear. One shuffle of the (tiny) delta aggregate; the old
    view joins it full-outer on the group key."""
    # Sum deltas keep the measure expression's own type (a double
    # measure stays double — round-9 review fix: the old unconditional
    # cast('long') silently truncated fractional deltas per step);
    # only the count, integral by construction, is pinned to long.
    d = delta.groupBy(*keys).agg(
        F.sum("__w").cast("long").alias(f"__d_{count_col}"),
        *[
            F.sum(expr * F.col("__w")).alias(f"__d_{a}")
            for a, expr in sums.items()
        ],
    )
    merged = view_old.join(d, keys, "full_outer")
    zero = F.lit(0).cast("long")
    out_cols = [
        *keys,
        (
            F.coalesce(F.col(count_col), zero)
            + F.coalesce(F.col(f"__d_{count_col}"), zero)
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(a), F.lit(0))
                + F.coalesce(F.col(f"__d_{a}"), F.lit(0))
            ).alias(a)
            for a in sums
        ],
    ]
    return merged.select(*out_cols).filter(F.col(count_col) != 0)


def maintain_distinct(
    support_old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    cnt_col: str = "cnt",
) -> DataFrame:
    """Maintain the SUPPORT of COUNT(DISTINCT value) per group under
    inserts AND deletes — the aggregate delta rules can't fold as a
    scalar (distinct is not linear): keep one reference count per
    (group, value); a value leaves the group when its count reaches
    zero, and the distinct count is simply the surviving row count
    per group (derive with ``groupBy(keys).count()``).

    ``support_old`` carries keys + value_col + ``cnt_col``;
    ``delta`` is a Z-set over keys + value_col. Raises if a merged
    count goes negative — the feed claimed a delete of a value the
    support never held, which means the feed and the view have
    diverged and silent clamping would hide it.

    100 TB posture: the support table is the view's own state (rows =
    live (group, value) pairs, the same cardinality an exact
    distinct needs anywhere); the merge shuffles only the delta
    aggregate and full-outer-joins it against the support on the
    (group, value) key — O(changes) against the state, never a
    re-scan of the corpus."""
    d = delta.groupBy(*keys, value_col).agg(
        F.sum("__w").cast("long").alias("__dw")
    )
    zero = F.lit(0).cast("long")
    cnt_new = F.coalesce(F.col(cnt_col), zero) + F.coalesce(
        F.col("__dw"), zero
    )
    # Round-9 review fix: the underflow guard rides INSIDE the count
    # column (raise_error fires during the same localCheckpoint job
    # that materializes the merge) instead of a second eager
    # .filter().count() job — at streaming rates that was one extra
    # job per epoch for a check the materialization can carry.
    guarded = F.when(
        cnt_new < 0,
        F.raise_error(
            F.lit(
                "distinct-support underflow — the change feed "
                "deleted values the view never held; refusing to "
                "clamp"
            )
        ).cast("long"),
    ).otherwise(cnt_new)
    plan = support_old.join(d, [*keys, value_col], "full_outer").select(
        *keys, value_col, guarded.alias(cnt_col)
    )
    try:
        # materialize once: without this the full-outer merge (plus
        # its CDF lineage) would recompute on every downstream action
        merged = plan.localCheckpoint()
    except Exception as exc:  # translate the in-plan raise back
        if "distinct-support underflow" in str(exc):
            raise ValueError(
                "distinct-support underflow — the change feed "
                "deleted values the view never held; refusing to "
                "clamp"
            ) from None
        raise
    return merged.filter(F.col(cnt_col) != 0)


def maintain_minmax(
    view_old: DataFrame,
    support_new: DataFrame,
    touched: DataFrame,
    keys: list[str],
    value_col: str,
    cnt_col: str = "cnt",
    vmin_col: str = "vmin",
    vmax_col: str = "vmax",
    n_col: str = "n",
) -> DataFrame:
    """Maintain MIN/MAX (+ count) per group under inserts AND
    deletes — the EXTREMAL aggregates, which no scalar delta can
    fold (deleting the current minimum says nothing about the next
    one): the auxiliary state is the refcounted (group, value)
    support ``maintain_distinct`` already maintains, and the update
    rule is hierarchical — groups untouched by the delta keep their
    old extrema verbatim (at 100 TB: almost all of them), while each
    TOUCHED group re-aggregates only ITS OWN support slice, which is
    exactly the set any engine must examine once its minimum dies.

    ``view_old`` carries keys + vmin/vmax/n; ``support_new`` is the
    already-maintained support (keys, value, cnt); ``touched`` is
    the delta's distinct key set (broadcast). A touched group whose
    support emptied disappears from the view.

    100 TB posture: cost = O(changes) for the support merge (done by
    the caller via maintain_distinct) + O(support of touched groups)
    for the re-aggregation — never a corpus scan, never a re-read of
    untouched groups' state."""
    rec = (
        support_new.join(F.broadcast(touched), keys, "left_semi")
        .groupBy(*keys)
        .agg(
            F.min(value_col).alias(vmin_col),
            F.max(value_col).alias(vmax_col),
            F.sum(cnt_col).cast("long").alias(n_col),
        )
    )
    keep = view_old.join(F.broadcast(touched), keys, "left_anti")
    return keep.unionByName(rec)


def maintain_topk(
    view_old: DataFrame,
    support_new: DataFrame,
    touched: DataFrame,
    keys: list[str],
    value_col: str,
    k: int,
    cnt_col: str = "cnt",
    rank_col: str = "rank",
) -> DataFrame:
    """Maintain the per-group TOP-K distinct values under inserts AND
    deletes — the RANKING aggregate, whose delta is non-monotone in
    the same way MIN/MAX's is (deleting the current 3rd-largest pulls
    the invisible 4th into the view; no scalar folded state can know
    it): the auxiliary state is again the refcounted (group, value)
    support ``maintain_distinct`` maintains, and the update rule is
    the same hierarchical split as ``maintain_minmax`` — groups the
    delta never touched keep their old top-k rows VERBATIM (at
    100 TB: almost all of them), while each TOUCHED group re-ranks
    only ITS OWN support slice, which is exactly the candidate set
    any engine must examine once a ranked value dies.

    ``view_old`` carries keys + rank_col + value_col + cnt_col
    (ranks 1..k, densest-first); ``support_new`` is the
    already-maintained support; ``touched`` is the delta's distinct
    key set (broadcast). Ranking is by ``value_col`` DESC — the
    support holds DISTINCT values per group, so the order is total
    and the result deterministic without a tie-break column. A
    touched group with fewer than k surviving values shrinks; one
    whose support emptied disappears.

    100 TB posture: cost = O(changes) for the support merge (the
    caller's maintain_distinct) + a window over ONLY the touched
    groups' support slices — never a corpus scan, never a re-rank of
    untouched groups. The window's shuffle carries only those
    slices."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(value_col))
    rec = (
        support_new.join(F.broadcast(touched), keys, "left_semi")
        .withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
        .select(*keys, rank_col, value_col, cnt_col)
    )
    keep = view_old.join(F.broadcast(touched), keys, "left_anti")
    return keep.unionByName(rec)
