"""Staged-lineage materialization, behind one switchable helper.

Round 11 cut multiply-referenced lineages (a frame consumed by 2-4
downstream branches re-executes its whole lineage per consumer, and
AQE's broadcast promotion defeats ReusedExchange on self-joins) by
inserting ``localCheckpoint(eager=False)`` at the natural
materialization points. Two review findings against that (ADVICE
r11):

- ``localCheckpoint`` stores non-replicated executor-local blocks:
  on a real cluster an executor loss makes the job unrecoverable
  (unsafe with dynamic allocation), so deployments need an opt-out;
- truncating the plan at the checkpoint blinded the plan-shape pins
  to everything upstream of it.

``stage()`` answers both. The materialization mode is read from
session conf so a cluster deployment can pick its safety/cost point
without touching query code:

``spark.etl_lens.stage.mode``:
  - ``localCheckpoint`` (default): cheapest, right for local/driver
    bench runs and for ephemeral O(delta)/O(groups) rollups;
  - ``persist``: MEMORY_AND_DISK cache, lineage kept — an executor
    loss recomputes instead of killing the job (the cluster-safe
    choice; frames stay pinned until GC or unpersist, same as any
    cache);
  - ``none``: pass-through (correctness is unaffected by staging —
    every consumer just recomputes the lineage).

Plan-pin support: tests flip ``capture()`` on and every ``stage()``
call records the *pre-materialization* DataFrame with its label, so
the interior plan shape (exchanges, join strategies upstream of the
truncation point) stays assertable (VERDICT r11 item 10).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_MODE_CONF = "spark.etl_lens.stage.mode"

# (label, DataFrame) pairs recorded while capture is enabled
_captured: list[tuple[str, DataFrame]] = []
_capture_on = False


def stage(df: DataFrame, label: str = "") -> DataFrame:
    """Materialize a multiply-consumed frame once (guide §5).

    Callers pass O(groups)/O(delta)-bounded rollups — never the raw
    corpus (corpus-sized frames use an explicit ``persist``; see
    text/pipeline.py::segment_dedup).
    """
    if _capture_on:
        _captured.append((label, df))
    mode = df.sparkSession.conf.get(_MODE_CONF, "localCheckpoint")
    if mode == "none":
        return df
    if mode == "persist":
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)


@contextmanager
def capture():
    """Record every stage()'d frame (pre-materialization) so tests
    can pin the INTERIOR plan shape that the checkpoint truncates
    out of the returned plan. Yields the live list; entries are
    (label, DataFrame)."""
    global _capture_on
    _captured.clear()
    _capture_on = True
    try:
        yield _captured
    finally:
        _capture_on = False
        _captured.clear()
