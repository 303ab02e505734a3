"""Minimal lakehouse transaction log: Delta-style versioned commits
over plain parquet files (public Delta Lake PROTOCOL.md semantics,
re-implemented from scratch — no table-format library needed).

A table is a directory of parquet data files plus ``_log/N.json``
commit files. Each commit is a JSON list of actions
(``{"add": path}`` / ``{"remove": path}``); the table state at
version V is the replay of commits 0..V. This gives the three
lakehouse properties the CDC family (operators/cdc.py) tracks at ROW
level, at FILE level instead:

- **snapshot isolation** — a reader lists the log once and reads a
  consistent file set; concurrent writers never corrupt a read.
- **optimistic concurrency** — commit N is created with os O_EXCL;
  two writers racing to the same version: exactly one wins, the
  loser re-reads and retries (test-pinned).
- **time travel** — any historical version is reconstructable while
  its files survive (VACUUM is deliberately out of scope here).

Scale posture: the log is O(commits) tiny JSON on the driver-visible
store; data files are never rewritten on commit (append/remove are
metadata). Reading version V = ``spark.read.parquet(*active_files)``
— pushdown/pruning apply per file exactly as on a plain directory.
The reference has no storage management at all (it re-scans one .etl
file per query, src/main.cpp:1081); this is [L]/[N] lakehouse surface
Spark users expect from an analytics engine.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer already created this version."""


def _log_dir(table_dir: str) -> str:
    d = os.path.join(table_dir, "_log")
    os.makedirs(d, exist_ok=True)
    return d


def commit(table_dir: str, version: int, actions: list[dict]) -> None:
    """Write commit ``version`` atomically; O_EXCL enforces optimistic
    concurrency (raises CommitConflict on a lost race)."""
    path = os.path.join(_log_dir(table_dir), f"{version:08d}.json")
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError as e:
        raise CommitConflict(f"version {version} already committed") from e
    with os.fdopen(fd, "w") as f:
        json.dump(actions, f)


def latest_version(table_dir: str) -> int:
    files = [
        f for f in os.listdir(_log_dir(table_dir)) if f.endswith(".json")
    ]
    return max((int(f[:-5]) for f in files), default=-1)


def snapshot_files(table_dir: str, version: int | None = None) -> list[str]:
    """Replay the log through ``version`` (default: latest) into the
    active file set, in first-added order."""
    if version is None:
        version = latest_version(table_dir)
    active: dict[str, None] = {}
    for v in range(version + 1):
        path = os.path.join(_log_dir(table_dir), f"{v:08d}.json")
        if not os.path.exists(path):
            raise ValueError(f"missing commit {v} (log has a hole)")
        with open(path) as f:
            for action in json.load(f):
                if "add" in action:
                    active[action["add"]] = None
                elif "remove" in action:
                    active.pop(action["remove"], None)
    return [os.path.join(table_dir, p) for p in active]


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    files = snapshot_files(table_dir, version)
    if not files:
        raise ValueError("empty snapshot")
    return spark.read.parquet(*files)
