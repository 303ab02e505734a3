"""Lakehouse commit log: optimistic concurrency, snapshot replay,
hole detection."""

from __future__ import annotations

import json
import os

import pytest

from etl_lens_spark.operators import lakelog


def test_optimistic_concurrency_one_winner(tmp_path):
    t = str(tmp_path / "tbl")
    lakelog.commit(t, 0, [{"add": "a"}])
    with pytest.raises(lakelog.CommitConflict):
        lakelog.commit(t, 0, [{"add": "b"}])
    # the losing writer's actions must not have leaked into the log
    with open(os.path.join(t, "_log", "00000000.json")) as f:
        assert json.load(f) == [{"add": "a"}]
    # retry at the next version succeeds
    lakelog.commit(t, 1, [{"add": "b"}])
    assert lakelog.latest_version(t) == 1


def test_snapshot_replay_add_remove(tmp_path):
    t = str(tmp_path / "tbl")
    lakelog.commit(t, 0, [{"add": "a"}, {"add": "b"}])
    lakelog.commit(t, 1, [{"remove": "a"}, {"add": "c"}])
    lakelog.commit(t, 2, [{"remove": "c"}])
    names = lambda v: [  # noqa: E731
        os.path.basename(p) for p in lakelog.snapshot_files(t, v)
    ]
    assert names(0) == ["a", "b"]
    assert names(1) == ["b", "c"]
    assert names(2) == ["b"]
    assert names(None) == ["b"]  # latest


def test_log_hole_detected(tmp_path):
    t = str(tmp_path / "tbl")
    lakelog.commit(t, 0, [{"add": "a"}])
    lakelog.commit(t, 2, [{"add": "c"}])  # 1 missing
    with pytest.raises(ValueError, match="hole"):
        lakelog.snapshot_files(t, 2)


def test_remove_unknown_file_is_noop(tmp_path):
    t = str(tmp_path / "tbl")
    lakelog.commit(t, 0, [{"remove": "ghost"}, {"add": "a"}])
    assert [os.path.basename(p) for p in lakelog.snapshot_files(t)] == ["a"]
