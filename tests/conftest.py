from __future__ import annotations

import os

import pytest

from etl_lens_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round-12 verdict item 7): the default run —
    what the driver's bounded-window ``pytest tests/ -x -q`` gate
    executes — skips tests marked ``slow`` (long-running codec /
    streaming-fixture / fuzz paths) so it completes inside the gate
    window. ``SPARK_GRAFT_FULL_TESTS=1`` runs everything; the full
    tier is exercised before each round ships (OPTIMIZATION_r12.md
    records the full-run result)."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier — set SPARK_GRAFT_FULL_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="etl-lens-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
