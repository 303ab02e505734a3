"""Pre-snapshot gate (VERDICT r4 #10): one command that refreshes the
mechanical docs and verifies nothing drifted, so an end-of-round
commit can never ship undocumented queries or stale tallies again.

``python tools/preflight.py``            — regen + check, exit 1 on drift
``python tools/preflight.py --check``    — check only (no writes), for CI

Steps:
1. ``gen_docs.py`` — regenerate QUERIES.md from the registry;
2. ``gen_coverage.py --write`` — refresh COVERAGE.md's generated tally
   and fail on registry↔ledger drift;
3. re-run the no-drift check a second time post-write (a write that
   doesn't converge is itself a bug);
4. remind (not run — it takes ~13 min) that the full oracle registry
   must be green before a snapshot: ``python tools/oracle_check.py``.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable


def run(args: list[str]) -> int:
    print(f"[preflight] {' '.join(args)}", flush=True)
    return subprocess.call([PY] + args, cwd=REPO)


def main() -> int:
    check_only = "--check" in sys.argv[1:]
    rc = 0
    if not check_only:
        rc |= run(["tools/gen_docs.py", "--write"])
        rc |= run(["tools/gen_coverage.py", "--write"])
    # the post-write (or check-only) drift gate
    rc |= run(["tools/gen_coverage.py"])
    if rc:
        print("[preflight] DRIFT — fix before snapshotting", flush=True)
        return 1
    print(
        "[preflight] docs clean. Before the snapshot commit also need "
        "green: python tools/oracle_check.py  (full registry, ~13 min) "
        "and python -m pytest tests/ -q. Once per round, ALSO run "
        "ORACLE_SF_DIR=/root/testdata/sf0.1 python tools/"
        "permutation_probe.py — magnitude-dependent float flakes "
        "(round-5 PLANS.md) do not show at sf0.01.",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
