"""Measure lake-log snapshot-construction cost vs commit count, with
and without a checkpoint — the scaling data behind
lakelog.write_checkpoint. Pure metadata (no Spark needed)."""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_lens_spark.operators import lakelog  # noqa: E402

BASE = "/tmp/lakelog_ckpt_probe"


def build(n_commits: int) -> str:
    d = f"{BASE}/t{n_commits}"
    shutil.rmtree(d, ignore_errors=True)
    for v in range(n_commits):
        acts = [{"add": f"f{v}", "num_records": 10,
                 "stats": {"k": [v, v + 9]}}]
        if v and v % 10 == 0:
            acts.append({"remove": f"f{v - 10}"})
        lakelog.commit(d, v, acts)
    return d


def timeit(fn, reps=5):
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"{'commits':>8} {'replay_ms':>10} {'ckpt_ms':>8} {'speedup':>8}")
    for n in (100, 1000, 5000):
        d = build(n)
        full = timeit(lambda: lakelog.snapshot_actions(d))
        lakelog.write_checkpoint(d, n - 1)
        ck = timeit(lambda: lakelog.snapshot_actions(d))
        print(f"{n:>8} {full * 1e3:>10.1f} {ck * 1e3:>8.1f} "
              f"{full / ck:>8.1f}x")
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
