"""Interleaved A/B probe for bench-contradicted queries (round-12
verdict item 1).

Runs ONE process = one "rep": warm-up, the pinned calibration anchor
(3 runs, min), then each named query twice through the noop sink
(min). The caller alternates this process between two checkouts
(A = HEAD, B = the pre-optimization commit) so host drift affects
both arms equally; anchor-pairing makes residual drift visible.

Usage:
    python tools/ab_probe.py <label> <query> [<query> ...]

Prints one JSON line: {"label": ..., "cal": sec, "queries": {name:
[run1, run2]}}.  Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _calibration_df
    from etl_lens_spark import get_spark
    from etl_lens_spark.queries import BENCH_SETUP, headline_queries

    spark = get_spark(app_name="ab-probe")

    def run_full(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    specs = headline_queries()
    # warm-up: first probed query once (JVM + codegen warm), as bench.py
    first = specs[names[0]]
    prep0 = BENCH_SETUP.get(names[0])
    run_full(prep0(spark, sf_dir)() if prep0 else first.fn(spark, sf_dir))

    cal_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_full(_calibration_df(spark))
        cal_runs.append(round(time.perf_counter() - t0, 3))

    out: dict[str, list[float]] = {}
    for name in names:
        spec = specs[name]
        prepare = BENCH_SETUP.get(name)
        runs = []
        for _ in range(2):
            if prepare is not None:
                thunk = prepare(spark, sf_dir)
                t0 = time.perf_counter()
                run_full(thunk())
            else:
                t0 = time.perf_counter()
                run_full(spec.fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs

    print(json.dumps({"label": label, "cal": min(cal_runs),
                      "cal_runs": cal_runs, "queries": out}))


if __name__ == "__main__":
    main()
