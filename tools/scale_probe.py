"""Scaling probe: run the headline queries against the replicated
big scale factor (tools/make_scale.py) and print per-query runtime
with the ratio vs a provided sf0.1 baseline JSON.

``python tools/scale_probe.py [baseline_bench.json]``

Interpretation: with 10x input on the same 32 cores, linear operators
should be <=10x wall (usually far less — fixed overheads amortize);
anything >>10x is super-linear and needs a plan fix.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_lens_spark import get_spark
from etl_lens_spark.queries import headline_queries
from etl_lens_spark.sources.sinks import SCRATCH_DIR


def main() -> None:
    sf_dir = os.path.join(SCRATCH_DIR, "sfbig")
    baseline = {}
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            baseline = json.load(f).get("queries", {})
    spark = get_spark(app_name="scale-probe")
    specs = headline_queries()
    first = next(iter(specs.values()))
    first.fn(spark, sf_dir).count()

    out = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        n = spec.fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 2)
        base = baseline.get(name)
        ratio = f" x{dt / base:.1f} vs sf0.1" if base else ""
        out[name] = dt
        print(f"{name}: {dt}s rows={n}{ratio}", flush=True)
    print(json.dumps({"sfbig_queries": out}))


if __name__ == "__main__":
    main()
