"""Full-registry partition-stability sweep (round-5 hardening).

The round-4 verdict caught ts_seasonal_strength flaking with partition
count: a naive variance over large-magnitude sums made the answer
depend on Spark's partition-order float summation. The CI property
test covers the quadratic-SUM stats tranche; THIS tool sweeps the
ENTIRE registry: every declared query is built twice with the table
loader patched to ``repartition(1)`` (sequential aggregation order)
vs ``repartition(13)`` (shuffled merge order) and the canonicalized
6-decimal outputs are hash-compared Spark-vs-Spark (no DuckDB — this
probes ORDER sensitivity, not cross-engine parity).

``python tools/permutation_probe.py [query ...]``  (default: all)

Output: one line per query (STABLE/UNSTABLE/ERROR) + a summary.
UNSTABLE rows-only queries may be by-design (sampling/sketch recall
paths); UNSTABLE oracle-backed queries are latent CI flakes — fix or
re-contract them.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
PARTS = (1, 13)


def canon_hash(df) -> str:
    cols = df.columns
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{round(v, 6):.6f}"
        return str(v)

    rows = sorted("|".join(cv(r[i]) for i in idx) for r in df.collect())
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return f"{len(rows)}:{h.hexdigest()}"


def main() -> int:
    from etl_lens_spark import get_spark
    import etl_lens_spark.sources.tables as tables
    from etl_lens_spark.queries import REGISTRY, all_queries

    all_queries()
    names = sys.argv[1:] or sorted(REGISTRY)
    spark = get_spark(app_name="permutation-probe")
    spark.sparkContext.setLogLevel("ERROR")

    orig = tables.load_table
    mods = [
        m
        for m in list(sys.modules.values())
        if m is not None and getattr(m, "load_table", None) is orig
    ]

    def set_parts(n):
        def perturbed(spark_, d, t, _n=n):
            return orig(spark_, d, t).repartition(_n)

        for m in mods:
            m.load_table = perturbed

    unstable, errors = [], []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        hs = []
        try:
            for n in PARTS:
                set_parts(n)
                try:
                    hs.append(canon_hash(spec.fn(spark, SF_DIR)))
                finally:
                    for m in mods:
                        m.load_table = orig
        except Exception as e:  # noqa: BLE001
            errors.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
            continue
        dt = time.time() - t0
        kind = "oracle" if spec.oracle else "rows-only"
        if hs[0] != hs[1]:
            unstable.append(name)
            print(f"UNSTABLE {name} [{kind}] {hs[0]} != {hs[1]} ({dt:.1f}s)",
                  flush=True)
        else:
            print(f"STABLE {name} ({dt:.1f}s)", flush=True)

    print(
        f"\n{len(names) - len(unstable) - len(errors)} stable, "
        f"{len(unstable)} unstable, {len(errors)} error"
    )
    if unstable:
        print("unstable:", " ".join(unstable))
    return 1 if unstable or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
