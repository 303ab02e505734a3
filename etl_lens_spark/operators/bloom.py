"""Bloom-filter join pruning — the classic big-join optimization
Spark applies internally as runtime row-level filtering, re-expressed
with public primitives so it can be driven explicitly (Spark's
``bloom_filter_agg`` / ``might_contain`` are not exposed to SQL).

Build side: the (small) key set reduces to its DISTINCT bloom bit
positions — ``k_hashes`` seeded xxhash64 values mod ``m_bits``. That
position table is at most ``m_bits`` rows regardless of build-side
cardinality (it IS the bloom filter, as a relation), so it always
broadcasts.

Probe side: a row survives when ALL of its k positions hit the
position table — one broadcast LEFT SEMI join per hash. False
positives pass (as in any bloom filter) and are eliminated by the
exact join that follows; false negatives are impossible, so
``bloom_prefilter`` + exact join ≡ exact join (the oracle checks
exactly this identity).

At 100 TB the win: the probe-side scan drops most rows BEFORE the
fact-fact shuffle, at the cost of broadcast-hash probes that are
cheap relative to shuffle I/O. This mirrors what AQE's runtime
filters do for shuffle joins, but as a composable operator that also
works in front of aggregations, sinks, or non-equi joins.

Reference parity: the reference's only join device is SQLite's
(unwired) query planner (SURVEY §2.2); this operator is [L]-surface
optimization infrastructure, no direct reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    build: DataFrame,
    key: str | Column,
    m_bits: int = 1 << 16,
    k_hashes: int = 2,
) -> DataFrame:
    """Distinct bloom bit positions of the build-side key set — the
    bloom filter materialized as a ≤ m_bits-row relation ``(pos)``."""
    kc = F.col(key) if isinstance(key, str) else key
    pos = [
        F.pmod(F.xxhash64(kc, F.lit(i)), F.lit(m_bits)).alias("pos")
        for i in range(k_hashes)
    ]
    frames = [build.select(p) for p in pos]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.distinct()


def bloom_prefilter(
    probe: DataFrame,
    positions: DataFrame,
    key: str | Column,
    m_bits: int = 1 << 16,
    k_hashes: int = 2,
) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the build set (all
    k hashed positions present). No false negatives; false positives
    are bounded by the standard bloom rate for (m_bits, k_hashes,
    build cardinality)."""
    kc = F.col(key) if isinstance(key, str) else key
    out = probe
    for i in range(k_hashes):
        out = out.join(
            F.broadcast(positions),
            F.pmod(F.xxhash64(kc, F.lit(i)), F.lit(m_bits))
            == positions["pos"],
            "left_semi",
        )
    return out
