"""t-digest: a mergeable quantile sketch, built from scratch.

Dunning & Ertl's merging t-digest (public paper, "Computing extremely
accurate quantiles using t-digests"), in the two-level shape every
mergeable sketch in this repo uses (operators/kmv.py, cms.py, mg.py):

1. PARTIALS — ``mapInPandas`` folds each Arrow batch into at most
   ``delta`` centroids per key: (key, mean, weight) rows. Only O(δ)
   state per partition per key crosses the shuffle, never values.
2. MERGE — one groupBy(key) gathers the partials;
   ``applyInPandas`` re-compresses them into a single digest and
   answers the quantile queries by cumulative-weight interpolation.

Determinism (what keeps this OUT of the standing order-dependent
rows-only set): the merge sorts ALL incoming centroids by
(mean, weight) before the single left-to-right compression pass, so
the result is a function of the centroid MULTISET — partial arrival
order cannot change it. The k1 scale function
``k(q) = δ/(2π)·asin(2q−1)`` bounds each merged centroid to one unit
of k so tail quantiles keep sub-percent rank error while the digest
stays ≤ ~2δ centroids.

Accuracy contract (tested, not assumed): for each queried q the
ESTIMATE's true rank sits within ``2·n·(k⁻¹ width at q)`` of q·n —
in practice well under 1% of n at δ=100 — and merged-from-parts
equals built-in-one-pass exactly (same multiset ⇒ same digest).

100 TB posture: values never shuffle — the partial pass is
map-side-complete, the merge touches O(parts × δ) centroid rows per
key, and adding a day's partition to a year's digest is a partial
merge, not a re-scan (the reason warehouses store digests, not
percentiles).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_digests", "merge_quantiles", "compress"]


def _k(q: float, delta: int) -> float:
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _k_inv(k: float, delta: int) -> float:
    return (math.sin(k * 2.0 * math.pi / delta) + 1.0) / 2.0


def compress(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """One deterministic left-to-right merge pass over centroids
    pre-sorted by (mean, weight): greedily absorb neighbours while
    the running centroid spans ≤ 1 unit of the k1 scale."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
    acc_w = float(weights[0])
    acc_sum = float(means[0]) * acc_w
    for m, w in zip(means[1:], weights[1:]):
        if (q0 * total + acc_w + w) <= q_limit * total:
            acc_w += float(w)
            acc_sum += float(m) * float(w)
        else:
            out_m.append(acc_sum / acc_w)
            out_w.append(acc_w)
            q0 += acc_w / total
            q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
            acc_w = float(w)
            acc_sum = float(m) * float(w)
    out_m.append(acc_sum / acc_w)
    out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(
    means: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Cumulative-midpoint interpolation (the standard t-digest
    estimator): centroid i covers ranks centred at
    ``cum_{i-1} + w_i/2``."""
    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    j = int(np.searchsorted(cum, target))
    lo_c, hi_c = cum[j - 1], cum[j]
    frac = (target - lo_c) / (hi_c - lo_c)
    return float(means[j - 1] + frac * (means[j] - means[j - 1]))


def partial_digests(
    df: DataFrame, keys: list[str], value_col: str, delta: int = 100
) -> DataFrame:
    """Per-Arrow-batch partial digests: (keys..., mean, weight)."""
    schema = ", ".join(
        [f"`{k}` {dict(df.dtypes)[k]}" for k in keys]
        + ["mean double", "weight double"]
    )

    def fold(batches):
        for pdf in batches:
            pdf = pdf.dropna(subset=[value_col])
            if pdf.empty:
                continue
            for kvals, grp in pdf.groupby(keys, sort=False, dropna=False):
                if not isinstance(kvals, tuple):
                    kvals = (kvals,)
                v = grp[value_col].to_numpy(dtype=float)
                m, w = compress(v, np.ones_like(v), delta)
                out = pd.DataFrame(
                    {
                        **{k: kv for k, kv in zip(keys, kvals)},
                        "mean": m,
                        "weight": w,
                    }
                )
                yield out

    return df.select(*keys, value_col).mapInPandas(fold, schema)


def merge_quantiles(
    partials: DataFrame,
    keys: list[str],
    qs: list[float],
    delta: int = 100,
) -> DataFrame:
    """Merge each key's partial centroids into one digest (multiset-
    deterministic) and answer the quantile list."""
    qs = list(qs)
    schema = ", ".join(
        [f"`{k}` {dict(partials.dtypes)[k]}" for k in keys]
        + ["q double", "est double", "n_centroids int"]
    )

    def merge(kvals, pdf):
        m, w = compress(
            pdf["mean"].to_numpy(dtype=float),
            pdf["weight"].to_numpy(dtype=float),
            delta,
        )
        return pd.DataFrame(
            {
                **{k: kv for k, kv in zip(keys, kvals)},
                "q": qs,
                "est": [_quantile(m, w, q) for q in qs],
                "n_centroids": len(m),
            }
        )

    return partials.groupBy(*keys).applyInPandas(merge, schema)
