"""MMR selection contract: numpy-reference parity and the diversity
property (MMR's picks are less mutually similar than pure top-k by
relevance)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np

from etl_lens_spark.queries import REGISTRY, _load

_load()


def _ref_vectors(sf_dir):
    rows = duckdb.sql(
        f"""SELECT doc_id, text FROM '{sf_dir}/documents.parquet'
            ORDER BY n_chars DESC, doc_id LIMIT 60"""
    ).fetchall()
    ids, X = [], []
    for d, t in rows:
        v = np.zeros(32)
        for tok in str(t).split(" "):
            h = int(hashlib.md5(b"feat" + tok.encode()).hexdigest()[:8], 16)
            s = int(hashlib.md5(b"sgn" + tok.encode()).hexdigest()[:8], 16)
            v[h % 32] += 1 if s % 2 == 0 else -1
        n = np.linalg.norm(v)
        ids.append(d)
        X.append(v / n if n > 0 else v)
    return ids, np.array(X)


def _ref_mmr(ids, X, lam=0.7, k=10):
    q = X.mean(axis=0)
    q = q / np.linalg.norm(q)
    rel = X @ q
    picked = []
    for _ in range(k):
        red = (
            (X @ X[picked].T).max(axis=1) if picked else np.zeros(len(ids))
        )
        score = lam * rel - (1 - lam) * red
        score[picked] = -np.inf
        best = min(
            range(len(ids)),
            key=lambda i: (-round(float(score[i]), 12), ids[i]),
        )
        picked.append(best)
    return [ids[i] for i in picked], rel, X


def test_mmr_matches_reference_and_diversifies(spark, sf_dir):
    rows = (
        REGISTRY["docs_mmr_diverse_sample"].fn(spark, sf_dir).collect()
    )
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["step"])]
    ids, X = _ref_vectors(sf_dir)
    want, rel, X = _ref_mmr(ids, X)
    assert got == want
    # diversity property: MMR's mean pairwise similarity < top-k by
    # pure relevance
    idx = {d: i for i, d in enumerate(ids)}
    sel = [idx[d] for d in got]
    topk = np.argsort(-rel)[: len(sel)]

    def mean_pair_sim(ix):
        S = X[ix] @ X[ix].T
        n = len(ix)
        return (S.sum() - n) / (n * (n - 1))

    assert mean_pair_sim(sel) < mean_pair_sim(list(topk))
    # first pick is the pure-relevance argmax (red == 0 at step 0)
    assert rows[0]["redundancy"] == 0.0
