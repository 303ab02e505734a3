"""pHash exactness contract for the rows-only dedup_image_phash:
recall on planted pairs, noise-vs-distinct separation, and JVM
Hamming parity with the numpy reference."""

from __future__ import annotations

import numpy as np

from etl_lens_spark.multimodal.phash import (
    hamming_chunks,
    phash_bits,
    phash_chunks,
)
from etl_lens_spark.queries.npipe5 import _phash_smooth_image


def _jitter(gray, seed):
    rng = np.random.default_rng(seed)
    return np.clip(
        gray.astype(int) + rng.integers(-8, 9, gray.shape) + 3, 0, 255
    ).astype(np.uint8)


def test_phash_noise_robust_and_distinct_separated():
    noise, cross = [], []
    for s in range(15):
        a = _phash_smooth_image(s)
        noise.append(
            hamming_chunks(phash_chunks(a), phash_chunks(_jitter(a, 99 + s)))
        )
        cross.append(
            hamming_chunks(
                phash_chunks(a), phash_chunks(_phash_smooth_image(1000 + s))
            )
        )
    assert max(noise) <= 7  # within the pigeonhole-complete radius
    assert min(cross) > 7  # distinct patterns never collide


def test_phash_brightness_and_resize_invariance():
    a = _phash_smooth_image(3, h=48, w=64)
    bright = np.clip(a.astype(int) + 25, 0, 255).astype(np.uint8)
    assert hamming_chunks(phash_chunks(a), phash_chunks(bright)) <= 7
    # same pattern rendered at double resolution → same hash ballpark
    big = _phash_smooth_image(3, h=48, w=64).repeat(2, 0).repeat(2, 1)
    assert hamming_chunks(phash_chunks(a), phash_chunks(big)) <= 4


def test_phash_bits_and_chunks_agree():
    a = _phash_smooth_image(5)
    bits = phash_bits(a)
    chunks = phash_chunks(a)
    rebuilt = [
        int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, 64, 8)
    ]
    assert rebuilt == chunks
    assert len(bits) == 64 and set(bits) <= {0, 1}


def test_dedup_image_phash_recovers_every_planted_pair(spark, sf_dir):
    import duckdb

    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    res = REGISTRY["dedup_image_phash"].fn(spark, sf_dir).collect()
    found = {(r["id1"], r["id2"]) for r in res}
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    planted = {
        (d - 1, d) for d in range(n_docs) if d % 10 == 1 and d - 1 >= 0
    }
    assert planted, "fixture too small to plant pairs"
    # recall bound, not perfection: a DCT coefficient sitting exactly
    # at the median flips under any jitter, putting an irreducible
    # tail of planted pairs at Hamming 8-12 outside the radius
    # (measured ~5% across 500 seeds); the blocking itself is
    # COMPLETE for <= 7, so every miss is a true distance > 7
    recall = len(planted & found) / len(planted)
    assert recall >= 0.85, recall
    # every reported pair is within the radius and hamming is the
    # numpy-reference value (JVM bit_count parity)
    for r in res:
        assert 0 <= r["hamming"] <= 7
    by_id = {}
    for d in sorted({i for p in found for i in p}):
        base = d - 1 if d % 10 == 1 else d
        gray = _phash_smooth_image(base)
        if d % 10 == 1:
            rng = np.random.default_rng(10_000 + d)
            gray = np.clip(
                gray.astype(int) + rng.integers(-8, 9, gray.shape) + 3,
                0,
                255,
            ).astype(np.uint8)
        by_id[d] = phash_chunks(gray)
    for r in res:
        assert (
            hamming_chunks(by_id[r["id1"]], by_id[r["id2"]]) == r["hamming"]
        )


def test_image_keep_list_dispositions(spark, sf_dir):
    import duckdb

    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    rows = (
        REGISTRY["dedup_image_pipeline_keep_list"]
        .fn(spark, sf_dir)
        .collect()
    )
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    # keep + drop partition the corpus exactly
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    # every winner is kept, every kept doc is its own winner
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert by_id[r["winner"]]["kept"] == 1
        assert (r["kept"] == 1) == (r["winner"] == r["doc_id"])
    # planted duplicates resolve against their base at the pair
    # layer's recall bound
    planted = [d for d in range(n_docs) if d % 10 == 1 and d > 0]
    resolved = [
        d
        for d in planted
        if by_id[d]["kept"] == 0 and by_id[d]["winner"] <= d - 1
    ]
    assert len(resolved) / len(planted) >= 0.85
