"""Perceptual image hashing (pHash) + Hamming near-dup blocking.

The image member of the near-dup family: text gets minhash/simhash,
embeddings get LSH — images get a 64-bit DCT perceptual hash that is
stable under small pixel noise, brightness jitter, and re-encoding,
so visually-identical images land within a few Hamming bits.

Algorithm (the standard pHash construction): grayscale → 32 × 32
block-mean downsample → 2-D DCT-II → keep the 8 × 8 low-frequency
corner → threshold each coefficient against the median of the 63
non-DC coefficients → 64 bits.

Distribution: the hash is computed per row inside Arrow batches
(pure numpy, no Spark dependency here); candidate generation reuses
the simhash pigeonhole — the 64 bits split into 8 byte-chunks, and
any pair within Hamming distance ≤ 7 must share at least one exact
chunk, so the only shuffle is an equi-join on (chunk_id, chunk_val).
Hamming itself is JVM-side: sum of bit_count(a XOR b) over the 8
chunk values — signatures travel as 8 small ints, never bit arrays.
"""

from __future__ import annotations

import numpy as np

_N = 32
_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (same construction as jpeg.py's 8×8,
    generalized)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos((2 * i + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT32 = _dct_matrix(_N)


def phash_bits(gray: np.ndarray) -> np.ndarray:
    """64-bit pHash of a 2-D grayscale array (any size), as a (64,)
    uint8 0/1 vector in row-major order of the 8 × 8 DCT corner."""
    if gray.ndim != 2:
        raise ValueError("phash_bits expects a 2-D grayscale array")
    h, w = gray.shape
    # block-mean resample to 32 × 32 (area averaging — the smoothing
    # is what buys noise robustness)
    ys = (np.arange(_N + 1) * h) // _N
    xs = (np.arange(_N + 1) * w) // _N
    small = np.empty((_N, _N), dtype=np.float64)
    g = gray.astype(np.float64)
    for r in range(_N):
        rows = g[ys[r] : max(ys[r + 1], ys[r] + 1)]
        for c in range(_N):
            small[r, c] = rows[:, xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:_K, :_K].ravel()
    med = np.median(block[1:])  # exclude DC from the threshold
    return (block > med).astype(np.uint8)


def phash_chunks(gray: np.ndarray) -> list[int]:
    """The 64 bits packed into 8 byte-values (chunk 0 = bits 0-7,
    MSB-first within a chunk) — the wire format for blocking and
    XOR/bit_count Hamming."""
    bits = phash_bits(gray)
    return [
        int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, 64, 8)
    ]


def hamming_chunks(a: list[int], b: list[int]) -> int:
    """Reference Hamming distance over chunk lists (test oracle for
    the JVM bit_count expression)."""
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))
