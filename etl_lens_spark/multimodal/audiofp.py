"""Audio fingerprinting: spectral-peak constellation hashes.

The audio-retrieval member of the multimodal family (images:
pHash; text: minhash/winnow): a track is reduced to a sparse
constellation of spectrogram peaks, peaks are paired into compact
(f1, f2, Δt) hashes (the landmark scheme of Wang 2003, "An
Industrial-Strength Audio Search Algorithm"), and matching a snippet
against a corpus is a HASH EQUI-JOIN plus an offset-histogram vote —
which is exactly the shape that scales: fingerprints shuffle as
(hash, track, t) longs, the join is blocked by hash value, and the
vote is one groupBy((query, track, Δoffset)) count with map-side
combine. No similarity scan ever touches raw audio.

Pure numpy — unit-testable off-Spark, executed inside Arrow batches.
"""

from __future__ import annotations

import numpy as np

N_FFT = 512
HOP = 128
PEAKS_PER_FRAME = 2
FAN_OUT = 5
PAIR_WINDOW = 24  # frames ahead a peak may pair into


def spectrogram_peaks(samples: np.ndarray) -> list[tuple[int, int]]:
    """Hann-windowed |STFT| → per-frame top-K bins (local maxima
    along frequency, deterministic lowest-bin tie-break). Returns
    [(frame, bin), ...] in scan order."""
    x = samples.astype(np.float64)
    if len(x) < N_FFT:
        return []
    win = np.hanning(N_FFT)
    frames = 1 + (len(x) - N_FFT) // HOP
    peaks: list[tuple[int, int]] = []
    for t in range(frames):
        seg = x[t * HOP : t * HOP + N_FFT] * win
        mag = np.abs(np.fft.rfft(seg))
        # local maxima along frequency (strictly greater than both
        # neighbours kills plateau double-counting deterministically)
        interior = mag[1:-1]
        is_peak = (interior > mag[:-2]) & (interior > mag[2:])
        bins = np.nonzero(is_peak)[0] + 1
        if len(bins) == 0:
            continue
        order = np.argsort(-mag[bins], kind="stable")
        for b in bins[order[:PEAKS_PER_FRAME]]:
            peaks.append((t, int(b)))
    return peaks


def constellation_hashes(
    peaks: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Pair each anchor peak with up to FAN_OUT later peaks within
    PAIR_WINDOW frames; hash = (f1 << 18) | (f2 << 9) | Δt packed in
    one long. Returns [(hash, t_anchor), ...]."""
    out: list[tuple[int, int]] = []
    n = len(peaks)
    for i in range(n):
        t1, f1 = peaks[i]
        paired = 0
        for j in range(i + 1, n):
            t2, f2 = peaks[j]
            dt = t2 - t1
            if dt <= 0:
                continue
            if dt > PAIR_WINDOW:
                break
            out.append(((f1 << 18) | (f2 << 9) | dt, t1))
            paired += 1
            if paired >= FAN_OUT:
                break
    return out


def fingerprint(samples: np.ndarray) -> list[tuple[int, int]]:
    """samples → [(hash, t_anchor), ...]."""
    return constellation_hashes(spectrogram_peaks(samples))


def synth_track(doc_id: int, sr: int = 8000, seconds: float = 1.5):
    """Deterministic synthetic 'song': a few doc-seeded sinusoids
    whose frequencies STEP twice over the clip (chord changes), so
    the spectrogram has time structure for landmarks to latch onto.
    int16 mono, like the WAV fixtures."""
    rng = np.random.default_rng(doc_id)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for seg in range(3):
        lo, hi = seg * n // 3, (seg + 1) * n // 3
        for _ in range(3):
            f = rng.uniform(200, 3200)
            a = rng.uniform(0.2, 1.0)
            ph = rng.uniform(0, 2 * np.pi)
            x[lo:hi] += a * np.sin(2 * np.pi * f * t[lo:hi] + ph)
    x = x / np.max(np.abs(x)) * 0.8
    return (x * 32767).astype(np.int16)
