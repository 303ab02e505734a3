"""Audio-fingerprint contract: landmark determinism, offline match
sanity, and the full Spark retrieval query identifying every planted
snippet at the planted offset."""

from __future__ import annotations

import numpy as np

from etl_lens_spark.multimodal.audiofp import (
    HOP,
    constellation_hashes,
    fingerprint,
    spectrogram_peaks,
    synth_track,
)


def test_fingerprint_deterministic_and_shaped():
    a = fingerprint(synth_track(11))
    b = fingerprint(synth_track(11))
    assert a == b and len(a) > 100
    # packed hash decomposes into valid (f1, f2, dt)
    for h, t in a[:50]:
        f1, f2, dt = h >> 18, (h >> 9) & 0x1FF, h & 0x1FF
        assert 0 < f1 <= 256 and 0 < f2 <= 256 and 0 < dt <= 24
        assert t >= 0


def test_peaks_are_local_maxima():
    x = synth_track(4)
    peaks = spectrogram_peaks(x)
    assert peaks
    frames = {}
    for t, b in peaks:
        frames.setdefault(t, []).append(b)
    assert all(len(bs) <= 2 for bs in frames.values())


def test_empty_and_short_inputs():
    assert spectrogram_peaks(np.zeros(10, dtype=np.int16)) == []
    assert constellation_hashes([]) == []
    assert fingerprint(np.zeros(100, dtype=np.int16)) == []


def test_spark_retrieval_identifies_every_snippet(spark, sf_dir):
    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    rows = REGISTRY["mm_audio_fingerprint_match"].fn(spark, sf_dir).collect()
    assert rows, "no query snippets in fixture"
    for r in rows:
        assert r["is_self_match"] == 1, r
        # planted slice starts at sample 3000 → frame 3000/HOP;
        # noise can move the histogram argmax a couple frames
        assert abs(r["offset_frames"] - 3000 // HOP) <= 3, r
        assert r["votes"] >= 50, r
