"""QOI codec: random roundtrips, op coverage, stream structure."""

from __future__ import annotations

import numpy as np

from etl_lens_spark.multimodal import qoi


def test_roundtrip_random_images():
    rng = np.random.default_rng(7)
    for _ in range(20):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = qoi.encode_qoi(arr)
        out = qoi.decode_qoi(data)
        assert out.shape == arr.shape
        assert (out == arr).all()


def test_roundtrip_structured_patterns():
    # runs, gradients, repeats — the op-heavy shapes
    for d in range(10):
        w, h = 16 + d % 5, 8 + d % 3
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        ramp = np.where((x // 4) % 2 == 1, x % 4, 0)
        arr = np.stack(
            [
                np.broadcast_to(((x // 4) * 7 + ramp + d) % 256, (h, w)),
                np.broadcast_to(((x // 4) * 3 + y) % 256, (h, w)),
                np.broadcast_to((y + d) % 256, (h, w)),
            ],
            axis=2,
        ).astype(np.uint8)
        stripe = (x % 2 == 0)[0]
        arr[h - 1, :, 0] = np.where(stripe, 10, 50)
        arr[h - 1, :, 1] = np.where(stripe, 20, 60)
        arr[h - 1, :, 2] = np.where(stripe, 30, 70)
        assert (qoi.decode_qoi(qoi.encode_qoi(arr)) == arr).all()


def test_op_coverage_on_query_pattern():
    # the declared query's synth pattern must exercise every op kind
    # somewhere across doc ids (RUN/DIFF/LUMA/INDEX/RGB)
    seen = {k: 0 for k in ["rgb", "index", "diff", "luma", "run"]}
    for d in range(40):
        w, h = 16 + d % 5, 8 + d % 3
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        ramp = np.where((x // 4) % 2 == 1, x % 4, 0)
        arr = np.stack(
            [
                np.broadcast_to(((x // 4) * 7 + ramp + d) % 256, (h, w)),
                np.broadcast_to(((x // 4) * 3 + y) % 256, (h, w)),
                np.broadcast_to((y + d) % 256, (h, w)),
            ],
            axis=2,
        ).astype(np.uint8)
        stripe = (x % 2 == 0)[0]
        arr[h - 1, :, 0] = np.where(stripe, 10, 50)
        arr[h - 1, :, 1] = np.where(stripe, 20, 60)
        arr[h - 1, :, 2] = np.where(stripe, 30, 70)
        hist = qoi.op_histogram(qoi.encode_qoi(arr))
        for k in seen:
            seen[k] += hist[k]
    assert all(v > 0 for v in seen.values()), seen


def test_stream_structure():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    data = qoi.encode_qoi(arr)
    assert data[:4] == b"qoif"
    assert data[-8:] == b"\x00" * 7 + b"\x01"
    assert int.from_bytes(data[4:8], "big") == 4
    assert int.from_bytes(data[8:12], "big") == 4
    assert data[12] == 3 and data[13] == 0
