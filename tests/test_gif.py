"""GIF/LZW codec: round-trip fuzz + cross-validation against the
JDK's production ImageIO GIF coder (via the py4j gateway)."""

from __future__ import annotations

import numpy as np

from etl_lens_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n_pal = int(rng.choice([2, 4, 16, 256]))
        size = int(rng.integers(1, 20000))
        idx = rng.integers(0, n_pal, size=size).astype(np.int64)
        mcs = max(2, (n_pal - 1).bit_length())
        assert lzw_decode(lzw_encode(idx, mcs), mcs) == list(idx)


def test_lzw_width_boundary_at_stream_end():
    """The final dictionary insertion can land exactly on a power of
    two, where the decoder widens before reading EOI — the encoder
    mirrors that growth (the bug this test pins)."""
    # 256-symbol alphabet: insertions start at 258; a stream of n
    # distinct-pair mismatches ends at next_code = 258 + n. Drive
    # next_code across 512 and 1024 exactly.
    for n in (253, 254, 255, 765, 766, 767):
        idx = np.arange(n) % 256
        assert lzw_decode(lzw_encode(idx, 8), 8) == list(idx)


def test_lzw_dictionary_reset():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, size=30000).astype(np.int64)  # >4096 codes
    assert lzw_decode(lzw_encode(idx, 8), 8) == list(idx)


def test_gif_container_roundtrip():
    rng = np.random.default_rng(9)
    for w, h, n_pal in [(3, 3, 4), (15, 13, 16), (64, 48, 256)]:
        pal = rng.integers(0, 256, size=(n_pal, 3)).astype(np.uint8)
        idx = rng.integers(0, n_pal, size=w * h)
        i2, p2, w2, h2 = decode_gif(encode_gif(idx, pal, w, h))
        assert (w2, h2) == (w, h)
        assert (p2 == pal).all() and (i2 == idx).all()


def _jdk_read_pixels(spark, path: str, w: int, h: int) -> np.ndarray:
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    assert img.getWidth() == w and img.getHeight() == h
    out = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            rgb = img.getRGB(x, y)
            out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
    return out


def test_our_gif_decodes_identically_in_jdk(spark, tmp_path):
    """Encoder validation: a production decoder (javax.imageio) reads
    our bitstream to the exact pixels we encoded."""
    rng = np.random.default_rng(21)
    for w, h, n_pal in [(9, 7, 16), (33, 17, 256)]:
        pal = rng.integers(0, 256, size=(n_pal, 3)).astype(np.uint8)
        idx = rng.integers(0, n_pal, size=w * h)
        p = str(tmp_path / f"ours_{w}x{h}.gif")
        with open(p, "wb") as f:
            f.write(encode_gif(idx, pal, w, h))
        got = _jdk_read_pixels(spark, p, w, h)
        want = pal[idx].reshape(h, w, 3).astype(np.int64)
        assert (got == want).all()


def test_jdk_gif_decodes_identically_in_ours(spark, tmp_path):
    """Decoder validation: we read a production encoder's file
    (javax.imageio writes an indexed GIF) to the exact pixels."""
    jvm = spark._jvm
    w, h = 21, 11
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    rng = np.random.default_rng(33)
    # few distinct colors so the GIF writer emits a small palette
    colors = [int(c) for c in rng.integers(0, 1 << 24, size=8)]
    want = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            c = colors[(x + 3 * y) % 8]
            img.setRGB(x, y, c)
            want[y, x] = [(c >> 16) & 255, (c >> 8) & 255, c & 255]
    p = str(tmp_path / "jdk.gif")
    assert jvm.javax.imageio.ImageIO.write(img, "gif", jvm.java.io.File(p))
    idx, pal, w2, h2 = decode_gif(open(p, "rb").read())
    assert (w2, h2) == (w, h)
    got = pal[idx].astype(np.int64).reshape(h, w, 3)
    assert (got == want).all()
