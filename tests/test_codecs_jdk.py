"""Cross-validate the pure-Python PNG/JPEG codecs against the JDK's
production ImageIO coders (py4j gateway) — same harness that
validates the GIF codec in test_gif.py."""

from __future__ import annotations

import numpy as np

from etl_lens_spark.multimodal import codecs, jpeg


def _jdk_read(spark, path: str) -> np.ndarray:
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            rgb = img.getRGB(x, y)
            out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
    return out


def test_our_png_decodes_identically_in_jdk(spark, tmp_path):
    """All five scanline filters, exact pixel agreement (PNG is
    lossless — any filter/zlib slip is a hard mismatch)."""
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, size=(11, 9, 3)).astype(np.uint8)
    p = str(tmp_path / "ours.png")
    with open(p, "wb") as f:
        f.write(codecs.encode_png(arr, filters=[0, 1, 2, 3, 4] * 3)[: 10**9])
    got = _jdk_read(spark, p)
    assert (got == arr.astype(np.int64)).all()


def test_jdk_png_decodes_identically_in_ours(spark, tmp_path):
    jvm = spark._jvm
    w, h = 13, 8
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    rng = np.random.default_rng(19)
    want = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in rng.integers(0, 256, size=3))
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            want[y, x] = [r, g, b]
    p = str(tmp_path / "jdk.png")
    assert jvm.javax.imageio.ImageIO.write(img, "png", jvm.java.io.File(p))
    arr, _filters = codecs.decode_png(open(p, "rb").read())
    assert (arr[:, :, :3].astype(np.int64) == want).all()


def test_our_jpeg_gray_decodes_closely_in_jdk(spark, tmp_path):
    """JPEG is lossy and IDCT rounding differs per decoder, so the
    contract vs a foreign decoder is near-equality: the JDK must read
    our quality-100 bitstream to within ±2 of OUR decoder's output
    (legal stream + same DC prediction/Huffman interpretation)."""
    rng = np.random.default_rng(23)
    # smooth gradient + mild noise: keeps q100 quantization loss tiny
    y, x = np.mgrid[0:16, 0:24]
    arr = ((x * 5 + y * 3) % 200 + rng.integers(0, 4, size=(16, 24))).astype(
        np.uint8
    )
    data = jpeg.encode_jpeg_gray(arr, quality=100)
    ours = jpeg.decode_jpeg_gray(data).astype(np.int64)
    p = str(tmp_path / "ours.jpg")
    with open(p, "wb") as f:
        f.write(data)
    # read RAW raster samples — getRGB on TYPE_BYTE_GRAY would apply
    # a linear→sRGB color conversion and skew every value
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    raster = img.getRaster()
    got = np.array(
        [
            [raster.getSample(x, y, 0) for x in range(img.getWidth())]
            for y in range(img.getHeight())
        ],
        dtype=np.int64,
    )
    assert got.shape == ours.shape
    assert int(np.abs(got - ours).max()) <= 2


def test_our_tiff_decodes_identically_in_jdk(spark, tmp_path):
    """TIFF is lossless: the JDK's production TIFF reader must
    reproduce our multi-strip little-endian bitstream exactly."""
    rng = np.random.default_rng(29)
    arr = rng.integers(0, 256, size=(9, 13, 3)).astype(np.uint8)
    p = str(tmp_path / "ours.tiff")
    with open(p, "wb") as f:
        f.write(codecs.encode_tiff(arr, rows_per_strip=2))
    got = _jdk_read(spark, p)
    assert (got == arr.astype(np.int64)).all()


def test_jdk_tiff_decodes_identically_in_ours(spark, tmp_path):
    jvm = spark._jvm
    w, h = 12, 7
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    rng = np.random.default_rng(31)
    want = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in rng.integers(0, 256, size=3))
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            want[y, x] = [r, g, b]
    p = str(tmp_path / "jdk.tiff")
    assert jvm.javax.imageio.ImageIO.write(img, "tiff", jvm.java.io.File(p))
    arr, _n = codecs.decode_tiff(open(p, "rb").read())
    assert (arr.astype(np.int64) == want).all()
