"""Unit tests for multimodal/codecs.py — real PPM/WAV container
parsing, independent of Spark."""

from __future__ import annotations

import numpy as np
import pytest

from etl_lens_spark.multimodal import codecs


class TestPpm:
    def test_roundtrip_identity(self):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(arr)), arr)

    def test_header_comments_and_whitespace(self):
        arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        raw = b"P6\n# a comment\n3 2\n# another\n255\n" + arr.tobytes()
        assert np.array_equal(codecs.decode_ppm(raw), arr)

    def test_rejects_non_ppm(self):
        with pytest.raises(ValueError):
            codecs.decode_ppm(b"\x89PNG\r\n\x1a\n")

    def test_resize_nearest_reference(self):
        # 4x4 gradient down to 2x2: picks pixels (0,0),(0,2),(2,0),(2,2)
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4)[..., None].repeat(
            3, axis=2
        )
        small = codecs.resize_nearest(arr, 2, 2)
        assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]

    def test_resize_upscale_repeats(self):
        arr = np.array([[[1, 1, 1], [2, 2, 2]]], dtype=np.uint8)  # 1x2
        big = codecs.resize_nearest(arr, 4, 2)
        assert big[:, :, 0].tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]

    def test_mean_luma_formula(self):
        arr = np.zeros((1, 1, 3), dtype=np.uint8)
        arr[0, 0] = [255, 0, 0]
        assert codecs.mean_luma(arr) == pytest.approx(0.299 * 255)


class TestWav:
    def test_roundtrip_identity(self):
        s = (np.sin(np.arange(500) / 7.0) * 12000).astype(np.int16)
        out, rate = codecs.decode_wav(codecs.encode_wav(s, 22050))
        assert rate == 22050
        assert np.array_equal(out, s)

    def test_chunk_walk_skips_extra_chunks(self):
        s = np.array([100, -100, 3000], dtype=np.int16)
        raw = codecs.encode_wav(s, 8000)
        # splice a LIST chunk between fmt and data
        import struct

        fmt_end = 12 + 8 + 16
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = raw[:fmt_end] + extra + raw[fmt_end:]
        # fix RIFF size
        spliced = (
            spliced[:4]
            + struct.pack("<I", len(spliced) - 8)
            + spliced[8:]
        )
        out, rate = codecs.decode_wav(spliced)
        assert rate == 8000 and np.array_equal(out, s)

    def test_negative_samples_little_endian(self):
        s = np.array([-32768, 32767, -1], dtype=np.int16)
        out, _ = codecs.decode_wav(codecs.encode_wav(s))
        assert out.tolist() == [-32768, 32767, -1]

    def test_rejects_non_wav(self):
        with pytest.raises(ValueError):
            codecs.decode_wav(b"OggS" + b"\x00" * 40)


def test_bmp_roundtrip_all_paddings():
    import numpy as np

    from etl_lens_spark.multimodal.codecs import decode_bmp, encode_bmp

    # widths chosen so 3w % 4 covers padding 0..3
    for w in (4, 5, 6, 7):
        arr = (np.arange(3 * 3 * w, dtype=np.int64) % 256).astype(
            np.uint8
        ).reshape(3, w, 3)
        decoded, pad = decode_bmp(encode_bmp(arr))
        assert pad == (4 - (3 * w) % 4) % 4
        assert (decoded == arr).all()


def test_bmp_bgr_and_bottom_up_are_real():
    """Hand-built single-pixel file: a pure-red pixel must be stored
    as BGR (00 00 FF) and the first stored row must be the BOTTOM
    image row."""
    import numpy as np

    from etl_lens_spark.multimodal.codecs import decode_bmp, encode_bmp

    arr = np.zeros((2, 1, 3), dtype=np.uint8)
    arr[0, 0] = (255, 0, 0)  # top row red
    data = encode_bmp(arr)
    # pixel data starts at 54; first stored row is the BOTTOM row
    assert data[54:57] == b"\x00\x00\x00"
    # second stored row is the top row, as BGR: blue=0, green=0, red=255
    assert data[58:61] == b"\x00\x00\xff"
    decoded, _ = decode_bmp(data)
    assert (decoded == arr).all()


def test_bmp_top_down_negative_height():
    import struct

    import numpy as np

    from etl_lens_spark.multimodal.codecs import decode_bmp, encode_bmp

    arr = (np.arange(2 * 2 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(
        2, 2, 3
    )
    data = bytearray(encode_bmp(arr))
    # flip to top-down: negate height and reorder the rows
    struct.pack_into("<i", data, 22, -2)
    row = (3 * 2 + 3) // 4 * 4
    px = data[54:]
    data[54:] = bytes(px[row:] + px[:row])
    decoded, _ = decode_bmp(bytes(data))
    assert (decoded == arr).all()


def test_bmp_rejects_truncated_and_foreign():
    import pytest

    import numpy as np

    from etl_lens_spark.multimodal.codecs import decode_bmp, encode_bmp

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    data = encode_bmp(arr)
    with pytest.raises(ValueError):
        decode_bmp(data[:-3])
    with pytest.raises(ValueError):
        decode_bmp(b"PNG........")


def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from etl_lens_spark.multimodal.codecs import decode_png, encode_png

    rng = np.random.default_rng(42)
    for ch in (3, 4):
        for h, w in [(1, 1), (2, 2), (7, 5), (16, 33)]:
            arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            dec, filters = decode_png(encode_png(arr))
            assert dec.shape == arr.shape
            assert (dec == arr).all()
            assert filters == [y % 5 for y in range(h)]
    arr = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    for f in range(5):
        dec, seen = decode_png(encode_png(arr, filters=[f] * 10))
        assert (dec == arr).all() and seen == [f] * 10


def test_png_crc_integrity_and_rejections():
    import struct
    import zlib

    import numpy as np
    import pytest

    from etl_lens_spark.multimodal.codecs import decode_png, encode_png

    arr = np.zeros((3, 3, 3), dtype=np.uint8)
    data = bytearray(encode_png(arr))
    data[40] ^= 0xFF  # corrupt one IDAT byte -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + b"\x00" * 40)
    # interlaced IHDR rejected honestly
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="interlacing"):
        decode_png(sig + chunk)


def test_png_hand_built_vector():
    """Decode a PNG assembled by hand from the spec (independent of
    our encoder): 2x1 RGB, one Up-filtered row over the zero row —
    recon must equal the raw filter payload."""
    import struct
    import zlib

    from etl_lens_spark.multimodal.codecs import decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    scan = bytes([2]) + bytes([10, 20, 30, 40, 50, 60])  # Up over zeros
    data = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(scan)
    ) + chunk(b"IEND", b"")
    arr, filters = decode_png(data)
    assert filters == [2]
    assert arr.shape == (1, 2, 3)
    assert arr.reshape(-1).tolist() == [10, 20, 30, 40, 50, 60]


def test_jpeg_constant_block_roundtrip_exact():
    """DC-only content at quality 100 roundtrips bit-exactly — the
    property the oracle pipeline pins."""
    import numpy as np

    from etl_lens_spark.multimodal.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (16, 24), (8, 40), (24, 24)]:
        bvals = rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
        img = np.kron(bvals, np.ones((8, 8), dtype=np.uint8))
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert dec.shape == img.shape and (dec == img).all()


def test_jpeg_general_content_and_edges():
    import numpy as np
    import pytest

    from etl_lens_spark.multimodal.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(11)
    # worst-case content (iid noise) stays within +-1 at q100
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
    # non-multiple-of-8 dims crop back exactly
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
    # byte-stuffing path: an all-white image maximizes 0xFF runs
    img = np.full((16, 16), 255, dtype=np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(img)) == img).all()
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"not a jpeg")
    # progressive / multi-component rejected honestly
    with pytest.raises(ValueError):
        data = bytearray(encode_jpeg_gray(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        decode_jpeg_gray(bytes(data))


def test_mp4_box_walk_and_validation():
    import pytest

    from etl_lens_spark.multimodal.codecs import (
        encode_mp4_skeleton,
        parse_mp4_boxes,
    )

    data = encode_mp4_skeleton(1000, 54321, [54321, 50000])
    info = parse_mp4_boxes(data)
    assert info["top_boxes"] == ["ftyp", "moov", "mdat"]
    assert (info["timescale"], info["duration"]) == (1000, 54321)
    assert info["tracks"] == [(1, 54321), (2, 50000)]
    with pytest.raises(ValueError):
        parse_mp4_boxes(data[:20])  # truncated box
    with pytest.raises(ValueError, match="mvhd"):
        parse_mp4_boxes(data[: len(data) - len(data) + 24])  # no moov


def test_jpeg_color_roundtrips():
    import numpy as np

    from etl_lens_spark.multimodal.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(3)
    # neutral-gray constant blocks: bit-exact through the color path
    bvals = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    gray = np.kron(bvals, np.ones((8, 8), dtype=np.uint8))
    img = np.stack([gray] * 3, axis=-1)
    assert (decode_jpeg_color(encode_jpeg_color(img)) == img).all()
    # colorful content: +-2 (YCbCr transform rounding), exact dims
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    dec = decode_jpeg_color(encode_jpeg_color(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    dec = decode_jpeg_color(encode_jpeg_color(img))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_ulaw_bijectivity_and_quantization():
    import numpy as np

    from etl_lens_spark.multimodal.codecs import ulaw_decode, ulaw_encode

    codes = np.arange(256, dtype=np.uint8)
    re = ulaw_encode(ulaw_decode(codes))
    bad = [c for c in range(256) if re[c] != c]
    assert bad == [0x7F]  # negative zero, unreachable from int16
    rng = np.random.default_rng(5)
    x = rng.integers(-32124, 32125, 20000).astype(np.int16)
    err = np.abs(ulaw_decode(ulaw_encode(x)).astype(int) - x.astype(int))
    assert err.max() <= 512  # top-segment half-step


def test_mp4_frame_index_expansion():
    from etl_lens_spark.multimodal.codecs import (
        encode_mp4_with_samples,
        mp4_frame_index,
    )

    data = encode_mp4_with_samples(
        30000, [1001] * 5 + [2002] * 3, [100, 200, 150, 120, 80, 60, 90, 110]
    )
    idx = mp4_frame_index(data)
    assert len(idx) == 8
    assert idx[0] == (0, 0, 100)
    assert idx[5] == (5, 5005, 60)      # still in the 1001 run
    assert idx[7] == (7, 9009, 110)     # after the 2002 run starts


def test_jpeg_420_roundtrips():
    import numpy as np

    from etl_lens_spark.multimodal.jpeg import (
        decode_jpeg_420,
        encode_jpeg_420,
    )

    rng = np.random.default_rng(9)
    bvals = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    gray = np.kron(bvals, np.ones((16, 16), dtype=np.uint8))
    img = np.stack([gray] * 3, axis=-1)
    assert (decode_jpeg_420(encode_jpeg_420(img)) == img).all()
    # smooth color content: chroma subsample keeps error tight
    x = np.arange(48)
    sm = ((x[None, :] + 2 * np.arange(32)[:, None]) % 200).astype(np.uint8)
    img = np.stack([sm, sm // 2 + 30, 255 - sm], axis=-1)
    dec = decode_jpeg_420(encode_jpeg_420(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    # odd dims crop back
    img = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    assert decode_jpeg_420(encode_jpeg_420(img)).shape == (19, 27, 3)


def test_avi_mjpeg_mux_demux_roundtrip():
    from etl_lens_spark.multimodal.codecs import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from etl_lens_spark.multimodal.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(11)
    frames = []
    imgs = []
    for f in range(4):
        bvals = rng.integers(0, 256, (2, 3), dtype=np.uint8)
        img = np.kron(bvals, np.ones((8, 8), dtype=np.uint8))
        imgs.append(img)
        frames.append(encode_jpeg_gray(img, quality=100))
    avi = encode_avi_mjpeg(frames, 24, 16, fps=12)
    info = decode_avi_mjpeg(avi)
    assert (info["width"], info["height"]) == (24, 16)
    assert info["fps"] == 12 and info["n_frames"] == 4
    # demux must return the exact jpeg bytes, frame decode bit-exact
    # for constant-block content at q100
    for img, orig, got in zip(imgs, frames, info["frames"]):
        assert got == orig
        assert (decode_jpeg_gray(got) == img).all()


def test_avi_mjpeg_rejects_corrupt_index_and_count():
    import struct

    from etl_lens_spark.multimodal.codecs import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from etl_lens_spark.multimodal.jpeg import encode_jpeg_gray

    img = np.full((8, 8), 77, dtype=np.uint8)
    frames = [encode_jpeg_gray(img, quality=100) for _ in range(2)]
    avi = bytearray(encode_avi_mjpeg(frames, 8, 8, fps=5))
    # corrupt the first idx1 offset: demux must fail loudly, not
    # silently return frames the index disagrees with
    i = bytes(avi).rfind(b"idx1")
    (off,) = struct.unpack_from("<I", avi, i + 8 + 8)
    struct.pack_into("<I", avi, i + 8 + 8, off + 2)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(avi))
    # avih frame-count vs movi chunk-count mismatch also fails
    avi2 = bytearray(encode_avi_mjpeg(frames, 8, 8, fps=5))
    j = bytes(avi2).find(b"avih")
    struct.pack_into("<I", avi2, j + 8 + 16, 3)  # dwTotalFrames
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(avi2))
