"""QOI ("Quite OK Image") codec — pure-Python, from the public spec
(qoiformat.org, spec version 1.0). A real compressed raster format
whose entire toolchain fits in arithmetic: byte-wise ops (RUN /
INDEX / DIFF / LUMA / RGB) over a rolling 64-slot color index with
hash (3r+5g+7b+11a) % 64 — no external imaging library needed, which
is exactly why it can live on the REAL side of the multimodal seam
next to PPM/BMP/GIF/PNG while JPEG-for-arbitrary-files stays stubbed.

Reference parity: the reference renders decoded frames in its UI
(D3D texture upload paths); this codec is the decode stage a Spark
pipeline runs BEFORE feature extraction, as genuine container bytes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (3 * r + 5 * g + 7 * b + 11 * a) % 64


def encode_qoi(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as QOI (channels=3, sRGB)."""
    h, w, c = arr.shape
    assert c == 3
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">II", w, h)
    out += bytes([3, 0])
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = arr.reshape(-1, 3)
    for px in flat:
        cur = (int(px[0]), int(px[1]), int(px[2]), 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run > 0:
            out.append(_OP_RUN | (run - 1))
            run = 0
        pos = _hash(*cur)
        if index[pos] == cur:
            out.append(_OP_INDEX | pos)
        else:
            index[pos] = cur
            dr = (cur[0] - prev[0] + 128) % 256 - 128
            dg = (cur[1] - prev[1] + 128) % 256 - 128
            db = (cur[2] - prev[2] + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(
                    _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                )
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out.append(_OP_RGB)
                out += bytes(cur[:3])
        prev = cur
    if run > 0:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """Decode QOI bytes to an HxWx3 uint8 array (alpha discarded)."""
    assert data[:4] == _MAGIC, "not a QOI stream"
    w, h = struct.unpack(">II", data[4:12])
    channels, _colorspace = data[12], data[13]
    assert channels in (3, 4)
    assert data[-8:] == _END, "missing QOI end marker"
    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    i = 14
    j = 0
    while j < n:
        b0 = data[i]
        i += 1
        if b0 == _OP_RGB:
            px = (data[i], data[i + 1], data[i + 2], px[3])
            i += 3
        elif b0 == _OP_RGBA:
            px = (data[i], data[i + 1], data[i + 2], data[i + 3])
            i += 4
        else:
            tag = b0 & 0xC0
            if tag == _OP_INDEX:
                px = index[b0 & 0x3F]
                out[j] = px[:3]
                j += 1
                # spec: INDEX lookup doesn't need a re-store (it's
                # already there), and run continues from this pixel
                continue
            if tag == _OP_DIFF:
                dr = ((b0 >> 4) & 0x03) - 2
                dg = ((b0 >> 2) & 0x03) - 2
                db = (b0 & 0x03) - 2
                px = (
                    (px[0] + dr) % 256,
                    (px[1] + dg) % 256,
                    (px[2] + db) % 256,
                    px[3],
                )
            elif tag == _OP_LUMA:
                dg = (b0 & 0x3F) - 32
                b1 = data[i]
                i += 1
                dr = dg + ((b1 >> 4) & 0x0F) - 8
                db = dg + (b1 & 0x0F) - 8
                px = (
                    (px[0] + dr) % 256,
                    (px[1] + dg) % 256,
                    (px[2] + db) % 256,
                    px[3],
                )
            elif tag == _OP_RUN:
                run = (b0 & 0x3F) + 1
                out[j : j + run] = px[:3]
                j += run
                continue
        index[_hash(*px)] = px
        out[j] = px[:3]
        j += 1
    return out.reshape(h, w, 3)


def op_histogram(data: bytes) -> dict[str, int]:
    """Count chunk ops in a QOI stream (diagnostic / test aid)."""
    counts = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0,
              "run": 0}
    i = 14
    end = len(data) - 8
    while i < end:
        b0 = data[i]
        i += 1
        if b0 == _OP_RGB:
            counts["rgb"] += 1
            i += 3
        elif b0 == _OP_RGBA:
            counts["rgba"] += 1
            i += 4
        else:
            tag = b0 & 0xC0
            if tag == _OP_INDEX:
                counts["index"] += 1
            elif tag == _OP_DIFF:
                counts["diff"] += 1
            elif tag == _OP_LUMA:
                counts["luma"] += 1
                i += 1
            else:
                counts["run"] += 1
    return counts
