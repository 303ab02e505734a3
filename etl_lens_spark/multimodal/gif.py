"""Real GIF87a/89a codec: LZW compression and decompression in pure
Python (stdlib only — the container genuinely lacks image libs, but
GIF's entropy coder is implementable from the public spec).

Grammar implemented: header, logical screen descriptor, global color
table, image descriptor, LZW-compressed index stream in 255-byte
sub-blocks, trailer. LZW per the GIF89a spec / GIFLIB semantics:
variable code width starting at min_code_size+1, CLEAR/EOI codes,
width grows when the next assignable code would overflow the current
width (cap 12 bits), dictionary reset via CLEAR at 4096 codes,
KwKwK first-char rule on the decode side.

The reference renders images via stb/D3D textures
(`src/D3DWrappers/*`, decode not implemented in-repo); this codec
exists for the [N] multimodal-column mandate — prove the binary-
column plumbing with a REAL bitstream, not a fake.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_CODE_WIDTH = 12


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, ...], int] = {
        (i,): i for i in range(clear)
    }
    next_code = eoi + 1
    width = min_code_size + 1
    w = _BitWriter()
    w.write(clear, width)
    buf: tuple[int, ...] = ()
    for k in map(int, indices):
        cand = buf + (k,)
        if cand in table:
            buf = cand
            continue
        w.write(table[buf], width)
        if next_code < (1 << MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < MAX_CODE_WIDTH:
                width += 1
        else:
            # dictionary full: reset (spec's CLEAR mechanism)
            w.write(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (k,)
    if buf:
        w.write(table[buf], width)
    # the decoder performs one final dictionary insertion after the
    # last data code (catching up its one-insertion lag) and widens
    # one step earlier than the encoder; mirror that growth here so
    # EOI is written at the width the decoder will read it with
    if next_code == (1 << width) and width < MAX_CODE_WIDTH:
        width += 1
    w.write(eoi, width)
    return w.finish()


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < (1 << MAX_CODE_WIDTH):
            table[next_code] = prev + (entry[0],)
            next_code += 1
            # decoder's dictionary lags the encoder's by exactly one
            # insertion at read time, so it must widen one insertion
            # EARLIER: at (1 << width), not (1 << width) + 1
            if next_code == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, width: int, height: int
) -> bytes:
    """indices: (h*w,) palette indices row-major; palette: (n, 3)
    uint8 RGB, n a power of two >= 2."""
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    assert n == 1 << bits, "palette size must be a power of two"
    min_code_size = max(2, bits)
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, n-entry table
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | (bits - 1), 0, 0
    )
    out += palette.astype(np.uint8).tobytes()
    # image descriptor (no local table, no interlace)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(min_code_size)
    out += _sub_blocks(lzw_encode(indices, min_code_size))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Returns (indices row-major, palette (n,3), width, height)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    if not flags & 0x80:
        raise ValueError("no global color table")
    n = 2 << (flags & 0x07)
    palette = np.frombuffer(
        data[pos : pos + 3 * n], dtype=np.uint8
    ).reshape(n, 3)
    pos += 3 * n
    while data[pos] == 0x21:  # extension blocks: skip sub-blocks
        pos += 2
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
    if data[pos] != 0x2C:
        raise ValueError(f"expected image descriptor at {pos}")
    ix, iy, iw, ih, iflags = struct.unpack(
        "<HHHHB", data[pos + 1 : pos + 10]
    )
    pos += 10
    if iflags & 0x80:
        raise ValueError("local color tables not supported")
    interlaced = bool(iflags & 0x40)
    min_code_size = data[pos]
    pos += 1
    stream = bytearray()
    while data[pos]:
        ln = data[pos]
        stream += data[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    idx = lzw_decode(bytes(stream), min_code_size)
    if len(idx) != iw * ih:
        raise ValueError(f"decoded {len(idx)} px, expected {iw * ih}")
    arr = np.array(idx, dtype=np.int32).reshape(ih, iw)
    if interlaced:
        # GIF89a 4-pass interlace: stream rows arrive as passes
        # (0::8, 4::8, 2::4, 1::2) — undo the permutation
        order = np.concatenate(
            [
                np.arange(0, ih, 8),
                np.arange(4, ih, 8),
                np.arange(2, ih, 4),
                np.arange(1, ih, 2),
            ]
        )
        out = np.empty_like(arr)
        out[order] = arr
        arr = out
    return arr.reshape(-1), palette, iw, ih
