"""Baseline-sequential JPEG codec (8-bit grayscale AND 4:4:4
YCbCr color), pure
Python + numpy — the "entropy coder" format round 3 assumed needed
external libs. It doesn't, for the baseline grayscale profile: the
container is markers (SOI/DQT/SOF0/DHT/SOS/EOI), the entropy layer is
canonical Huffman over (run, size) symbols with DC prediction, and
the transform is the 8x8 DCT-II — all of which numpy + bit arithmetic
express exactly.

Implementation notes (ITU-T T.81 baseline):
- Huffman tables are built PER IMAGE from actual symbol frequencies
  (the "optimized Huffman" mode of real encoders) and emitted in DHT;
  the decoder reconstructs canonical codes from DHT like any
  standards decoder — nothing is shared out-of-band.
- The zigzag order is generated algorithmically (diagonal walk), not
  hardcoded.
- Quantization uses a uniform table; at quality=100 the table is all
  ones, so images whose 8x8 blocks are CONSTANT roundtrip
  bit-exactly (their DCT is a single integer DC coefficient) — the
  property the oracle-checked pipeline pins. General content
  roundtrips within +-1 per pixel (float DCT + rounding), asserted
  in unit tests.
- Byte stuffing (0xFF -> 0xFF 0x00) in the entropy segment, marker
  scan resilient to stuffing, decoder crops edge-replicated padding
  back to the SOF dimensions.

Color runs as 4:4:4 YCbCr with interleaved MCUs and per-component
DC prediction (encode_jpeg_color / decode_jpeg_color); constant
NEUTRAL-GRAY blocks stay bit-exact through the color path too
(R=G=B -> Cb=Cr=128 exactly, integer Y). 4:2:0 chroma subsampling (the
real-camera layout) runs via encode_jpeg_420/decode_jpeg_420 —
16x16 MCUs, four luma blocks + 2x2-mean-downsampled chroma,
replication upsample; neutral-gray constant macroblocks stay
bit-exact through it. Progressive mode stays out of scope; the
multimodal seam documents it honestly.
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np


# ------------------------------------------------------------------
# 8x8 DCT-II basis (orthonormal form used by JPEG)
# ------------------------------------------------------------------

def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


def _zigzag_order() -> list[tuple[int, int]]:
    """Diagonal-walk zigzag over an 8x8 block, generated not
    memorized."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return order


_ZIGZAG = _zigzag_order()


# ------------------------------------------------------------------
# Canonical Huffman (T.81 annex C): (bits, huffval) <-> codes
# ------------------------------------------------------------------

def _codes_from_spec(
    bits: list[int], huffval: list[int]
) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the DHT (bits, values) spec."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_HUFF_SENTINEL = 1 << 20  # sorts after every real (<=8-bit) symbol


def _build_table(freqs: Counter) -> tuple[list[int], list[int]]:
    """Length-limited (<=16) canonical Huffman spec from symbol
    frequencies. Small alphabets (<=256 symbols) + package-merge-free
    heuristic: standard Huffman, then push any >16-bit lengths up by
    rebalancing (rare at these alphabet sizes; asserted).

    Spec conformance (ITU-T T.81 Annex K, enforced by libjpeg and
    therefore by every mainstream decoder): the all-1-bits codeword
    must never be assigned. A phantom symbol with frequency 1 joins
    the tree, is forced to the maximum depth, and is then dropped —
    leaving exactly the deepest all-ones code unused."""
    syms = sorted(freqs)
    if len(syms) == 1:
        # JPEG requires length >= 1; single symbol gets code '0'
        # (the 1-bit all-ones code '1' stays reserved)
        return [1] + [0] * 15, syms
    # standard Huffman code lengths, phantom symbol included
    import heapq

    full = dict(freqs)
    full[_HUFF_SENTINEL] = 1
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(full.items()))]
    heapq.heapify(heap)
    tiebreak = len(heap)
    depth: dict[int, int] = {s: 0 for s in full}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tiebreak, g1 + g2))
        tiebreak += 1
    assert max(depth.values()) <= 16, "length-limit rebalance needed"
    # the phantom must own the DEEPEST slot so the canonical code it
    # would receive is the all-ones one; swap depths if needed (a
    # depth swap between two leaves preserves the Kraft multiset)
    maxd = max(depth.values())
    if depth[_HUFF_SENTINEL] < maxd:
        other = max(s for s in syms if depth[s] == maxd)
        depth[other] = depth[_HUFF_SENTINEL]
        depth[_HUFF_SENTINEL] = maxd
    bits = [0] * 16
    for s in syms:  # phantom excluded: its all-ones code goes unused
        bits[depth[s] - 1] += 1
    huffval = sorted(syms, key=lambda s: (depth[s], s))
    return bits, huffval


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # un-stuff
            else:
                raise ValueError("unexpected marker in entropy data")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(raw: int, cat: int) -> int:
    if cat == 0:
        return 0
    return raw if raw >= (1 << (cat - 1)) else raw - (1 << cat) + 1


# ------------------------------------------------------------------
# Encoder
# ------------------------------------------------------------------

def encode_jpeg_gray(arr: np.ndarray, quality: int = 100) -> bytes:
    """Encode an (h, w) uint8 grayscale array as baseline JPEG."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects (h, w) uint8")
    h, w = arr.shape
    if quality == 100:
        qtab = np.ones((8, 8), dtype=np.int32)
    else:
        # uniform coarse table scaled by quality (simple, valid)
        q = max(1, int(round(50 * (100 - quality) / 50)))
        qtab = np.full((8, 8), q, dtype=np.int32)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(
        arr.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
    )
    # per-block DCT -> quantized zigzag coefficient lists
    blocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _DCT @ blk @ _DCT.T
            qc = np.round(coef / qtab).astype(np.int64)
            blocks.append([int(qc[y, x]) for (y, x) in _ZIGZAG])
    # symbol statistics (two-pass: stats, then emit)
    dc_syms: Counter = Counter()
    ac_syms: Counter = Counter()
    prev_dc = 0
    per_block_syms = []
    for zz in blocks:
        dc_diff = zz[0] - prev_dc
        prev_dc = zz[0]
        items = [("dc", _category(dc_diff), dc_diff)]
        dc_syms[_category(dc_diff)] += 1
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if zz[i] != 0:
                last_nz = i
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                if run == 16:
                    items.append(("ac", 0xF0, 0))
                    ac_syms[0xF0] += 1
                    run = 0
            else:
                cat = _category(zz[i])
                sym = (run << 4) | cat
                items.append(("ac", sym, zz[i]))
                ac_syms[sym] += 1
                run = 0
        if last_nz < 63:
            items.append(("ac", 0x00, 0))
            ac_syms[0x00] += 1
        per_block_syms.append(items)
    dc_bits, dc_vals = _build_table(dc_syms)
    ac_bits, ac_vals = _build_table(ac_syms)
    dc_codes = _codes_from_spec(dc_bits, dc_vals)
    ac_codes = _codes_from_spec(ac_bits, ac_vals)
    # entropy segment
    bw = _BitWriter()
    for items in per_block_syms:
        for kind, sym, val in items:
            if kind == "dc":
                code, length = dc_codes[sym]
                bw.write(code, length)
                if sym:
                    bw.write(_amplitude(val, sym), sym)
            else:
                code, length = ac_codes[sym]
                bw.write(code, length)
                cat = sym & 0x0F
                if cat:
                    bw.write(_amplitude(val, cat), cat)
    entropy = bw.flush()
    # markers
    out = bytearray(b"\xff\xd8")  # SOI
    zz_q = bytes(int(qtab[y, x]) for (y, x) in _ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + bytes([1, 0x11, 0])
    )  # SOF0, 1 component
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 8, 1)
        + bytes([1, 0x00, 0, 63, 0])
    )  # SOS: component 1 uses DC table 0 / AC table 0 (Tc=1 in DHT)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------
# Decoder
# ------------------------------------------------------------------

def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array.
    Walks markers, rebuilds canonical Huffman tables from DHT,
    huffman-decodes with DC prediction, dequantizes, inverse-DCTs."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    h = w = None
    comp_spec = None
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                if pq_tq >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported")
                vals = seg[off + 1 : off + 65]
                t = np.zeros((8, 8), dtype=np.int32)
                for i, (y, x) in enumerate(_ZIGZAG):
                    t[y, x] = vals[i]
                qtabs[pq_tq & 0x0F] = t
                off += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale baseline supported")
            comp_spec = (seg[6], seg[7], seg[8])  # id, sampling, tq
            if comp_spec[1] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                htabs[(tc_th >> 4, tc_th & 0x0F)] = _codes_from_spec(
                    bits, vals
                )
                off += 17 + n
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != 1:
                raise ValueError("single-scan grayscale only")
            td_ta = seg[2]
            sos_tables = (td_ta >> 4, td_ta & 0x0F)
            entropy_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if h is None or entropy_start is None or comp_spec is None:
        raise ValueError("incomplete JPEG stream")
    qtab = qtabs[comp_spec[2]]
    dc_decode = {
        (c, l): s for s, (c, l) in htabs[(0, sos_tables[0])].items()
    }
    ac_decode = {
        (c, l): s for s, (c, l) in htabs[(1, sos_tables[1])].items()
    }
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[entropy_start:end])

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | br.read_bit()
            length += 1
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid huffman code")

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            zz = [0] * 64
            cat = read_symbol(dc_decode)
            diff = _extend(br.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = read_symbol(ac_decode)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, cat = sym >> 4, sym & 0x0F
                i += run
                if i >= 64:
                    raise ValueError("AC run overflows block")
                zz[i] = _extend(br.read_bits(cat), cat)
                i += 1
            coef = np.zeros((8, 8))
            for i, (y, x) in enumerate(_ZIGZAG):
                coef[y, x] = zz[i] * qtab[y, x]
            blk = _DCT.T @ coef @ _DCT + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]


# ------------------------------------------------------------------
# Color (YCbCr 4:4:4) baseline — interleaved MCUs, one 8x8 block per
# component per MCU (no subsampling). JFIF color transform. Shares
# the canonical-Huffman/bit-IO/DCT machinery above; tables are built
# over ALL components' symbols and emitted once (baseline permits
# shared tables).
# ------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def encode_jpeg_color(arr: np.ndarray, quality: int = 100) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline 4:4:4 YCbCr
    JPEG (interleaved MCUs, shared optimized Huffman tables)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_color expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    qtab = np.ones((8, 8), dtype=np.int32) if quality == 100 else np.full(
        (8, 8), max(1, int(round(50 * (100 - quality) / 50))), dtype=np.int32
    )
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    ycc = _rgb_to_ycbcr(arr)
    padded = np.pad(
        ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    # MCU scan order: (by, bx), components interleaved 1,2,3 per MCU
    mcu_coeffs = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            per_comp = []
            for c in range(3):
                blk = (
                    padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                    - 128.0
                )
                qc = np.round((_DCT @ blk @ _DCT.T) / qtab).astype(np.int64)
                per_comp.append([int(qc[y, x]) for (y, x) in _ZIGZAG])
            mcu_coeffs.append(per_comp)
    dc_syms: Counter = Counter()
    ac_syms: Counter = Counter()
    prev_dc = [0, 0, 0]
    per_mcu_items = []
    for per_comp in mcu_coeffs:
        items = []
        for c, zz in enumerate(per_comp):
            diff = zz[0] - prev_dc[c]
            prev_dc[c] = zz[0]
            items.append(("dc", _category(diff), diff))
            dc_syms[_category(diff)] += 1
            last_nz = 0
            for i in range(1, 64):
                if zz[i] != 0:
                    last_nz = i
            run = 0
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        items.append(("ac", 0xF0, 0))
                        ac_syms[0xF0] += 1
                        run = 0
                else:
                    cat = _category(zz[i])
                    sym = (run << 4) | cat
                    items.append(("ac", sym, zz[i]))
                    ac_syms[sym] += 1
                    run = 0
            if last_nz < 63:
                items.append(("ac", 0x00, 0))
                ac_syms[0x00] += 1
        per_mcu_items.append(items)
    dc_bits, dc_vals = _build_table(dc_syms)
    ac_bits, ac_vals = _build_table(ac_syms)
    dc_codes = _codes_from_spec(dc_bits, dc_vals)
    ac_codes = _codes_from_spec(ac_bits, ac_vals)
    bw = _BitWriter()
    for items in per_mcu_items:
        for kind, sym, val in items:
            if kind == "dc":
                code, length = dc_codes[sym]
                bw.write(code, length)
                if sym:
                    bw.write(_amplitude(val, sym), sym)
            else:
                code, length = ac_codes[sym]
                bw.write(code, length)
                cat = sym & 0x0F
                if cat:
                    bw.write(_amplitude(val, cat), cat)
    entropy = bw.flush()
    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(qtab[y, x]) for (y, x) in _ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    comp_spec = b""
    for cid in (1, 2, 3):
        comp_spec += bytes([cid, 0x11, 0])  # no subsampling, qtab 0
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 9, 8, h, w, 3)
        + comp_spec
    )
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos_comps = b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 6 + 2 * 3, 3)
        + sos_comps
        + bytes([0, 63, 0])
    )
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_color(data: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 YCbCr JPEG to (h, w, 3) uint8 RGB.
    Interleaved-MCU scan with per-component DC prediction."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    h = w = None
    comps = []
    sos_map = {}
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                vals = seg[off + 1 : off + 65]
                t = np.zeros((8, 8), dtype=np.int32)
                for i, (y, x) in enumerate(_ZIGZAG):
                    t[y, x] = vals[i]
                qtabs[pq_tq & 0x0F] = t
                off += 65
        elif marker == 0xC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8 or ncomp != 3:
                raise ValueError("decode_jpeg_color expects 3 components")
            for c in range(3):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                htabs[(tc_th >> 4, tc_th & 0x0F)] = _codes_from_spec(
                    bits, vals
                )
                off += 17 + n
        elif marker == 0xDA:
            ns = seg[0]
            if ns != 3:
                raise ValueError("expected 3-component scan")
            for c in range(3):
                cid, td_ta = seg[1 + 2 * c : 3 + 2 * c]
                sos_map[cid] = (td_ta >> 4, td_ta & 0x0F)
            entropy_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if h is None or entropy_start is None:
        raise ValueError("incomplete JPEG stream")
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[entropy_start:end])
    decode_tabs = {}
    for cid, tq in comps:
        td, ta = sos_map[cid]
        decode_tabs[cid] = (
            {(c, l): s for s, (c, l) in htabs[(0, td)].items()},
            {(c, l): s for s, (c, l) in htabs[(1, ta)].items()},
            qtabs[tq],
        )

    def read_symbol(table):
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | br.read_bit()
            length += 1
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid huffman code")

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = np.zeros((ph, pw, 3), dtype=np.float64)
    prev_dc = {cid: 0 for cid, _ in comps}
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c, (cid, _tq) in enumerate(comps):
                dc_tab, ac_tab, qtab = decode_tabs[cid]
                zz = [0] * 64
                cat = read_symbol(dc_tab)
                diff = _extend(br.read_bits(cat), cat) if cat else 0
                prev_dc[cid] += diff
                zz[0] = prev_dc[cid]
                i = 1
                while i < 64:
                    sym = read_symbol(ac_tab)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        i += 16
                        continue
                    run, cat = sym >> 4, sym & 0x0F
                    i += run
                    if i >= 64:
                        raise ValueError("AC run overflows block")
                    zz[i] = _extend(br.read_bits(cat), cat)
                    i += 1
                coef = np.zeros((8, 8))
                for i, (y, x) in enumerate(_ZIGZAG):
                    coef[y, x] = zz[i] * qtab[y, x]
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c] = (
                    _DCT.T @ coef @ _DCT + 128.0
                )
    return _ycbcr_to_rgb(out)[:h, :w]


# ------------------------------------------------------------------
# 4:2:0 chroma subsampling — the layout real cameras emit: MCU =
# 16x16 pixels = 4 luma blocks (TL,TR,BL,BR) + one 2x-downsampled
# Cb + one Cr. Shares every lower layer above; adds the sampling
# geometry and chroma down/upsampling.
# ------------------------------------------------------------------


def _encode_entropy(mcu_items):
    """Shared two-pass optimized-Huffman entropy encoding over a
    per-MCU symbol list: returns (dc_spec, ac_spec, entropy_bytes)."""
    dc_syms: Counter = Counter()
    ac_syms: Counter = Counter()
    for items in mcu_items:
        for kind, sym, _val in items:
            (dc_syms if kind == "dc" else ac_syms)[sym] += 1
    dc_bits, dc_vals = _build_table(dc_syms)
    ac_bits, ac_vals = _build_table(ac_syms)
    dc_codes = _codes_from_spec(dc_bits, dc_vals)
    ac_codes = _codes_from_spec(ac_bits, ac_vals)
    bw = _BitWriter()
    for items in mcu_items:
        for kind, sym, val in items:
            if kind == "dc":
                code, length = dc_codes[sym]
                bw.write(code, length)
                if sym:
                    bw.write(_amplitude(val, sym), sym)
            else:
                code, length = ac_codes[sym]
                bw.write(code, length)
                cat = sym & 0x0F
                if cat:
                    bw.write(_amplitude(val, cat), cat)
    return (dc_bits, dc_vals), (ac_bits, ac_vals), bw.flush()


def _block_symbols(zz, prev_dc):
    """(run,size) symbol stream for one quantized zigzag block."""
    items = [("dc", _category(zz[0] - prev_dc), zz[0] - prev_dc)]
    last_nz = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last_nz = i
    run = 0
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            if run == 16:
                items.append(("ac", 0xF0, 0))
                run = 0
        else:
            cat = _category(zz[i])
            items.append(("ac", (run << 4) | cat, zz[i]))
            run = 0
    if last_nz < 63:
        items.append(("ac", 0x00, 0))
    return items, zz[0]


def _fdct_quant(plane: np.ndarray, y0: int, x0: int, qtab) -> list[int]:
    blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
    qc = np.round((_DCT @ blk @ _DCT.T) / qtab).astype(np.int64)
    return [int(qc[y, x]) for (y, x) in _ZIGZAG]


def encode_jpeg_420(arr: np.ndarray, quality: int = 100) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline 4:2:0 YCbCr
    JPEG (16x16 MCUs; chroma 2x2-mean downsampled)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_420 expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    qtab = np.ones((8, 8), dtype=np.int32) if quality == 100 else np.full(
        (8, 8), max(1, int(round(50 * (100 - quality) / 50))), dtype=np.int32
    )
    ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    ycc = _rgb_to_ycbcr(arr)
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ylum = padded[:, :, 0]
    # chroma: 2x2 mean downsample
    cb = padded[:, :, 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = padded[:, :, 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    prev = {"y": 0, "cb": 0, "cr": 0}
    mcu_items = []
    for my in range(ph // 16):
        for mx in range(pw // 16):
            items = []
            for sy, sx in ((0, 0), (0, 8), (8, 0), (8, 8)):  # Y TL,TR,BL,BR
                zz = _fdct_quant(ylum, my * 16 + sy, mx * 16 + sx, qtab)
                blk_items, prev["y"] = _block_symbols(zz, prev["y"])
                items.extend(blk_items)
            for name, plane in (("cb", cb), ("cr", cr)):
                zz = _fdct_quant(plane, my * 8, mx * 8, qtab)
                blk_items, prev[name] = _block_symbols(zz, prev[name])
                items.extend(blk_items)
            mcu_items.append(items)
    (dc_bits, dc_vals), (ac_bits, ac_vals), entropy = _encode_entropy(
        mcu_items
    )
    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(qtab[y, x]) for (y, x) in _ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    comp_spec = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + comp_spec
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos_comps = b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) + sos_comps + bytes(
        [0, 63, 0]
    )
    out += entropy + b"\xff\xd9"
    return bytes(out)


def decode_jpeg_420(data: bytes) -> np.ndarray:
    """Decode a baseline 4:2:0 YCbCr JPEG to (h, w, 3) uint8 RGB
    (chroma upsampled by replication)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    h = w = None
    samplings = {}
    comp_tq = {}
    sos_map = {}
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                vals = seg[off + 1 : off + 65]
                t = np.zeros((8, 8), dtype=np.int32)
                for i, (y, x) in enumerate(_ZIGZAG):
                    t[y, x] = vals[i]
                qtabs[pq_tq & 0x0F] = t
                off += 65
        elif marker == 0xC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8 or ncomp != 3:
                raise ValueError("decode_jpeg_420 expects 3 components")
            for c in range(3):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                samplings[cid] = samp
                comp_tq[cid] = tq
            if samplings != {1: 0x22, 2: 0x11, 3: 0x11}:
                raise ValueError("not a 4:2:0 layout")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                htabs[(tc_th >> 4, tc_th & 0x0F)] = _codes_from_spec(
                    bits, vals
                )
                off += 17 + n
        elif marker == 0xDA:
            for c in range(seg[0]):
                cid, td_ta = seg[1 + 2 * c : 3 + 2 * c]
                sos_map[cid] = (td_ta >> 4, td_ta & 0x0F)
            entropy_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if h is None or entropy_start is None:
        raise ValueError("incomplete JPEG stream")
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[entropy_start:end])
    tabs = {}
    for cid in (1, 2, 3):
        td, ta = sos_map[cid]
        tabs[cid] = (
            {(c, l): s for s, (c, l) in htabs[(0, td)].items()},
            {(c, l): s for s, (c, l) in htabs[(1, ta)].items()},
            qtabs[comp_tq[cid]],
        )

    def read_symbol(table):
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | br.read_bit()
            length += 1
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid huffman code")

    def read_block(cid, prev_dc):
        dc_tab, ac_tab, qtab = tabs[cid]
        zz = [0] * 64
        cat = read_symbol(dc_tab)
        diff = _extend(br.read_bits(cat), cat) if cat else 0
        dc = prev_dc + diff
        zz[0] = dc
        i = 1
        while i < 64:
            sym = read_symbol(ac_tab)
            if sym == 0x00:
                break
            if sym == 0xF0:
                i += 16
                continue
            run, cat = sym >> 4, sym & 0x0F
            i += run
            if i >= 64:
                raise ValueError("AC run overflows block")
            zz[i] = _extend(br.read_bits(cat), cat)
            i += 1
        coef = np.zeros((8, 8))
        for i, (y, x) in enumerate(_ZIGZAG):
            coef[y, x] = zz[i] * qtab[y, x]
        return _DCT.T @ coef @ _DCT + 128.0, dc

    ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    ylum = np.zeros((ph, pw))
    cb = np.zeros((ph // 2, pw // 2))
    cr = np.zeros((ph // 2, pw // 2))
    prev = {1: 0, 2: 0, 3: 0}
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for sy, sx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                blk, prev[1] = read_block(1, prev[1])
                ylum[
                    my * 16 + sy : my * 16 + sy + 8,
                    mx * 16 + sx : mx * 16 + sx + 8,
                ] = blk
            blk, prev[2] = read_block(2, prev[2])
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = blk
            blk, prev[3] = read_block(3, prev[3])
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = blk
    # chroma upsample by replication
    cb_up = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cr_up = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    ycc = np.stack([ylum, cb_up, cr_up], axis=-1)
    return _ycbcr_to_rgb(ycc)[:h, :w]
