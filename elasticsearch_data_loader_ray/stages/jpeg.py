"""Pure-numpy JPEG codec (ITU-T T.81 sequential + progressive, Huffman).

Real crawls are JPEG-dominated, and this container has no Pillow/libjpeg —
so the multimodal pipeline carries its own reference codec:

* :func:`decode_jpeg` — decoder for baseline/extended sequential (SOF0/1)
  AND progressive (SOF2) streams: marker parse, canonical Huffman tables
  (DHT), multi-scan coefficient accumulation with spectral selection and
  successive approximation (DC/AC first + refinement, EOBRUN), dequant +
  inverse zigzag, vectorized 2-D IDCT (batched matmul over all blocks of a
  component at once), nearest-neighbor chroma upsampling for subsampled
  files (h/v factors 1-2), restart-marker (DRI/RSTn) support, JFIF
  YCbCr -> RGB. Arithmetic / lossless / hierarchical / 12-bit raise
  ``ValueError`` (the stage records them undecoded).
* :func:`encode_jpeg` — 4:4:4 encoder (Annex K quantization with libjpeg
  quality scaling): baseline by default; ``progressive=True`` emits a
  SOF2 stream via the libjpeg-style simple script, so tests exercise every
  progressive decode path with genuine entropy bytes and can assert
  ``decode(progressive) == decode(baseline)`` bitwise.

The entropy (Huffman) layer is decoded with table-driven multi-bit
stepping: a 16-bit-prefix LUT resolves each symbol in one list index, and
the hot sequential path fuses symbol + sign-extended magnitude bits into a
single 40-bit window fetch, scattering coefficients once per scan
(measured 5.5x over the 1-bit serial walk; ~0.4-0.55 MB/s = ~0.8-1.8
megapixel/s per core at q75-q90 — BASELINE.md round-5 media section).
Symbol decode remains inherently serial per entropy segment; a 100-TB
media pipeline would swap this stage's decode kernel for a native library
inside the same actor-pool stage contract (stages/multimodal.py keeps the
Pillow probe for exactly that).

No counterpart in the reference repo (it has no media path); public-spec
implementation (ITU-T T.81 Annex F/G/K, JFIF 1.02).
"""

from __future__ import annotations

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Flat 8-bit AC Huffman table for the progressive ENCODER's scans: the
# Annex K baseline AC tables carry no EOBn (n>0) symbols, so progressive
# band coding needs its own table. 176 symbols x 8 bits satisfies Kraft
# (176/256 <= 1) and keeps the canonical-code builder trivial; compression
# is secondary for fixture generation. Symbols: EOB0..EOB14, ZRL, and
# (run, size) for run 0..15 x size 1..10.
_PROG_AC_VALS = ([n << 4 for n in range(15)] + [0xF0]
                 + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALS), 0, 0, 0, 0, 0,
                 0, 0, 0]

# DCT-II basis for the vectorized block transforms:
# M[u, x] = c(u)/2 * cos((2x+1) u pi / 16); forward F = M A M^T, inverse
# A = M^T F M (einsum over the whole block stack at once).
_x = np.arange(8)
_DCT_M = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_DCT_M[0, :] *= 1 / np.sqrt(2)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling over the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """value -> (code, length) canonical Huffman assignment (Annex C)."""
    codes: dict[int, tuple] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: decode-table cache: standard tables repeat across a crawl's images, and
#: a 65536-entry LUT build is ~5 ms — keyed on the DHT payload itself
_DECODE_TABLE_CACHE: dict[tuple, tuple] = {}


def _decode_tables(bits: list[int], vals: list[int]):
    """16-bit-lookup decode tables: next-16-bits -> (value, code length).

    Canonical codes are left-aligned prefixes, so every 16-bit window
    beginning with code ``c`` of length ``l`` occupies the contiguous slice
    ``[c << (16-l), (c+1) << (16-l))``. Decode is ONE list index + length
    advance per symbol — the table-driven multi-bit stepping of VERDICT
    r4 #6, replacing the 1-bit-per-iteration serial walk. Entries left at
    length 0 are invalid codes."""
    key = (tuple(bits), tuple(vals))
    hit = _DECODE_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    val_arr = np.zeros(1 << 16, dtype=np.int32)
    len_arr = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            val_arr[lo:lo + (1 << (16 - length))] = vals[k]
            len_arr[lo:lo + (1 << (16 - length))] = length
            code += 1
            k += 1
        code <<= 1
    out = (val_arr.tolist(), len_arr.tolist())
    if len(_DECODE_TABLE_CACHE) < 64:
        _DECODE_TABLE_CACHE[key] = out
    return out


# --- bit I/O ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)


class _BitReader:
    """Entropy-segment reader over unstuffed bytes: byte-indexed peek
    window + 16-bit LUT Huffman stepping (one index per symbol)."""

    def __init__(self, data: bytes):
        # 5 pad bytes make the 40-bit peek window safe at stream end;
        # codes/bits that would extend past nbits are rejected by the
        # length checks, so pad bits can never decode
        self._d = data + b"\x00\x00\x00\x00\x00"
        self.nbits = len(data) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("truncated JPEG entropy segment")
        self.pos = p + n
        d = self._d
        i = p >> 3
        end = (p + n + 7) >> 3
        v = 0
        while i < end:
            v = (v << 8) | d[i]
            i += 1
        return (v >> ((end << 3) - p - n)) & ((1 << n) - 1)

    def decode_huff(self, table) -> int:
        vals, lens = table
        p = self.pos
        i = p >> 3
        d = self._d
        idx = (((d[i] << 16) | (d[i + 1] << 8) | d[i + 2])
               >> (8 - (p & 7))) & 0xFFFF
        ln = lens[idx]
        if ln == 0 or p + ln > self.nbits:
            raise ValueError("invalid Huffman code in JPEG stream")
        self.pos = p + ln
        return vals[idx]

    def sym_and_extend(self, table, low_nibble: bool) -> tuple[int, int]:
        """Fused hot-path step: Huffman symbol AND its trailing magnitude
        bits (already sign-extended, F.2.2.1) from ONE 40-bit window —
        bit offset <= 7 + code <= 16 + magnitude <= 11 always fit.
        ``low_nibble`` selects where the bit count lives (AC run/size vs
        DC category). Returns (symbol, extended value)."""
        vals, lens = table
        p = self.pos
        o = p & 7
        i = p >> 3
        d = self._d
        w = ((d[i] << 32) | (d[i + 1] << 24) | (d[i + 2] << 16)
             | (d[i + 3] << 8) | d[i + 4])  # bits i*8 .. i*8+39
        idx = (w >> (24 - o)) & 0xFFFF
        ln = lens[idx]
        if ln == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        sym = vals[idx]
        s = sym & 0xF if low_nibble else sym
        if p + ln + s > self.nbits:
            raise ValueError("truncated JPEG entropy segment")
        self.pos = p + ln + s
        if s == 0:
            return sym, 0
        v = (w >> (40 - o - ln - s)) & ((1 << s) - 1)
        return sym, (v - (1 << s) + 1) if v < (1 << (s - 1)) else v


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, bits) for DC/AC coefficient coding."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# --- encoder ----------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate pad to 8x8 multiples, return (n, 8, 8) stack."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    return blocks, bh, bw


def encode_jpeg(img: np.ndarray, quality: int = 85,
                progressive: bool = False) -> bytes:
    """JFIF bytes for a (h, w, 3) RGB or (h, w) grayscale uint8 array —
    4:4:4, no restart markers. ``progressive=True`` emits a SOF2 stream
    with the libjpeg-style simple script (DC first at Al=1, per-component
    AC bands 1-5 / 6-63 at Al=1, then DC and AC refinement to Al=0) so
    every progressive decode path — spectral selection, successive
    approximation, EOBRUN — is exercised by genuine entropy bytes. The
    final coefficients equal the baseline encoding's exactly, so
    ``decode(progressive) == decode(baseline)`` bitwise."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc == 1:
        planes = [img[:, :, 0].astype(np.float64)]
    elif nc == 3:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError(f"unsupported channel count: {nc}")
    ql, qc = _quality_tables(quality)
    qts = [ql] + ([qc] if len(planes) > 1 else [])
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # vectorized FDCT + quantization per component
    comp_q: list[np.ndarray] = []
    n_mcu = None
    for ci, plane in enumerate(planes):
        blocks, bh, bw = _to_blocks(plane - 128.0)
        n_mcu = bh * bw
        coef = _DCT_M @ blocks @ _DCT_M.T  # F = M A M^T, batched matmul
        qt = qts[min(ci, len(qts) - 1)].reshape(8, 8)
        comp_q.append(np.round(coef / qt).astype(np.int64)
                      .reshape(-1, 64)[:, ZIGZAG])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(v) for v in qt[ZIGZAG])
    # SOF0 (sequential) / SOF2 (progressive)
    ncomp = len(planes)
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, min(ci, 1)])

    def dht(cls, tid, bits, vals):
        payload = bytes(bits) + bytes(vals)
        return (b"\xff\xc4" + (3 + len(payload)).to_bytes(2, "big")
                + bytes([(cls << 4) | tid]) + payload)

    if not progressive:
        for cls, tid, bits, vals in (
                (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
                (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
                (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        )[:(4 if ncomp > 1 else 2)]:
            out += dht(cls, tid, bits, vals)
        out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
        for ci in range(ncomp):
            tid = min(ci, 1)
            out += bytes([ci + 1, (tid << 4) | tid])
        out += b"\x00\x3f\x00"
        out += _encode_baseline_scan(comp_q, n_mcu, dc_codes, ac_codes)
    else:
        out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        if ncomp > 1:
            out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
        prog_ac = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)
        for comp_sel, ss, se, ahi, alo in _progressive_scans(ncomp):
            ns = len(comp_sel)
            out += b"\xff\xda" + (6 + 2 * ns).to_bytes(2, "big") + bytes([ns])
            for ci in comp_sel:
                out += bytes([ci + 1, (min(ci, 1) << 4) | 0])
            out += bytes([ss, se, (ahi << 4) | alo])
            if ss == 0:
                out += _encode_dc_scan(comp_q, n_mcu, comp_sel, dc_codes,
                                       ahi, alo)
            else:
                out += _encode_ac_scan(comp_q[comp_sel[0]], prog_ac,
                                       ss, se, ahi, alo)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_baseline_scan(comp_q, n_mcu, dc_codes, ac_codes) -> bytes:
    bw_ = _BitWriter()
    prev_dc = [0] * len(comp_q)
    for m in range(n_mcu):
        for ci in range(len(comp_q)):
            tid = min(ci, 1)
            zz = comp_q[ci][m]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s, bits_v = _magnitude(diff)
            code, ln = dc_codes[tid][s]
            bw_.put(code, ln)
            if s:
                bw_.put(bits_v, s)
            nz = np.flatnonzero(zz[1:])  # positions of nonzero AC
            pos = 0
            for j in nz:
                run = int(j) - pos
                while run > 15:
                    code, ln = ac_codes[tid][0xF0]  # ZRL
                    bw_.put(code, ln)
                    run -= 16
                s, bits_v = _magnitude(int(zz[1 + j]))
                code, ln = ac_codes[tid][(run << 4) | s]
                bw_.put(code, ln)
                bw_.put(bits_v, s)
                pos = int(j) + 1
            if pos < 63:
                code, ln = ac_codes[tid][0x00]  # EOB
                bw_.put(code, ln)
    bw_.flush()
    return bytes(bw_.out)


def _progressive_scans(ncomp: int) -> list[tuple]:
    """(component indexes, Ss, Se, Ah, Al) script — libjpeg's simple
    progression shape: DC first, split AC bands, then refinements."""
    scans = [(list(range(ncomp)), 0, 0, 0, 1)]  # DC first, Al=1
    for ci in range(ncomp):
        scans.append(([ci], 1, 5, 0, 1))
        scans.append(([ci], 6, 63, 0, 1))
    scans.append((list(range(ncomp)), 0, 0, 1, 0))  # DC refine
    for ci in range(ncomp):
        scans.append(([ci], 1, 63, 1, 0))  # AC refine
    return scans


def _encode_dc_scan(comp_q, n_mcu, comp_sel, dc_codes, ah, al) -> bytes:
    bw_ = _BitWriter()
    if ah == 0:  # first: usual DC differences over the point transform
        prev = {ci: 0 for ci in comp_sel}
        for m in range(n_mcu):
            for ci in comp_sel:
                v = int(comp_q[ci][m][0]) >> al  # arithmetic shift (spec)
                s, bits_v = _magnitude(v - prev[ci])
                prev[ci] = v
                code, ln = dc_codes[min(ci, 1)][s]
                bw_.put(code, ln)
                if s:
                    bw_.put(bits_v, s)
    else:  # refinement: one raw bit per block
        for m in range(n_mcu):
            for ci in comp_sel:
                bw_.put((int(comp_q[ci][m][0]) >> al) & 1, 1)
    bw_.flush()
    return bytes(bw_.out)


def _emit_eobrun(bw_, ac_codes, eobrun: int, pending: list[int]) -> None:
    """EOBn symbol for the accumulated end-of-band run, then the buffered
    refinement correction bits of the folded blocks (T.81 G.1.2.2-3)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        bw_.put(code, ln)
        if nbits:
            bw_.put(eobrun & ((1 << nbits) - 1), nbits)
    for b in pending:
        bw_.put(b, 1)


def _encode_ac_scan(zz_blocks, ac_codes, ss, se, ah, al) -> bytes:
    """Single-component progressive AC band: initial (Ah=0) or refinement
    (Ah>0) coding with EOBRUN accumulation across blocks."""
    bw_ = _BitWriter()
    eobrun = 0
    pending: list[int] = []
    for zz in zz_blocks:
        if ah == 0:
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                if eobrun or pending:
                    _emit_eobrun(bw_, ac_codes, eobrun, pending)
                    eobrun, pending = 0, []
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    bw_.put(code, ln)
                    r -= 16
                s, bits_v = _magnitude(t if v >= 0 else -t)
                code, ln = ac_codes[(r << 4) | s]
                bw_.put(code, ln)
                bw_.put(bits_v, s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _emit_eobrun(bw_, ac_codes, eobrun, pending)
                    eobrun, pending = 0, []
        else:
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index of the LAST newly-nonzero coefficient
            for i, a in enumerate(absv):
                if a == 1:
                    eob = ss + i
            r = 0
            br: list[int] = []  # this block's buffered correction bits
            for k in range(ss, se + 1):
                a = absv[k - ss]
                if a == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    _emit_eobrun(bw_, ac_codes, eobrun, pending)
                    eobrun, pending = 0, []
                    code, ln = ac_codes[0xF0]
                    bw_.put(code, ln)
                    r -= 16
                    for b in br:
                        bw_.put(b, 1)
                    br = []
                if a > 1:  # history coefficient: buffer its correction bit
                    br.append(a & 1)
                    continue
                # newly-nonzero: (run, 1) symbol + sign + buffered bits
                _emit_eobrun(bw_, ac_codes, eobrun, pending)
                eobrun, pending = 0, []
                code, ln = ac_codes[(r << 4) | 1]
                bw_.put(code, ln)
                bw_.put(1 if int(zz[k]) >= 0 else 0, 1)
                for b in br:
                    bw_.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    _emit_eobrun(bw_, ac_codes, eobrun, pending)
                    eobrun, pending = 0, []
    if eobrun or pending:
        _emit_eobrun(bw_, ac_codes, eobrun, pending)
    bw_.flush()
    return bytes(bw_.out)


# --- decoder ----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG -> (h, w, 3) RGB uint8 (or (h, w) for grayscale).

    Handles baseline/extended sequential (SOF0/SOF1) and PROGRESSIVE
    (SOF2) Huffman streams: multi-scan coefficient accumulation with
    spectral selection, successive approximation (DC+AC first/refine,
    EOBRUN), interleaved and single-component scans, restart markers.
    Arithmetic/lossless/hierarchical/12-bit raise ``ValueError``."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    frame = None
    progressive = False
    restart_interval = 0
    coefs = None  # per-comp (blocks_v, blocks_h, 64) zigzag accumulators
    geom = None  # (mcux, mcuy, hmax, vmax)
    got_scan = False
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("truncated JPEG marker segment")
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_, tq = seg[p] >> 4, seg[p] & 0xF
                if pq_ != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    seg[p + 1:p + 65], dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htables[(cls, tid)] = _decode_tables(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            if frame is not None:
                raise ValueError("multiple SOF markers")
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xC2
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "lossless/arithmetic/hierarchical JPEG unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            if coefs is None:
                coefs, geom = _alloc_coefs(frame)
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cid] = (tt >> 4, tt & 0xF)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if progressive:
                if (ss == 0) != (se == 0) or se > 63 or ss > se or al > 13:
                    raise ValueError("invalid progressive scan parameters")
                if ss > 0 and ns != 1:
                    raise ValueError("interleaved progressive AC scan")
            else:
                ss, se, ah, al = 0, 63, 0, 0  # sequential: full spectrum
            pos = _decode_scan(payload, pos + seglen, frame, scan_sel,
                               ss, se, ah, al, htables, restart_interval,
                               coefs, geom, progressive)
            got_scan = True
            continue
        pos += seglen
    if not got_scan:
        raise ValueError("no SOS marker found")
    return _reconstruct(frame, coefs, qtables, geom)


def _alloc_coefs(frame) -> tuple[list[np.ndarray], tuple]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
             for c in comps]
    return coefs, (mcux, mcuy, hmax, vmax)


def _unstuff(payload: bytes, start: int) -> tuple[bytes, list[int], int]:
    """Entropy bytes with 0xFF00 unstuffed; RSTn positions become segment
    boundaries (bit offsets into the unstuffed stream). Also returns the
    byte index of the terminating marker so multi-scan parsing resumes."""
    out = bytearray()
    resets = []
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                resets.append(len(out) * 8)
                i += 2
                continue
            break  # EOI or next marker
        out.append(b)
        i += 1
    return bytes(out), resets, i


def _block_baseline(reader, dc_t, ac_t, base: int, idxs: list, vals: list,
                    pred: int) -> int:
    """Sequential full-spectrum block decode. Coefficients are appended to
    flat (index, value) lists — one bulk numpy scatter per scan replaces
    per-coefficient array writes — and the updated DC predictor returns."""
    _sym, diff = reader.sym_and_extend(dc_t, False)
    pred += diff
    idxs.append(base)
    vals.append(pred)
    k = 1
    while k < 64:
        rs, v = reader.sym_and_extend(ac_t, True)
        if rs & 0xF == 0:
            if rs == 0xF0:
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("AC index out of range")
        idxs.append(base + k)
        vals.append(v)
        k += 1
    return pred


def _block_ac_first(reader, ac_t, zz, ss: int, se: int, al: int,
                    eobrun: int) -> int:
    """Progressive AC initial scan for one block (T.81 G.1.2.2); returns
    the remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits blocks ending here
                eobrun = 1 << r
                if r:
                    eobrun += reader.read(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index out of range")
        zz[k] = _extend(reader.read(s), s) << al
        k += 1
    return 0


def _block_ac_refine(reader, ac_t, zz, ss: int, se: int, al: int,
                     eobrun: int) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): new
    coefficients arrive as (run, 1) symbols; every already-nonzero
    coefficient passed over consumes one correction bit. EOB-run blocks
    still consume correction bits for their nonzero history."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_t)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break  # correction-bit tail below finishes the block
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                newval = p1 if reader.read(1) else m1
            # advance over r zero-history coefficients, emitting a
            # correction bit at every nonzero-history one passed
            while k <= se:
                v = int(zz[k])
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        zz[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB-run member: correction bits only
            v = int(zz[k])
            if v != 0:
                if reader.read(1) and (v & p1) == 0:
                    zz[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(payload, start, frame, scan_sel, ss, se, ah, al,
                 htables, restart_interval, coefs, geom,
                 progressive) -> int:
    """Decode ONE entropy-coded scan into the coefficient accumulators;
    returns the byte position of the terminating marker. Handles
    interleaved (MCU-ordered) and single-component (block-raster over the
    component's own ceil-dims grid, T.81 A.2.2) scans, both sequential
    and progressive."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    mcux, mcuy, hmax, vmax = geom
    scan_ci = [i for i, c in enumerate(comps) if c["id"] in scan_sel]
    data, resets, end = _unstuff(payload, start)
    reader = _BitReader(data)
    reset_iter = iter(resets)
    prev_dc = {ci: 0 for ci in scan_ci}
    eobrun = 0
    dc_only = progressive and ss == 0
    # baseline scans scatter once per scan instead of once per coefficient
    acc = {ci: ([], []) for ci in scan_ci}  # ci -> (flat idxs, vals)

    def _scatter():
        for ci, (idxs, vals) in acc.items():
            if idxs:
                coefs[ci].reshape(-1)[np.asarray(idxs, np.int64)] = \
                    np.asarray(vals, np.int64)

    if len(scan_ci) > 1:  # interleaved: MCU order
        units = []
        for ci in scan_ci:
            c = comps[ci]
            dsel, asel = scan_sel[c["id"]]
            units.append((ci, c["v"], c["h"], htables.get((0, dsel)),
                          htables.get((1, asel))))
        total_mcus = mcux * mcuy
        for m in range(total_mcus):
            if restart_interval and m and m % restart_interval == 0:
                nxt = next(reset_iter, None)
                if nxt is not None:
                    reader.pos = nxt
                prev_dc = {ci: 0 for ci in scan_ci}
                eobrun = 0
            my, mx = divmod(m, mcux)
            for ci, cv, ch, dc_t, ac_t in units:
                row_w = mcux * ch
                for by in range(cv):
                    for bx in range(ch):
                        row = (my * cv + by) * row_w + mx * ch + bx
                        if not progressive:
                            idxs, vals = acc[ci]
                            prev_dc[ci] = _block_baseline(
                                reader, dc_t, ac_t, row * 64, idxs, vals,
                                prev_dc[ci])
                        elif ah == 0:  # DC first
                            _s, diff = reader.sym_and_extend(dc_t, False)
                            prev_dc[ci] += diff
                            coefs[ci].reshape(-1)[row * 64] = \
                                prev_dc[ci] << al
                        else:  # DC refine
                            if reader.read(1):
                                flat = coefs[ci].reshape(-1)
                                flat[row * 64] = \
                                    int(flat[row * 64]) | (1 << al)
        _scatter()
        return end

    # single-component scan: raster over the component's OWN block grid
    ci = scan_ci[0]
    c = comps[ci]
    comp_w = -(-(w * c["h"]) // hmax)
    comp_h = -(-(h * c["v"]) // vmax)
    bw_c = -(-comp_w // 8)
    bh_c = -(-comp_h // 8)
    dsel, asel = scan_sel[c["id"]]
    dc_t = htables.get((0, dsel))
    ac_t = htables.get((1, asel))
    unit = 0
    row_w = coefs[ci].shape[1]
    idxs, vals = acc[ci]
    for by in range(bh_c):
        for bx in range(bw_c):
            if restart_interval and unit and unit % restart_interval == 0:
                nxt = next(reset_iter, None)
                if nxt is not None:
                    reader.pos = nxt
                prev_dc[ci] = 0
                eobrun = 0
            if not progressive:
                prev_dc[ci] = _block_baseline(
                    reader, dc_t, ac_t, (by * row_w + bx) * 64, idxs, vals,
                    prev_dc[ci])
            else:
                zz = coefs[ci][by, bx]
                if dc_only:
                    if ah == 0:
                        _s, diff = reader.sym_and_extend(dc_t, False)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci] << al
                    else:
                        if reader.read(1):
                            zz[0] = int(zz[0]) | (1 << al)
                elif ah == 0:
                    eobrun = _block_ac_first(reader, ac_t, zz, ss, se, al,
                                             eobrun)
                else:
                    eobrun = _block_ac_refine(reader, ac_t, zz, ss, se, al,
                                              eobrun)
            unit += 1
    _scatter()
    return end


def _reconstruct(frame, coefs, qtables, geom) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    mcux, mcuy, hmax, vmax = geom
    # vectorized dequant + IDCT + assembly per component
    planes = []
    for ci, c in enumerate(comps):
        qt = qtables[c["tq"]][UNZIGZAG].reshape(8, 8).astype(np.float64)
        stack = coefs[ci].reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8)
        # A = M^T F M as two broadcast matmuls — ~4x faster than the
        # equivalent three-operand einsum on large block stacks
        spatial = _DCT_M.T @ (stack * qt) @ _DCT_M
        bh, bw_ = mcuy * c["v"], mcux * c["h"]
        plane = (spatial.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw_ * 8)) + 128.0
        # upsample to full resolution (nearest), then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)
