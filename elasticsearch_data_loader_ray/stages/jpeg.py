"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman).

Real crawls are JPEG-dominated, and this container has no Pillow/libjpeg —
so the multimodal pipeline carries its own reference codec:

* :func:`decode_jpeg` — baseline/sequential decoder: marker parse, canonical
  Huffman tables (DHT), dequant + inverse zigzag, vectorized 2-D IDCT
  (einsum over all blocks of a component at once), nearest-neighbor chroma
  upsampling for subsampled files (h/v factors 1-2), restart-marker (DRI/
  RSTn) support, JFIF YCbCr -> RGB. Progressive / arithmetic / 12-bit
  streams raise ``ValueError`` (the stage records them undecoded).
* :func:`encode_jpeg` — baseline encoder (4:4:4, Annex K quantization
  tables with libjpeg quality scaling, Annex K Huffman tables): used by
  tests and fixture generators so the decoder is exercised end-to-end with
  genuine entropy-coded bytes.

The entropy (Huffman) layer is bit-serial by nature; it runs as a table-
driven Python loop over a pre-unpacked bit array — correctness-first and
fine for feature-extraction batches (the DCT/color stages around it are
fully vectorized). A 100-TB media pipeline would swap this stage's decode
kernel for a native library inside the same actor-pool stage contract
(stages/multimodal.py keeps the Pillow probe for exactly that).

No counterpart in the reference repo (it has no media path); public-spec
implementation (ITU-T T.81 Annex F/K, JFIF 1.02).
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


def _decode_tables(bits: list[int], vals: list[int]):
    """(min_code, max_code, val_index) per length for the serial decoder."""
    mins, maxs, idxs = [0] * 17, [-1] * 17, [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            mins[length] = code
            idxs[length] = k
            code += n
            k += n
            maxs[length] = code - 1
        code <<= 1
    return mins, maxs, idxs, list(vals)


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
    """Entropy-segment reader over unstuffed bytes, bit-serial."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise ValueError("truncated JPEG entropy segment")
        v = 0
        for b in self.bits[p:p + n]:
            v = (v << 1) | int(b)
        self.pos = p + n
        return v

    def decode_huff(self, table) -> int:
        mins, maxs, idxs, vals = table
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if maxs[length] >= 0 and code <= maxs[length]:
                return vals[idxs[length] + code - mins[length]]
        raise ValueError("invalid Huffman code in JPEG stream")


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


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JFIF bytes for a (h, w, 3) RGB or (h, w) grayscale uint8
    array — 4:4:4, standard tables, no restart markers."""
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
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
        qt = qts[min(ci, len(qts) - 1)].reshape(8, 8)
        comp_q.append(np.round(coef / qt).astype(np.int64)
                      .reshape(-1, 64)[:, ZIGZAG])

    bw_ = _BitWriter()
    prev_dc = [0] * len(planes)
    for m in range(n_mcu):
        for ci in range(len(planes)):
            tid = min(ci, 1)
            zz = comp_q[ci][m]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s, bits_v = _magnitude(diff)
            code, ln = dc_codes[tid][s]
            bw_.put(code, ln)
            if s:
                bw_.put(bits_v, s)
            run = 0
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

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(v) for v in qt[ZIGZAG])
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, min(ci, 1)])
    # DHT
    for cls, tid, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))[:(4 if ncomp > 1 else 2)]:
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (3 + len(payload)).to_bytes(2, "big")
        out += bytes([(cls << 4) | tid]) + payload
    # SOS
    out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        tid = min(ci, 1)
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"
    out += bytes(bw_.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) RGB uint8 (or (h, w) for grayscale)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/extended JPEG unsupported "
                             "(baseline decoder)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cid] = (tt >> 4, tt & 0xF)
            data_start = pos + seglen
            return _decode_scan(payload, data_start, frame, scan_sel,
                                qtables, htables, restart_interval)
        pos += seglen
    raise ValueError("no SOS marker found")


def _unstuff(payload: bytes, start: int) -> tuple[bytes, list[int]]:
    """Entropy bytes with 0xFF00 unstuffed; RSTn positions become segment
    boundaries (returned as bit offsets into the unstuffed stream)."""
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
    return bytes(out), resets


def _decode_scan(payload, start, frame, scan_sel, qtables, htables,
                 restart_interval) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    data, resets = _unstuff(payload, start)
    reader = _BitReader(data)
    reset_iter = iter(resets)
    # per-component coefficient stacks
    coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
             for c in comps]
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                nxt = next(reset_iter, None)
                if nxt is not None:
                    reader.pos = nxt
                prev_dc = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = htables[(0, scan_sel[c["id"]][0])]
                ac_t = htables[(1, scan_sel[c["id"]][1])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_huff(dc_t)
                        diff = _extend(reader.read(s), s)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.read(s), s)
                            k += 1
                        coefs[ci][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu_count += 1

    # vectorized dequant + IDCT + assembly per component
    planes = []
    for ci, c in enumerate(comps):
        qt = qtables[c["tq"]][UNZIGZAG].reshape(8, 8).astype(np.float64)
        stack = coefs[ci].reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, stack * qt, _DCT_M)
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
