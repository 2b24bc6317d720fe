"""Pure-NumPy baseline JPEG codec (ITU-T T.81 / JFIF), no codec library.

Closes the biggest remaining image seam (reference defers JPEG to the
user's PIL stack, caits loading pipelines accept whatever PIL reads):
REAL byte-level decode of baseline sequential DCT JPEG -- marker parse,
DQT/DHT/SOF0/SOS/DRI, byte-unstuffed entropy segments with restart
markers, canonical Huffman DECODE (T.81 F.2.2), dequantize + dezigzag,
vectorized 8x8 IDCT over all blocks at once, sampling-factor block
assembly with chroma upsampling, YCbCr -> RGB (BT.601 full range) and
the house grayscale convention (color channels averaged, [0, 1]).

Progressive (SOF2), arithmetic coding and 12-bit precision raise the
declared seam.  The minimal encoder exists to build test fixtures (the
FLAC-encoder pattern): Annex-K tables, IJG quality scaling, grayscale /
4:4:4 / 4:2:0, optional restart intervals.

Decode trusts only the BITSTREAM (all tables come from the file), and
the tests include hand-assembled spec fixtures so an encoder/decoder-
symmetric bug (swapped zigzag, wrong predictor) cannot self-cancel.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: index -> (row, col) in coefficient order (T.81 Figure 5)
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    _A[_u] = _c / 2.0 * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)
del _u, _c


class _Huff:
    """Canonical Huffman table with a 16-bit prefix lookup (fast path)."""

    __slots__ = ("lut_sym", "lut_len")

    def __init__(self, bits: np.ndarray, vals: np.ndarray):
        # assign canonical codes (T.81 C.2): increasing length, +1 each
        self.lut_sym = np.full(1 << 16, -1, np.int16)
        self.lut_len = np.zeros(1 << 16, np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(int(bits[length - 1])):
                sym = int(vals[k]); k += 1
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.lut_sym[lo:hi] = sym
                self.lut_len[lo:hi] = length
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("bits", "pos", "pow16", "pows")

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, np.uint8)
        self.bits = np.unpackbits(arr)
        self.pos = 0
        self.pow16 = (1 << np.arange(15, -1, -1)).astype(np.int64)
        self.pows = [(1 << np.arange(n - 1, -1, -1)).astype(np.int64)
                     for n in range(17)]

    def peek16(self) -> int:
        b = self.bits[self.pos:self.pos + 16]
        if len(b) < 16:  # pad with 1s (spec: fill bits are 1)
            b = np.concatenate([b, np.ones(16 - len(b), np.uint8)])
        return int(b @ self.pow16)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError("JPEG entropy segment truncated")
        self.pos += n
        return int(b @ self.pows[n])

    def decode(self, h: _Huff) -> int:
        v = self.peek16()
        length = int(h.lut_len[v])
        if length == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.pos += length
        return int(h.lut_sym[v])


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Collect the entropy-coded segment starting at ``start``, split on
    restart markers, byte-unstuffed.  Returns (segments, end_pos) with
    end_pos at the 0xFF of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b); i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF); i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur)); cur = bytearray(); i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w) float64 grayscale in [0, 1] (color inputs
    averaged over R, G, B per the house convention)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None      # (h, w, comps); comps = [(id, Hs, Vs, Tq)]
    ri = 0            # restart interval in MCUs (0 = none)
    i = 2
    planes: dict[int, np.ndarray] = {}
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at {i}")
        m = data[i + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    tbl = np.frombuffer(body, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(body, np.uint8, 64, p).astype(np.int64)
                    p += 64
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = np.frombuffer(body, np.uint8, 16, p + 1)
                nv = int(bits.sum())
                vals = np.frombuffer(body, np.uint8, nv, p + 17)
                huff[(tc, th)] = _Huff(bits, vals)
                p += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0 baseline / SOF1 ext. sequential
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (8 only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0}: only baseline/extended sequential "
                "Huffman decode (the declared progressive/arithmetic seam)"
            )
        elif m == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tda >> 4, tda & 0x0F))
            segs, i = _split_entropy(data, i + 2 + seglen)
            planes = _decode_scan(frame, scan, qt, huff, ri, segs)
            continue
        i += 2 + seglen
    if frame is None or not planes:
        raise ValueError("JPEG without a decoded scan")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for cid, hs, vs, _tq in comps:
        pl = planes[cid]
        pl = np.repeat(np.repeat(pl, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(pl[:h, :w])
    if len(out) == 1:
        return np.clip(out[0], 0, 255) / 255.0
    if len(out) != 3:
        raise NotImplementedError(f"JPEG with {len(out)} components")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b]), 0, 255)
    return rgb.mean(axis=0) / 255.0


def _decode_scan(frame, scan, qt, huff, ri, segs) -> dict[int, np.ndarray]:
    h, w, comps = frame
    if [c[0] for c in comps] != [s[0] for s in scan]:
        raise NotImplementedError("JPEG non-interleaved scan")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    # per component: coefficient store (nblocks, 64) + block grid dims
    store: dict[int, np.ndarray] = {}
    grids: dict[int, tuple[int, int]] = {}
    for cid, hs, vs, _tq in comps:
        grids[cid] = (mcuy * vs, mcux * hs)
        store[cid] = np.zeros((mcuy * vs * mcux * hs, 64), np.int64)
    dctabs = {s[0]: huff[(0, s[1])] for s in scan}
    actabs = {s[0]: huff[(1, s[2])] for s in scan}

    seg_idx = 0
    rd = _BitReader(segs[0])
    pred = {c[0]: 0 for c in comps}
    per_seg = ri if ri else nmcu
    for mcu in range(nmcu):
        if mcu and ri and mcu % per_seg == 0:
            seg_idx += 1
            rd = _BitReader(segs[seg_idx])
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for cid, hs, vs, _tq in comps:
            dc_t, ac_t = dctabs[cid], actabs[cid]
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64, np.int64)
                    s = rd.decode(dc_t)
                    diff = _extend(rd.read(s), s)
                    pred[cid] += diff
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = rd.decode(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[k] = _extend(rd.read(s), s)
                        k += 1
                    _gy, gx = grids[cid]
                    bi = (my * vs + by) * gx + (mx * hs + bx)
                    store[cid][bi] = coef
    # dequantize + dezigzag + IDCT, all blocks of each component at once
    planes: dict[int, np.ndarray] = {}
    for cid, hs, vs, tq in comps:
        gy, gx = grids[cid]
        zz = store[cid] * qt[tq][None, :]
        blocks = np.zeros((gy * gx, 64))
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8)
        # IDCT: x = A^T X A
        spat = np.einsum("ur,nuv,vc->nrc", _A, blocks, _A) + 128.0
        planes[cid] = (
            spat.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        )
    return planes


# ---------------------------------------------------------------------------
# Minimal encoder (fixture generator, FLAC-encoder pattern)
# ---------------------------------------------------------------------------

_QL = np.array([  # Annex K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
_QC = np.array([  # Annex K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

_DC_BITS = np.array([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                    np.uint8)
_DC_VALS = np.arange(12, dtype=np.uint8)
_AC_BITS = np.array([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
                    np.uint8)
_AC_VALS = np.array([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
], np.uint8)


def _codes_from(bits: np.ndarray, vals: np.ndarray) -> dict[int, tuple[int, int]]:
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(int(bits[length - 1])):
            out[int(vals[k])] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill (spec)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int64)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(gy*8, gx*8) plane -> (nblocks, 64) quantized zigzag coefficients."""
    gy, gx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    coef = np.einsum("ur,nrc,vc->nuv", _A, blocks, _A).reshape(-1, 64)
    zz = coef[:, _ZIGZAG]
    return np.round(zz / q[None, :]).astype(np.int64)


def _mag_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _pad_plane(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to a multiple of (bh, bw)."""
    h, w = p.shape
    H = -(-h // bh) * bh
    W = -(-w // bw) * bw
    return np.pad(p, ((0, H - h), (0, W - w)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder for fixtures: ``img`` is (h, w) grayscale or
    (h, w, 3) RGB, float in [0, 1] or uint8.  ``subsampling`` is '444' or
    '420' (color only)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ql = _quality_scale(_QL[_ZIGZAG], quality)  # zigzag order for DQT
    qc = _quality_scale(_QC[_ZIGZAG], quality)
    dc_codes = _codes_from(_DC_BITS, _DC_VALS)
    ac_codes = _codes_from(_AC_BITS, _AC_VALS)

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: a.astype(np.float64)}
    else:
        rgb = a.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            cbp = _pad_plane(cb, 2, 2)
            crp = _pad_plane(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
        elif subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            raise ValueError(f"subsampling {subsampling!r}")
        planes = {1: y, 2: cb, 3: cr}

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs: dict[int, np.ndarray] = {}
    grids: dict[int, tuple[int, int]] = {}
    for cid, hs, vs, tq in comps:
        gy, gx = mcuy * vs, mcux * hs
        pl = _pad_plane(planes[cid], 1, 1)[: gy * 8, : gx * 8]
        if pl.shape != (gy * 8, gx * 8):
            pl = np.pad(pl, ((0, gy * 8 - pl.shape[0]),
                             (0, gx * 8 - pl.shape[1])), mode="edge")
        coefs[cid] = _fdct_quant(pl, ql if tq == 0 else qc)
        grids[cid] = (gy, gx)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT
    body = bytes([0x00]) + ql.astype(np.uint8).tobytes()
    if not gray:
        body += bytes([0x01]) + qc.astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
    # DHT: one DC + one AC table, shared by all components (legal)
    body = bytes([0x00]) + _DC_BITS.tobytes() + _DC_VALS.tobytes()
    body += bytes([0x10]) + _AC_BITS.tobytes() + _AC_VALS.tobytes()
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    body = bytes([len(comps)])
    for cid, _hs, _vs, _tq in comps:
        body += bytes([cid, 0x00])
    body += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    bw = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    nmcu = mcux * mcuy
    for mcu in range(nmcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            bw = _BitWriter()
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for cid, hs, vs, _tq in comps:
            for by in range(vs):
                for bx in range(hs):
                    _gy, gx = grids[cid]
                    zz = coefs[cid][(my * vs + by) * gx + (mx * hs + bx)]
                    diff = int(zz[0]) - pred[cid]
                    pred[cid] = int(zz[0])
                    s = _mag_cat(diff)
                    c, ln = dc_codes[s]
                    bw.put(c, ln)
                    if s:
                        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                    run = 0
                    nz = np.flatnonzero(zz[1:])
                    last = int(nz[-1]) + 1 if len(nz) else 0
                    for k in range(1, last + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = ac_codes[0xF0]  # ZRL
                            bw.put(c, ln)
                            run -= 16
                        s = _mag_cat(v)
                        c, ln = ac_codes[(run << 4) | s]
                        bw.put(c, ln)
                        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last < 63:
                        c, ln = ac_codes[0x00]  # EOB
                        bw.put(c, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
