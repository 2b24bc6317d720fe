"""Baseline JPEG codec: hand-assembled spec fixtures (decoder validated
independently of the fixture encoder), encoder round-trips across
quality / subsampling / restart intervals, and the declared seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crossai_ts_ray.functions.jpegcodec import (
    _ZIGZAG,
    decode_jpeg_bytes,
    encode_jpeg,
)


def _idct_textbook(coef: np.ndarray) -> np.ndarray:
    """Independent IDCT written straight from T.81 A.3.3 (double loop),
    NOT the codec's vectorized basis-matrix formulation."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u, v]
                          * np.cos((2 * y + 1) * u * np.pi / 16)
                          * np.cos((2 * x + 1) * v * np.pi / 16))
            out[y, x] = s / 4.0
    return out + 128.0


class _Bits:
    def __init__(self):
        self.s = ""

    def put(self, code: str):
        self.s += code

    def bytes(self) -> bytes:
        s = self.s + "1" * (-len(self.s) % 8)
        raw = bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
        return raw.replace(b"\xff", b"\xff\x00")


def _hand_jpeg(dc_val: int, ac_pairs: list[tuple[int, int]],
               qtbl: np.ndarray) -> bytes:
    """Assemble a 1-component 8x8 baseline JPEG byte-by-byte from the
    spec.  Huffman tables are tiny custom canonical tables:
      DC: symbols 3,5 at length 2 ('00','01')
      AC: symbols 0x02('00'), 0x00 EOB('01'), 0x01('10'), 0x21('110')
    ``ac_pairs`` is [(zigzag_gap_runlen<<4 | size used implicitly)] given
    as (symbol, value) pairs in scan order.
    """
    out = bytearray(b"\xff\xd8")
    body = bytes([0x00]) + qtbl.astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
    dc_bits = bytes([0, 2] + [0] * 14)            # two length-2 codes
    dc_vals = bytes([3, 5])                       # cats 3 ('00'), 5 ('01')
    body = bytes([0x00]) + dc_bits + dc_vals
    ac_bits = bytes([0, 3, 1] + [0] * 13)         # 3 len-2 + 1 len-3
    ac_vals = bytes([0x02, 0x00, 0x01, 0x21])
    body += bytes([0x10]) + ac_bits + ac_vals
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    body = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    dc_code = {3: "00", 5: "01"}
    ac_code = {0x02: "00", 0x00: "01", 0x01: "10", 0x21: "110"}
    bw = _Bits()
    s = int(abs(dc_val)).bit_length()
    bw.put(dc_code[s])
    v = dc_val if dc_val >= 0 else dc_val + (1 << s) - 1
    bw.put(format(v, f"0{s}b"))
    for sym, val in ac_pairs:
        bw.put(ac_code[sym])
        sz = sym & 0x0F
        v = val if val >= 0 else val + (1 << sz) - 1
        bw.put(format(v, f"0{sz}b"))
    bw.put(ac_code[0x00])  # EOB
    out += bw.bytes()
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_fixture_dc_and_zigzag_orientation():
    """DC=16, AC zigzag[1]=(0,1)=3, AC zigzag[2]=(1,0)=1 with quant all-1:
    output equals a textbook IDCT.  Asserts marker parse, canonical
    Huffman, EXTEND, zigzag ORDER and ORIENTATION, dequant, IDCT."""
    q = np.ones(64, np.int64)
    # scan order: (0x02 -> run 0 size 2, value 3) then (0x01 -> size 1, 1)
    data = _hand_jpeg(16, [(0x02, 3), (0x01, 1)], q)
    got = decode_jpeg_bytes(data)
    coef = np.zeros((8, 8))
    coef[0, 0] = 16
    coef[0, 1] = 3   # zigzag index 1 is the HORIZONTAL neighbor
    coef[1, 0] = 1   # zigzag index 2 is the VERTICAL neighbor
    expect = np.clip(_idct_textbook(coef), 0, 255) / 255.0
    assert np.allclose(got, expect, atol=1e-12)
    # orientation really matters: the transposed placement must NOT match
    bad = np.zeros((8, 8)); bad[0, 0] = 16; bad[1, 0] = 3; bad[0, 1] = 1
    assert not np.allclose(got, np.clip(_idct_textbook(bad), 0, 255) / 255.0)


def test_hand_fixture_negative_dc_extend_and_quant():
    """DC=-5 (EXTEND of category-3 code '010') against a non-trivial
    quant value; a run-16 AC via the 0x21 symbol (run 2, size 1)."""
    q = np.ones(64, np.int64)
    q[0] = 7
    data = _hand_jpeg(-5, [(0x21, -1)], q)
    got = decode_jpeg_bytes(data)
    coef = np.zeros((8, 8))
    coef[0, 0] = -5 * 7
    # 0x21: skip 2 zeros -> lands at zigzag index 3 = (2, 0)
    coef[2, 0] = -1
    expect = np.clip(_idct_textbook(coef), 0, 255) / 255.0
    assert np.allclose(got, expect, atol=1e-12)


def test_16bit_dqt_parses():
    q = np.ones(64, np.int64)
    data = bytearray(_hand_jpeg(16, [], q))
    # rebuild DQT as Pq=1 (16-bit big-endian entries)
    i = data.find(b"\xff\xdb")
    seglen = struct.unpack_from(">H", data, i + 2)[0]
    new = bytes([0x10]) + q.astype(">u2").tobytes()
    data[i + 2 : i + 2 + seglen] = struct.pack(">H", 2 + len(new)) + new
    got = decode_jpeg_bytes(bytes(data))
    coef = np.zeros((8, 8)); coef[0, 0] = 16
    assert np.allclose(got, np.clip(_idct_textbook(coef), 0, 255) / 255.0,
                       atol=1e-12)


def test_gray_roundtrip_quality():
    y, x = np.mgrid[0:24, 0:40]
    img = (128 + 60 * np.sin(y / 6) + 50 * np.cos(x / 8)).astype(np.uint8)
    for q, tol in ((95, 3.0), (75, 8.0)):
        got = decode_jpeg_bytes(encode_jpeg(img, quality=q)) * 255
        assert np.abs(got - img).max() < tol, q


def test_color_roundtrips_and_odd_dims():
    y, x = np.mgrid[0:32, 0:48]
    base = (128 + 60 * np.sin(y / 6) + 50 * np.cos(x / 8)).astype(np.uint8)
    rgb = np.stack([base, base[::-1], np.roll(base, 5, 0)], 2)
    ref = rgb.astype(np.float64).mean(axis=2)
    got = decode_jpeg_bytes(encode_jpeg(rgb, quality=95)) * 255
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 1.5
    # 4:2:0 with non-multiple-of-16 dims
    rgb2, ref2 = rgb[:31, :45], ref[:31, :45]
    got = decode_jpeg_bytes(
        encode_jpeg(rgb2, quality=90, subsampling="420")) * 255
    assert got.shape == ref2.shape
    assert np.abs(got - ref2).mean() < 3.0


def test_restart_intervals_roundtrip():
    y, x = np.mgrid[0:24, 0:40]
    img = (128 + 60 * np.sin(y / 6) + 50 * np.cos(x / 8)).astype(np.uint8)
    plain = decode_jpeg_bytes(encode_jpeg(img, quality=90))
    for ri in (1, 2, 3):
        got = decode_jpeg_bytes(
            encode_jpeg(img, quality=90, restart_interval=ri))
        # same coefficients, only segmented differently -> identical
        assert np.array_equal(got, plain), ri


def test_declared_seams():
    img = np.full((8, 8), 90, np.uint8)
    good = bytearray(encode_jpeg(img))
    i = good.find(b"\xff\xc0")
    prog = bytearray(good); prog[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg_bytes(bytes(prog))
    with pytest.raises(ValueError):
        decode_jpeg_bytes(b"not a jpeg")
    # 12-bit precision
    deep = bytearray(good)
    deep[i + 4] = 12
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg_bytes(bytes(deep))


def test_flat_blocks_near_exact():
    for v in (0, 37, 128, 200, 255):
        img = np.full((16, 16), v, np.uint8)
        got = decode_jpeg_bytes(encode_jpeg(img, quality=90)) * 255
        assert np.abs(got - v).max() <= 1.0, v
