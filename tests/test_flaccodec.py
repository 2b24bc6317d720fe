"""FLAC codec: encoder->decoder round-trips, hand-built SPEC fixtures for
the subframe/stereo paths the fixture encoder never emits (CONSTANT,
VERBATIM, LPC, left/right/mid-side, wasted bits, Rice escape, partition
order > 0), CRC rejection, and wav_loader/media pipeline integration."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from crossai_ts_ray.functions.flaccodec import (  # noqa: E402
    FlacError,
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac_bytes,
    encode_flac_pcm16,
)


def _roundtrip(a: np.ndarray, sr: int = 16000, block_size: int = 4096):
    enc = encode_flac_pcm16(a, sr, block_size=block_size)
    dec, got_sr = decode_flac_bytes(enc, dtype="int32")
    assert got_sr == sr
    np.testing.assert_array_equal(dec, a.astype(np.int32))
    return enc


def test_roundtrip_shapes_and_signals():
    rng = np.random.default_rng(7)
    _roundtrip(rng.integers(-32768, 32768, (12345, 2)).astype(np.int16))
    _roundtrip((np.sin(np.arange(5000) / 7) * 30000)
               .astype(np.int16)[:, None])
    _roundtrip(np.zeros((100, 1), np.int16))
    _roundtrip(np.full((4096, 3), 777, np.int16), block_size=1000)
    # extreme values + tiny trailing block
    x = np.array([[-32768], [32767], [-32768], [32767], [1]], np.int16)
    _roundtrip(x, block_size=4)


def test_roundtrip_float_input_and_compression():
    t = np.arange(20000) / 16000
    a = (0.4 * np.sin(2 * np.pi * 100 * t))[:, None]
    enc = encode_flac_pcm16(a, 16000)
    dec, sr = decode_flac_bytes(enc)
    want = np.rint(a * (1 << 15)) / (1 << 15)
    np.testing.assert_allclose(dec, want, atol=0)
    assert len(enc) < 0.6 * (len(a) * 2)  # a sine must actually compress


# ---------------------------------------------------------------------------
# hand-built spec fixtures: a STREAMINFO + one frame written bit by bit
# ---------------------------------------------------------------------------

def _streaminfo(bs: int, sr: int, n_ch: int, bps: int, total: int) -> bytes:
    w = _BitWriter()
    w.write(bs, 16)
    w.write(bs, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(n_ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + w.bytes() + b"\x00" * 16


def _frame_header(bs: int, ch_code: int, ss_code: int) -> _BitWriter:
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)        # 16-bit get block size
    w.write(0, 4)        # sample rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(ss_code, 3)
    w.write(0, 1)
    w.write(0, 8)        # frame number 0
    w.write(bs - 1, 16)
    hdr = bytes(w.out)
    w.write(_crc8(hdr), 8)
    return w


def _finish_frame(w: _BitWriter) -> bytes:
    w.align()
    frame = bytes(w.out)
    w.write(_crc16(frame), 16)
    return w.bytes()


def _constant_subframe(w: _BitWriter, value: int, bits: int = 16):
    w.write(0, 1)
    w.write(0, 6)   # CONSTANT
    w.write(0, 1)
    w.write(value, bits)


def test_spec_fixture_constant_and_verbatim():
    bs = 8
    data = _streaminfo(bs, 8000, 1, 16, bs)
    w = _frame_header(bs, 0, 4)
    # VERBATIM subframe with known samples
    samples = [5, -5, 100, -100, 32767, -32768, 0, 1]
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for s in samples:
        w.write(s, 16)
    dec, sr = decode_flac_bytes(data + _finish_frame(w), dtype="int32")
    assert sr == 8000
    assert dec[:, 0].tolist() == samples

    w = _frame_header(bs, 0, 4)
    _constant_subframe(w, -777)
    dec, _ = decode_flac_bytes(data + _finish_frame(w), dtype="int32")
    assert (dec[:, 0] == -777).all()


def test_spec_fixture_wasted_bits():
    """Wasted bits: samples encoded at bps-2 then shifted left by 2."""
    bs = 4
    data = _streaminfo(bs, 8000, 1, 16, bs)
    w = _frame_header(bs, 0, 4)
    w.write(0, 1)
    w.write(1, 6)     # VERBATIM
    w.write(1, 1)     # wasted flag
    w.write(1, 2)     # unary 1 -> wasted = 2
    for s in (3, -3, 100, -1):
        w.write(s, 14)  # 16 - 2 wasted
    dec, _ = decode_flac_bytes(data + _finish_frame(w), dtype="int32")
    assert dec[:, 0].tolist() == [12, -12, 400, -4]


def test_spec_fixture_lpc_subframe():
    """LPC order 2, shift 1, coefs [3, -1]: x[i] = r[i] + (3x[i-1] - x[i-2]) >> 1."""
    bs = 6
    data = _streaminfo(bs, 8000, 1, 16, bs)
    w = _frame_header(bs, 0, 4)
    w.write(0, 1)
    w.write(32 | (2 - 1), 6)  # LPC order 2
    w.write(0, 1)
    warm = [10, 20]
    for s in warm:
        w.write(s, 16)
    w.write(4 - 1, 4)     # precision 4 bits
    w.write(1, 5)         # shift 1 (signed 5-bit, positive)
    w.write(3, 4)         # coef[0] = 3
    w.write(-1, 4)        # coef[1] = -1
    # residuals for 4 samples: rice method 0, partition order 0, k=2
    res = [1, -2, 0, 3]
    w.write(0, 2)
    w.write(0, 4)
    w.write(2, 4)
    for v in res:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        w.write_unary(u >> 2)
        w.write(u & 3, 2)
    dec, _ = decode_flac_bytes(data + _finish_frame(w), dtype="int32")
    x = warm[:]
    for r in res:
        x.append(r + ((3 * x[-1] - 1 * x[-2]) >> 1))
    assert dec[:, 0].tolist() == x


@pytest.mark.parametrize("ch_code,mode", [(8, "left"), (9, "right"),
                                          (10, "mid")])
def test_spec_fixture_stereo_decorrelation(ch_code, mode):
    """left/right/mid-side reconstruction against hand-computed L/R."""
    bs = 4
    L = np.array([100, -50, 32000, -32768], np.int64)
    R = np.array([90, -60, 31990, -32760], np.int64)
    side = L - R
    data = _streaminfo(bs, 8000, 2, 16, bs)
    w = _frame_header(bs, ch_code, 4)

    def verbatim(vals, bits):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write(int(v), bits)

    if mode == "left":
        verbatim(L, 16)
        verbatim(side, 17)     # side channel carries the extra bit
    elif mode == "right":
        verbatim(side, 17)
        verbatim(R, 16)
    else:
        mid = (L + R) >> 1
        verbatim(mid, 16)
        verbatim(side, 17)
    dec, _ = decode_flac_bytes(data + _finish_frame(w), dtype="int32")
    np.testing.assert_array_equal(dec[:, 0], L)
    np.testing.assert_array_equal(dec[:, 1], R)


def test_spec_fixture_rice_partitions_and_escape():
    """Partition order 1 (two partitions, different k) and an escape
    partition with raw 6-bit residuals, FIXED order 1."""
    bs = 8
    data = _streaminfo(bs, 8000, 1, 16, bs)
    w = _frame_header(bs, 0, 4)
    w.write(0, 1)
    w.write(8 | 1, 6)   # FIXED order 1
    w.write(0, 1)
    w.write(1000, 16)   # warmup
    res = [1, -1, 2, 0, -25, 25, -30, 0]  # 7 residuals (bs - order)
    w.write(0, 2)       # rice method 0
    w.write(1, 4)       # partition order 1 -> partitions of 4 (first: 3)
    # partition 0: k=1, residuals res[0:3]
    w.write(1, 4)
    for v in res[:3]:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        w.write_unary(u >> 1)
        w.write(u & 1, 1)
    # partition 1: escape, 6-bit raw, residuals res[3:7]
    w.write(0xF, 4)
    w.write(6, 5)
    for v in res[3:7]:
        w.write(v, 6)
    dec, _ = decode_flac_bytes(data + _finish_frame(w), dtype="int32")
    x = [1000]
    for r in res[:7]:
        x.append(r + x[-1])
    assert dec[:, 0].tolist() == x


def test_crc_rejection_and_magic():
    a = (np.arange(100) * 11 % 3000).astype(np.int16)[:, None]
    enc = bytearray(encode_flac_pcm16(a, 8000))
    with pytest.raises(FlacError, match="magic"):
        decode_flac_bytes(b"OggS" + bytes(enc[4:]))
    enc[-1] ^= 0xFF  # corrupt the final frame CRC-16
    with pytest.raises(FlacError, match="CRC"):
        decode_flac_bytes(bytes(enc))
    # verify_crc=False tolerates it (the data bits are intact)
    dec, _ = decode_flac_bytes(bytes(enc), dtype="int32", verify_crc=False)
    np.testing.assert_array_equal(dec, a.astype(np.int32))


def test_wav_loader_reads_flac(tmp_path):
    from crossai_ts_ray.sources.loaders import wav_loader

    rng = np.random.default_rng(5)
    a = rng.integers(-20000, 20000, (3000, 2)).astype(np.int16)
    p = tmp_path / "x.flac"
    p.write_bytes(encode_flac_pcm16(a, 22050))
    audio, sr = wav_loader(str(p))
    assert sr == 22050 and audio.shape == (3000, 2)
    np.testing.assert_allclose(audio, a / 32768.0, atol=0)


def test_media_features_consume_flac_shard(ray_session, tmp_path):
    """The actor-pool media stage decodes a FLAC payload column end to
    end (the audio_loader-over-bytes shape)."""
    from crossai_ts_ray.functions.wavcodec import decode_audio_bytes

    t = np.arange(8000) / 8000
    wavish = (0.25 * np.sin(2 * np.pi * 100 * t)).astype(np.float64)
    payload = encode_flac_pcm16(wavish[:, None], 8000)
    audio, sr = decode_audio_bytes(payload)
    assert sr == 8000
    mono = audio.mean(axis=1)
    rms = float(np.sqrt((mono ** 2).mean()))
    assert 0.15 < rms < 0.2  # sine RMS = amp/sqrt(2) ~ 0.177
    with pytest.raises(NotImplementedError, match="seam"):
        decode_audio_bytes(b"ID3\x03rest-of-an-mp3")


# ---------------------------------------------------------------------------
# round-5 image-codec seam closures (16-bit PNG/PNM, palette PNG)
# ---------------------------------------------------------------------------

def _png_chunks(w, h, bit_depth, color_type, idat, plte=None) -> bytes:
    import struct
    import zlib

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, bit_depth,
                                      color_type, 0, 0, 0))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(idat))
    out += chunk(b"IEND", b"")
    return out


def test_png_16bit_gray_decodes():
    import zlib  # noqa: F401

    from crossai_ts_ray.functions.imagecodec import decode_png_bytes

    w, h = 5, 3
    vals = (np.arange(w * h, dtype=np.uint16) * 4000).reshape(h, w)
    rows = b""
    for y in range(h):
        rows += b"\x00" + vals[y].astype(">u2").tobytes()
    g = decode_png_bytes(_png_chunks(w, h, 16, 0, rows))
    np.testing.assert_allclose(g, vals / 65535.0)


def test_png_16bit_rgb_with_filters():
    """16-bit RGB through Sub/Up filters: byte-wise filtering with a
    6-byte left distance must reproduce the plain values."""
    from crossai_ts_ray.functions.imagecodec import decode_png_bytes

    rng = np.random.default_rng(2)
    w, h = 4, 4
    vals = rng.integers(0, 65536, (h, w, 3)).astype(np.uint16)
    plain = b""
    for y in range(h):
        plain += b"\x00" + vals[y].astype(">u2").tobytes()
    base = decode_png_bytes(_png_chunks(w, h, 16, 2, plain))

    # re-encode with Up filter rows (row y stores y - y-1 bytes)
    raw = np.frombuffer(plain, np.uint8).reshape(h, -1)[:, 1:]
    up = b""
    prev = np.zeros(raw.shape[1], np.int64)
    for y in range(h):
        up += b"\x02" + ((raw[y].astype(np.int64) - prev) & 0xFF).astype(
            np.uint8).tobytes()
        prev = raw[y].astype(np.int64)
    again = decode_png_bytes(_png_chunks(w, h, 16, 2, up))
    np.testing.assert_allclose(again, base)


def test_png_palette_decodes():
    from crossai_ts_ray.functions.imagecodec import decode_png_bytes

    plte = bytes([255, 0, 0,   0, 255, 0,   0, 0, 255,   30, 60, 90])
    w, h = 4, 2
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    rows = b""
    for y in range(h):
        rows += b"\x00" + idx[y].tobytes()
    g = decode_png_bytes(_png_chunks(w, h, 8, 3, rows, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3).astype(np.float64)
    want = pal[idx].mean(axis=2) / 255.0
    np.testing.assert_allclose(g, want)


def test_pnm_16bit_decodes():
    from crossai_ts_ray.functions.imagecodec import decode_pnm_bytes

    w, h = 3, 2
    vals = np.array([[0, 1000, 65535], [7, 40000, 12345]], np.uint16)
    payload = b"P5\n3 2\n65535\n" + vals.astype(">u2").tobytes()
    g = decode_pnm_bytes(payload)
    np.testing.assert_allclose(g, vals / 65535.0)


def test_png_adam7_interlaced_matches_plain():
    """An Adam7-interlaced encoding of a known image decodes identically
    to the straight encoding (fixture built pass by pass per spec 8.2)."""
    from crossai_ts_ray.functions.imagecodec import (
        _ADAM7,
        decode_png_bytes,
    )

    rng = np.random.default_rng(4)
    w, h = 11, 7  # odd sizes exercise empty/ragged passes
    img = rng.integers(0, 256, (h, w), np.uint8)

    plain = b""
    for y in range(h):
        plain += b"\x00" + img[y].tobytes()
    base = decode_png_bytes(_png_chunks(w, h, 8, 0, plain))

    inter = b""
    for x0, y0, xs, ys in _ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            inter += b"\x00" + row.tobytes()
    # rebuild with interlace flag = 1 in IHDR
    import struct
    import zlib

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(inter))
            + chunk(b"IEND", b""))
    got = decode_png_bytes(data)
    np.testing.assert_allclose(got, base)
    np.testing.assert_allclose(got, img / 255.0)


def test_bmp_rle8_decodes():
    """BI_RLE8 with runs, absolute mode (odd length -> pad byte), a delta
    jump, EOL and EOB, checked against the hand-drawn bitmap."""
    import struct

    from crossai_ts_ray.functions.imagecodec import decode_bmp_bytes

    w, h = 8, 3
    # encoded stream (per row, bottom-up in BMP order):
    rle = bytes([
        4, 10,            # run: 4 x 10
        0x00, 3, 7, 8, 9, 0x00,  # absolute: 3 literals (pad byte)
        1, 99,            # run: 1 x 99
        0x00, 0x00,       # EOL -> encoded row 1
        0x00, 2, 2, 0,    # delta: skip x += 2 within the row
        3, 5,             # run: 3 x 5 at x 2..4
        0x00, 0x00,       # EOL -> encoded row 2
        8, 1,             # full row of 1s
        0x00, 0x01,       # EOB
    ])
    off = 54
    hdr = (b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle),
                         0, 0, 0, 0))
    g = (decode_bmp_bytes(hdr + rle) * 255.0).round().astype(int)
    want = np.zeros((h, w), int)
    # BMP rows are bottom-up: encoded row 0 is display row h-1
    want[2] = [10, 10, 10, 10, 7, 8, 9, 99]
    want[1, 2:5] = 5
    want[0] = 1
    np.testing.assert_array_equal(g, want)


def test_png_sub_byte_gray_and_palette():
    """1/2/4-bit gray and 4-bit palette PNGs (MSB-first packing)."""
    import struct
    import zlib

    from crossai_ts_ray.functions.imagecodec import decode_png_bytes

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    def build(w, h, depth, ctype, idat, plte=None):
        out = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                            ctype, 0, 0, 0)))
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(idat)) + chunk(b"IEND", b"")

    # 1-bit gray, 10 px wide (ragged last byte)
    img = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1, 1],
                    [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]], np.uint8)
    rows = b""
    for y in range(2):
        packed = np.packbits(img[y])  # MSB-first
        rows += b"\x00" + packed.tobytes()
    g = decode_png_bytes(build(10, 2, 1, 0, rows))
    np.testing.assert_allclose(g, img.astype(float))

    # 4-bit gray: values 0..15 scale by /15
    img4 = np.array([[0, 15, 7, 8, 3]], np.uint8)
    packed = bytes([0x0F, 0x78, 0x30])  # 5 nibbles, padded
    g = decode_png_bytes(build(5, 1, 4, 0, b"\x00" + packed))
    np.testing.assert_allclose(g, img4 / 15.0)

    # 2-bit palette
    plte = bytes([0, 0, 0,  255, 255, 255,  90, 90, 90,  30, 60, 90])
    idx = np.array([[0, 1, 2, 3, 1]], np.uint8)
    packed = bytes([0b00011011, 0b01000000])
    g = decode_png_bytes(build(5, 1, 2, 3, b"\x00" + packed, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3).astype(float)
    np.testing.assert_allclose(g, pal[idx].mean(axis=2) / 255.0)
