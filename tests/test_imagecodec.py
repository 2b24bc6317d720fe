"""Real image decode: pure-NumPy PNG (all five filter types), BMP and
PGM/PPM parsers, plus the actor-pool image stage with decode="real"."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray.functions.imagecodec import (
    _PNG_MAGIC,
    decode_bmp_bytes,
    decode_image_bytes,
    decode_png_bytes,
    decode_pnm_bytes,
    encode_png_gray,
)


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def _build_png(px: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """Forward-filter known pixels per the PNG spec, one filter per row --
    the decoder must invert every type exactly."""
    h, w, ch = px.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        enc = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_all_filters_all_color_types(color_type, ch):
    rng = np.random.default_rng(color_type)
    px = rng.integers(0, 256, size=(7, 5, ch), dtype=np.int64)
    payload = _build_png(px, color_type, filters=[0, 1, 2, 3, 4])
    got = decode_png_bytes(payload)
    f = px.astype(np.float64)
    if color_type == 0 or color_type == 4:
        exp = f[:, :, 0]
    elif color_type == 2:
        exp = f.mean(axis=2)
    else:
        exp = f[:, :, :3].mean(axis=2)
    assert np.array_equal(got, exp / 255.0)


def test_png_roundtrip_own_encoder():
    rng = np.random.default_rng(1)
    img = rng.random((11, 13))
    got = decode_png_bytes(encode_png_gray(img))
    assert got.shape == (11, 13)
    assert np.max(np.abs(got - img)) <= 0.5 / 255


def test_bmp_24bit_bottom_up_with_padding():
    # 3x2 BMP, 24bpp: stride pads 9 bytes -> 12
    w, h = 3, 2
    rows = np.array(
        [[[10, 20, 30], [40, 50, 60], [70, 80, 90]],
         [[0, 0, 0], [255, 255, 255], [1, 2, 3]]],
        dtype=np.uint8,
    )
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        r = rows[y].reshape(-1).tobytes()
        body += r + b"\x00" * (stride - len(r))
    off = 54
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    got = decode_bmp_bytes(bytes(hdr + body))
    assert np.array_equal(got, rows.astype(np.float64).mean(axis=2) / 255.0)


def test_pnm_pgm_and_ppm_with_comment():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    pgm = b"P5\n# a comment\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(decode_pnm_bytes(pgm), img.astype(np.float64) / 255.0)
    rgb = np.stack([img, img * 2, img * 3], axis=2).astype(np.uint8)
    ppm = b"P6 4 3 255\n" + rgb.tobytes()
    assert np.array_equal(
        decode_pnm_bytes(ppm), rgb.astype(np.float64).mean(axis=2) / 255.0
    )


def test_dispatch_and_declared_seams():
    with pytest.raises(ValueError):
        decode_image_bytes(b"garbage!")
    with pytest.raises(NotImplementedError):
        decode_image_bytes(b"RIFF....WEBP")
    # JPEG now decodes for real (functions/jpegcodec.py); dispatch routes it
    from crossai_ts_ray.functions.jpegcodec import encode_jpeg

    img = np.full((8, 8), 200, np.uint8)
    got = decode_image_bytes(encode_jpeg(img, quality=95))
    assert got.shape == (8, 8)
    assert np.abs(got * 255 - 200).max() < 1.0


def test_image_stage_real_decode_end_to_end(ray_session):
    import ray.data as rd

    from crossai_ts_ray.pipelines.multimodal import MEDIA_SCHEMA, ImageDecodeResize

    rng = np.random.default_rng(5)
    rows = []
    for i in range(4):
        img = rng.random((24, 24))
        rows.append(
            {
                "media_id": f"i{i}",
                "kind": "image",
                "payload": encode_png_gray(img),
                "width": 24,
                "height": 24,
                "sample_rate": 0,
                "n_frames": 0,
            }
        )
        rows.append(
            {
                "media_id": f"x{i}", "kind": "audio", "payload": b"\x00" * 64,
                "width": 0, "height": 0, "sample_rate": 8000, "n_frames": 0,
            }
        )
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = (
        ds.map_batches(
            ImageDecodeResize(out_size=8, decode="real"),
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == 4  # audio rows filtered out by the image stage
    assert all(len(p) == 64 for p in out["pixels"])
    assert out["mean_intensity"].between(0.3, 0.7).all()  # uniform noise


def test_png_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def run(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w))
        got = decode_png_bytes(encode_png_gray(img))
        assert got.shape == (h, w)
        assert np.max(np.abs(got - img)) <= 0.5 / 255

    run()


def _bmp_header(w, h, bpp, compression, body_len, extra=b"", off=None):
    off = off if off is not None else 54 + len(extra)
    hdr = b"BM" + struct.pack("<IHHI", off + body_len, 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                       body_len, 0, 0, 0, 0)
    return hdr + extra


def test_bmp_rle4_decodes():
    """BI_RLE4: alternating-nibble runs, absolute mode (odd count -> pad),
    EOL and EOB escapes."""
    # row0: run of 5 with value 0xA3 -> A 3 A 3 A; absolute 3 pixels 1,2,3
    # row1: run of 4 with 0xFF -> F F F F, then remaining 4 via abs 4,5,6,7
    w, h = 8, 2
    body = bytes([
        5, 0xA3, 0, 3, 0x12, 0x30, 0, 0,     # row 0 (abs 3: 1,2,3 + pad)
        4, 0xFF, 0, 4, 0x45, 0x67, 0, 0,     # row 1 (abs 4: no pad)
        0, 1,                                # end of bitmap
    ])
    expect = np.array(
        [[0xA, 3, 0xA, 3, 0xA, 1, 2, 3],
         [0xF, 0xF, 0xF, 0xF, 4, 5, 6, 7]], np.float64) / 15.0
    got = decode_bmp_bytes(_bmp_header(w, h, 4, 2, len(body)) + body)
    # positive height = bottom-up storage: stream row 0 is the image's
    # BOTTOM row, so the decoded image is the stream rows reversed
    assert np.array_equal(got, expect[::-1])
    assert got.shape == (2, 8)


def test_bmp_4bpp_uncompressed():
    w, h = 5, 2
    # rows stored bottom-up, stride pads ceil(5/2)=3 bytes -> 4
    row_bot = bytes([0x12, 0x34, 0x50, 0x00])   # pixels 1,2,3,4,5
    row_top = bytes([0xFE, 0xDC, 0xB0, 0x00])   # pixels F,E,D,C,B
    body = row_bot + row_top
    got = decode_bmp_bytes(_bmp_header(w, h, 4, 0, len(body)) + body)
    expect = np.array([[15, 14, 13, 12, 11], [1, 2, 3, 4, 5]],
                      np.float64) / 15.0
    assert np.array_equal(got, expect)


def test_bmp_16bpp_rgb555_and_565_bitfields():
    w, h = 2, 1
    # RGB555: r=31 g=0 b=0 -> 0x7C00; r=0 g=31 b=0 -> 0x03E0
    body = struct.pack("<HH", 0x7C00, 0x03E0)
    got = decode_bmp_bytes(_bmp_header(w, h, 16, 0, len(body)) + body)
    assert np.allclose(got, [[1 / 3, 1 / 3]])
    # RGB565 via BI_BITFIELDS masks; g=63 full green
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    body = struct.pack("<HH", 0xF800, 0x07E0)
    got = decode_bmp_bytes(
        _bmp_header(w, h, 16, 3, len(body), extra=masks) + body)
    assert np.allclose(got, [[1 / 3, 1 / 3]])


def test_pnm_ascii_p1_p2_p3():
    p1 = b"P1\n# bitmap\n4 2\n0 1 1 0\n1011\n"
    assert np.array_equal(
        decode_pnm_bytes(p1),
        1.0 - np.array([[0, 1, 1, 0], [1, 0, 1, 1]], np.float64))
    p2 = b"P2 3 2 15\n0 5 10 15 1 2\n"
    assert np.array_equal(
        decode_pnm_bytes(p2),
        np.array([[0, 5, 10], [15, 1, 2]], np.float64) / 15.0)
    p3 = b"P3 1 2 255\n10 20 30\n0 255 0\n"
    assert np.allclose(
        decode_pnm_bytes(p3), np.array([[20], [85]], np.float64) / 255.0)


def test_pbm_binary_p4():
    # 10x2: rows byte-align to 2 bytes, MSB first, 1 = black
    body = bytes([0b10110000, 0b01000000,
                  0b00000001, 0b11000000])
    p4 = b"P4\n10 2\n" + body
    bits = np.array([[1, 0, 1, 1, 0, 0, 0, 0, 0, 1],
                     [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]], np.float64)
    assert np.array_equal(decode_pnm_bytes(p4), 1.0 - bits)
    assert np.array_equal(decode_image_bytes(p4), 1.0 - bits)


# ---------------------------------------------------------------------------
# GIF (LZW) decode
# ---------------------------------------------------------------------------

def test_gif_roundtrip_exact():
    """Identity-gray palette makes the GIF path LOSSLESS: decode equals
    the 8-bit input exactly, plain and interlaced."""
    from crossai_ts_ray.functions.imagecodec import (
        decode_gif_bytes,
        encode_gif_gray,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(23, 31)).astype(np.uint8)
    got = decode_gif_bytes(encode_gif_gray(img))
    assert np.array_equal(got, img.astype(np.float64) / 255.0)
    got_i = decode_gif_bytes(encode_gif_gray(img, interlace=True))
    assert np.array_equal(got_i, img.astype(np.float64) / 255.0)
    # dispatch routes GIF too
    assert np.array_equal(
        decode_image_bytes(encode_gif_gray(img)), got)


def test_gif_lzw_kwkwk_case():
    """The cScSc corner of LZW (code == next_code) decoded from a
    hand-built stream: pixels [1,1,1,1] encode as CLEAR,1,6,1,EOI at
    min_code_size=2 -- code 6 arrives BEFORE its dictionary entry
    exists."""
    from crossai_ts_ray.functions.imagecodec import _gif_lzw

    codes = [(4, 3), (1, 3), (6, 3), (1, 3), (5, 3)]
    acc = nacc = 0
    payload = bytearray()
    for code, wd in codes:
        acc |= code << nacc
        nacc += wd
        while nacc >= 8:
            payload.append(acc & 0xFF); acc >>= 8; nacc -= 8
    if nacc:
        payload.append(acc & 0xFF)
    got = _gif_lzw(bytes(payload), 2, 4)
    assert got.tolist() == [1, 1, 1, 1]


def test_gif_local_color_table_and_corrupt():
    """A local color table overrides the global one; a code past the
    dictionary raises loudly."""
    from crossai_ts_ray.functions.imagecodec import (
        _gif_lzw,
        decode_gif_bytes,
        encode_gif_gray,
    )

    img = np.array([[0, 255], [128, 64]], np.uint8)
    data = bytearray(encode_gif_gray(img))
    # strip the GCT flag, move the palette after the image descriptor
    gct = bytes(data[13:13 + 768])
    del data[13:13 + 768]
    data[10] = 0x07            # no GCT, but keep the size bits
    desc_at = data.index(0x2C)
    data[desc_at + 9] |= 0x87  # LCT present, 256 entries
    data[desc_at + 10:desc_at + 10] = gct
    got = decode_gif_bytes(bytes(data))
    assert np.array_equal(got, img.astype(np.float64) / 255.0)

    with pytest.raises(ValueError, match="corrupt"):
        # width-3 LSB-first stream: CLEAR(4='001'lsb) then 7 ('111')
        _gif_lzw(bytes([0x3C]), 2, 2)


def test_gif_animated_frames_roundtrip():
    """Multi-frame GIF: lossless per-frame round-trip, fps from the GCE
    delay, declared seams for transparency and partial frames."""
    from crossai_ts_ray.functions.imagecodec import (
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.default_rng(3)
    clip = rng.integers(0, 256, size=(5, 9, 7)).astype(np.uint8)
    enc = encode_gif_frames(clip, delay_cs=4)  # 25 fps
    frames, fps = decode_gif_frames(enc)
    assert fps == 25.0
    assert np.array_equal(frames, clip.astype(np.float64) / 255.0)

    # transparency flag -> declared seam
    bad = bytearray(enc)
    g = bad.find(b"\x21\xf9\x04")
    bad[g + 3] |= 0x01
    with pytest.raises(NotImplementedError, match="transparency"):
        decode_gif_frames(bytes(bad))
    # partial-canvas frame -> declared seam (skip header + 768B palette
    # when locating the descriptor: palette bytes also hit 0x2C)
    bad2 = bytearray(enc)
    d = bad2.find(b"\x2c", 13 + 768)
    struct.pack_into("<HH", bad2, d + 1, 1, 0)  # x offset 1
    with pytest.raises(NotImplementedError, match="partial-canvas"):
        decode_gif_frames(bytes(bad2))
