"""Pure-NumPy image decoders: REAL byte-level decode for PNG, BMP and
PGM/PPM payloads with no codec library (zlib is stdlib).

Closes the image half of the multimodal decode seam the way
functions/wavcodec.py closes the audio half: the formats whose bitstreams
are tractable without a codec dependency decode for real (baseline JPEG
decodes for real too, via functions/jpegcodec.py); WebP/GIF remain behind
the declared NotImplementedError seam (they need a real codec library).
Output convention: ``(height, width)`` float64 grayscale in [0, 1]
(color inputs are luma-averaged) -- the shape the feature stages consume.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int,
                  bps: int = 1) -> np.ndarray:
    """Reverse PNG scanline filters (spec 9.2): per-row filter byte, then
    None/Sub/Up/Average/Paeth.  Filtering is BYTE-wise with the left
    neighbor ``ch * bps`` bytes back (bps = bytes per sample, 2 for
    16-bit), so the same kernel serves 8- and 16-bit images.  Rows are
    sequential by construction; the per-row math is vectorized where the
    filter allows (Up/None fully, Sub/Paeth carry a left-neighbor
    dependency along the row)."""
    ch = ch * bps  # left-neighbor distance in bytes
    stride = w * ch
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        row = data[y].copy()
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub
            cur = row
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif f == 3:  # Average
            cur = row
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, ch)


_ADAM7 = (  # (x_start, y_start, x_step, y_step) per pass
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_deinterlace(raw: np.ndarray, w: int, h: int, ch: int,
                     bps: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images scattered onto the
    (h, w) grid (PNG spec 8.2)."""
    out = np.zeros((h, w, ch * bps), np.uint8)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        nbytes = ph * (1 + pw * ch * bps)
        sub = _png_unfilter(raw[pos:pos + nbytes], ph, pw, ch, bps=bps)
        out[y0::ys, x0::xs] = sub
        pos += nbytes
    return out


def decode_png_bytes(data: bytes) -> np.ndarray:
    """PNG -> (h, w) float64 grayscale in [0, 1] (channel
    mean over color, alpha dropped).  Covers 8- and 16-bit gray /
    gray+alpha / RGB / RGBA plus 8-bit PALETTE images (PLTE lookup),
    both progressive (Adam7 interlaced) and non-interlaced; sub-byte
    depths stay behind the declared seam."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    bit_depth = color_type = None
    interlace = 0
    idat = b""
    plte = None
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        cid = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"PNG bit depth {bit_depth} out of spec")
            pass  # interlace handled below (Adam7)
        elif cid == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + size  # len + type + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth < 8:  # sub-byte gray / palette: unpack after unfilter
        if color_type not in (0, 3):
            raise ValueError(
                f"PNG color type {color_type} cannot be {bit_depth}-bit"
            )
        if interlace:
            raise NotImplementedError("interlaced sub-byte PNG")
        rowbytes = (w * bit_depth + 7) // 8
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
        # filters on sub-byte rows are byte-wise with a 1-byte left step
        packed = _png_unfilter(raw, h, rowbytes, 1)[:, :, 0]
        bits = np.unpackbits(packed, axis=1)  # MSB-first per spec
        samples = bits[:, : w * bit_depth].reshape(h, w, bit_depth)
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        vals = (samples * weights).sum(axis=2)
        if color_type == 0:
            return vals.astype(np.float64) / float((1 << bit_depth) - 1)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[vals].astype(np.float64).mean(axis=2) / 255.0
    if color_type == 3:  # 8-bit palette: indices -> PLTE RGB rows
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
        idx = (_png_deinterlace(raw, w, h, 1, 1)[:, :, 0] if interlace
               else _png_unfilter(raw, h, w, 1)[:, :, 0])
        return plte[idx].astype(np.float64).mean(axis=2) / 255.0
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if ch is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    bps = bit_depth // 8
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    px = (_png_deinterlace(raw, w, h, ch, bps) if interlace
          else _png_unfilter(raw, h, w, ch, bps=bps)).astype(np.float64)
    if bps == 2:  # combine big-endian byte pairs into one sample channel
        px = px.reshape(h, w, ch, 2)
        px = px[:, :, :, 0] * 256.0 + px[:, :, :, 1]
        scale = 65535.0
    else:
        scale = 255.0
    if color_type == 0:
        g = px[:, :, 0]
    elif color_type == 2:
        g = px.mean(axis=2)
    elif color_type == 4:
        g = px[:, :, 0]
    else:  # RGBA
        g = px[:, :, :3].mean(axis=2)
    return g / scale


def _bmp_rle8(data: bytes, off: int, w: int, h: int) -> np.ndarray:
    """BI_RLE8 decompression (BMP spec): (count, value) runs plus the
    escape codes 0=EOL, 1=EOB, 2=delta, n>=3 absolute (word-padded)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    i = off
    while i + 1 < len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:  # run
            out[y, x:x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: v literal bytes, padded to 16-bit
            out[y, x:x + v] = np.frombuffer(data, np.uint8, v, i)
            x += v
            i += v + (v & 1)
    return out


def _bmp_rle4(data: bytes, off: int, w: int, h: int) -> np.ndarray:
    """BI_RLE4 decompression (BMP spec): runs ALTERNATE the two nibbles of
    the value byte; absolute mode packs 2 pixels/byte, word-padded."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    i = off
    while i + 1 < len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:  # run: hi, lo, hi, lo, ...
            run = np.empty(n, np.uint8)
            run[0::2] = v >> 4
            run[1::2] = v & 0x0F
            out[y, x:x + n] = run
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: v pixels, 2 per byte, padded to 16-bit
            nb = (v + 1) // 2
            packed = np.frombuffer(data, np.uint8, nb, i)
            pix = np.empty(nb * 2, np.uint8)
            pix[0::2] = packed >> 4
            pix[1::2] = packed & 0x0F
            out[y, x:x + v] = pix[:v]
            x += v
            i += nb + (nb & 1)
    return out


def _mask_channel(px: np.ndarray, mask: int) -> np.ndarray:
    """Extract one BI_BITFIELDS channel, normalized to [0, 1] by the
    mask's own depth."""
    if mask == 0:
        return np.zeros(px.shape, np.float64)
    shift = (mask & -mask).bit_length() - 1
    depth = (mask >> shift)
    return ((px >> shift) & depth).astype(np.float64) / float(depth)


def decode_bmp_bytes(data: bytes) -> np.ndarray:
    """4/8/16/24/32-bit BMP (uncompressed, BI_RLE8/RLE4, or 16-bit
    BI_BITFIELDS/RGB555) -> (h, w) float64 grayscale in [0, 1]."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    flip = h > 0
    if compression == 1:  # BI_RLE8
        if bpp != 8:
            raise ValueError("BI_RLE8 requires 8 bpp")
        g = _bmp_rle8(data, off, w, abs(h)).astype(np.float64)
        return (g[::-1] if flip else g) / 255.0
    if compression == 2:  # BI_RLE4
        if bpp != 4:
            raise ValueError("BI_RLE4 requires 4 bpp")
        g = _bmp_rle4(data, off, w, abs(h)).astype(np.float64)
        return (g[::-1] if flip else g) / 15.0
    if compression not in (0, 3):
        raise NotImplementedError(
            f"BMP compression {compression} (0/RLE8/RLE4/BITFIELDS only)"
        )
    h = abs(h)
    if bpp == 16:
        # RGB555 when BI_RGB; explicit masks (e.g. RGB565) for BITFIELDS
        if compression == 3:
            rm, gm, bm = struct.unpack_from("<III", data, 54)
        else:
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F
        stride = (w * 2 + 3) & ~3
        raw = np.frombuffer(data, np.uint8, stride * h, off)
        px = raw.reshape(h, stride)[:, : w * 2].reshape(h, w, 2)
        v = px[:, :, 0].astype(np.uint32) | (
            px[:, :, 1].astype(np.uint32) << 8)
        g = (_mask_channel(v, rm) + _mask_channel(v, gm)
             + _mask_channel(v, bm)) / 3.0
        return g[::-1] if flip else g
    if compression == 3:
        raise NotImplementedError("BI_BITFIELDS only supported at 16 bpp")
    if bpp == 4:
        stride = ((w + 1) // 2 + 3) & ~3
        raw = np.frombuffer(data, np.uint8, stride * h, off)
        rows = raw.reshape(h, stride)[:, : (w + 1) // 2]
        pix = np.empty((h, rows.shape[1] * 2), np.uint8)
        pix[:, 0::2] = rows >> 4
        pix[:, 1::2] = rows & 0x0F
        g = pix[:, :w].astype(np.float64) / 15.0
        return g[::-1] if flip else g
    nch = bpp // 8
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bpp {bpp}")
    stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    px = px.reshape(h, stride)[:, : w * nch].reshape(h, w, nch).astype(np.float64)
    g = px[:, :, 0] if nch == 1 else px[:, :, : min(nch, 3)].mean(axis=2)
    if flip:  # BMP rows are bottom-up when height is positive
        g = g[::-1]
    return g / 255.0


def decode_pnm_bytes(data: bytes) -> np.ndarray:
    """The full PNM family -> (h, w) float64 grayscale in [0, 1]:
    binary PGM/PPM (P5/P6, 8- and 16-bit), binary PBM (P4: 1 bit/pixel,
    MSB-first, rows byte-aligned, 1 = BLACK per spec), and the ASCII
    variants P1/P2/P3."""
    magic = data[:2]
    if magic in (b"P1", b"P2", b"P3"):
        return _decode_pnm_ascii(data)
    if magic == b"P4":
        return _decode_pbm_binary(data)
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a PNM payload")
    nch = 1 if magic == b"P5" else 3
    # header: magic, whitespace/comment-separated width height maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 65535:
        raise ValueError(f"PNM maxval {maxval} out of spec")
    if maxval > 255:  # 16-bit PNM: big-endian two-byte samples (spec)
        px = np.frombuffer(data, dtype=">u2", count=w * h * nch, offset=pos)
    else:
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * nch,
                           offset=pos)
    px = px.reshape(h, w, nch).astype(np.float64)
    g = px[:, :, 0] if nch == 1 else px.mean(axis=2)
    return g / maxval


def _strip_pnm_comments(data: bytes) -> list[bytes]:
    """Whitespace-split PNM text with '#...' comments removed."""
    lines = []
    for ln in data.split(b"\n"):
        hash_at = ln.find(b"#")
        lines.append(ln if hash_at < 0 else ln[:hash_at])
    return b"\n".join(lines).split()


def _decode_pnm_ascii(data: bytes) -> np.ndarray:
    """ASCII P1 (bitmap, 1=black), P2 (graymap), P3 (pixmap)."""
    magic = data[:2]
    toks = _strip_pnm_comments(data[2:])
    w, h = int(toks[0]), int(toks[1])
    if magic == b"P1":
        # P1 samples may run together without whitespace ("0110")
        bits = np.frombuffer(b"".join(toks[2:]), np.uint8) - ord("0")
        if len(bits) < w * h:
            raise ValueError("truncated P1 payload")
        g = bits[: w * h].reshape(h, w).astype(np.float64)
        return 1.0 - g  # 1 = black
    maxval = int(toks[2])
    nch = 1 if magic == b"P2" else 3
    vals = np.array(toks[3 : 3 + w * h * nch], dtype=np.float64)
    if len(vals) < w * h * nch:
        raise ValueError("truncated ASCII PNM payload")
    px = vals.reshape(h, w, nch)
    g = px[:, :, 0] if nch == 1 else px.mean(axis=2)
    return g / maxval


def _decode_pbm_binary(data: bytes) -> np.ndarray:
    """Binary PBM (P4): rows packed MSB-first, byte-aligned; 1 = black."""
    pos, fields = 2, []
    while len(fields) < 2:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after height
    w, h = fields
    stride = (w + 7) // 8
    raw = np.frombuffer(data, np.uint8, stride * h, pos)
    bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
    return 1.0 - bits.astype(np.float64)  # 1 = black


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Magic-byte dispatch -> (h, w) float64 grayscale in [0, 1].
    JPEG/WebP/GIF raise: the declared compressed-codec seam."""
    if data.startswith(_PNG_MAGIC):
        return decode_png_bytes(data)
    if data[:2] == b"BM":
        return decode_bmp_bytes(data)
    if data[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        return decode_pnm_bytes(data)
    if data[:3] == b"\xff\xd8\xff":
        from .jpegcodec import decode_jpeg_bytes

        return decode_jpeg_bytes(data)
    if data[:3] == b"GIF":
        return decode_gif_bytes(data)
    if data[:4] == b"RIFF":
        raise NotImplementedError(
            "WebP decode needs a real codec library (declared seam)"
        )
    raise ValueError("unrecognized image payload")


def _gif_lzw(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF's variable-width LSB-first LZW (GIF89a spec appendix).  The
    code loop is sequential by construction (each code can extend the
    dictionary the next code uses); entries are stored as (prefix, tail)
    pairs so no Python string concat happens per code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    pows = [(1 << np.arange(n)).astype(np.int64) for n in range(13)]
    out = np.empty(npix, np.uint8)
    nout = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal pos
        b = bits[pos:pos + width]
        if len(b) < width:
            return eoi
        pos += width
        return int(b @ pows[width])

    # dictionary: prefix code + tail byte; roots have prefix -1
    prefix = np.full(4096, -1, np.int32)
    tail = np.zeros(4096, np.uint8)
    tail[:clear] = np.arange(clear, dtype=np.uint8)
    first = np.zeros(4096, np.uint8)  # first pixel of each sequence
    first[:clear] = np.arange(clear, dtype=np.uint8)
    length = np.zeros(4096, np.int32)
    length[:clear] = 1

    def reset():
        return clear + 2, min_code_size + 1

    next_code, width = reset()
    prev = -1
    buf = np.empty(4096, np.uint8)  # one expanded sequence (max 4096)
    while nout < npix:
        code = read_code(width)
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            break
        if code < next_code and length[code]:
            cur = code
        elif code == next_code and prev >= 0:
            cur = -1  # the KwKwK case: sequence = prev + first(prev)
        else:
            raise ValueError("corrupt GIF LZW stream")
        # expand current sequence (walk the prefix chain backwards)
        if cur >= 0:
            ln = int(length[cur])
            c = cur
            for i in range(ln - 1, -1, -1):
                buf[i] = tail[c]
                c = prefix[c]
        else:
            ln = int(length[prev]) + 1
            c = prev
            buf[ln - 1] = first[prev]
            for i in range(ln - 2, -1, -1):
                buf[i] = tail[c]
                c = prefix[c]
        take = min(ln, npix - nout)
        out[nout:nout + take] = buf[:take]
        nout += take
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = buf[0] if cur < 0 else first[cur]
            first[next_code] = first[prev]
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code if cur >= 0 else next_code - 1
    if nout < npix:
        raise ValueError("truncated GIF pixel data")
    return out


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _iter_gif_frames(data: bytes):
    """Yield (gray_frame, delay_cs) for each full-canvas image block.
    Partial-canvas frames and transparency compositing need a real GIF
    renderer (declared seam)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    i = 13
    gct = None
    if flags & 0x80:
        ngct = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, ngct * 3, i).reshape(-1, 3)
        i += ngct * 3
    delay_cs = 0
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension: label + sub-blocks
            label = data[i + 1]
            i += 2
            if label == 0xF9 and data[i] >= 4:  # graphic control
                gflags, delay_cs = data[i + 1], struct.unpack_from(
                    "<H", data, i + 2)[0]
                if gflags & 0x01:
                    raise NotImplementedError(
                        "GIF transparency compositing (declared seam)")
            while data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", data, i + 1)
            if (x, y, w, h) != (0, 0, sw, sh):
                raise NotImplementedError(
                    "partial-canvas GIF frame compositing (declared seam)")
            i += 10
            ct = gct
            if iflags & 0x80:
                nlct = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, nlct * 3, i).reshape(-1, 3)
                i += nlct * 3
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code = data[i]
            i += 1
            lzw = bytearray()
            while data[i] != 0:
                n = data[i]
                lzw += data[i + 1 : i + 1 + n]
                i += 1 + n
            i += 1  # block terminator
            idx = _gif_lzw(bytes(lzw), min_code, w * h).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = np.concatenate(
                    [np.arange(s, h, step) for s, step in _GIF_INTERLACE])
                un = np.empty_like(idx)
                un[rows] = idx
                idx = un
            yield ct[idx].mean(axis=2) / 255.0, delay_cs
        elif b == 0x3B:  # trailer
            return
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def decode_gif_bytes(data: bytes) -> np.ndarray:
    """GIF87a/89a FIRST frame -> (h, w) float64 grayscale in [0, 1]
    (palette RGB averaged, the house color convention).  Interlaced
    images are de-interlaced per the four-pass spec order."""
    for frame, _delay in _iter_gif_frames(data):
        return frame
    raise ValueError("GIF without an image block")


def decode_gif_frames(data: bytes) -> tuple[np.ndarray, float]:
    """Animated GIF -> ``(frames, fps)``: (n, h, w) float64 grayscale plus
    the frame rate implied by the first nonzero frame delay (GIF delays
    are centiseconds; 10 fps when absent) -- the video-modality shape
    ``decode_y4m_bytes`` returns, so the frame-sample stage dispatches on
    magic bytes alone."""
    frames = []
    fps = 10.0
    for frame, delay_cs in _iter_gif_frames(data):
        if not frames and delay_cs:
            fps = 100.0 / delay_cs
        frames.append(frame)
    if not frames:
        raise ValueError("GIF without an image block")
    return np.stack(frames), fps


def _gif_image_block(a: np.ndarray, interlace: bool) -> bytes:
    """One image descriptor + UNCOMPRESSED-style LZW data (root codes
    with periodic clears so codes never widen past 9 bits)."""
    h, w = a.shape
    out = bytearray()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    min_code = 8
    out.append(min_code)
    clear, eoi = 256, 257
    width = 9
    if interlace:
        rows = np.concatenate(
            [np.arange(s, h, step) for s, step in _GIF_INTERLACE])
        a = a[rows]
    pix = a.ravel()
    bits = [(clear, width)]
    for j, p in enumerate(pix):
        if j and j % 253 == 0:
            bits.append((clear, width))
        bits.append((int(p), width))
    bits.append((eoi, width))
    acc = 0
    nacc = 0
    payload = bytearray()
    for code, wd in bits:  # pack LSB-first
        acc |= code << nacc
        nacc += wd
        while nacc >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        payload.append(acc & 0xFF)
    for k in range(0, len(payload), 255):
        blk = payload[k:k + 255]
        out.append(len(blk))
        out += blk
    out.append(0)  # block terminator
    return bytes(out)


def _gif_header(w: int, h: int) -> bytes:
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out += pal.tobytes()
    return bytes(out)


def _to_u8(img: np.ndarray) -> np.ndarray:
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    return a


def encode_gif_gray(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal GIF89a encoder for fixtures: 8-bit IDENTITY grayscale
    palette (decode is lossless), uncompressed-style LZW -- trivially
    spec-legal output any GIF decoder must accept."""
    a = _to_u8(img)
    return (_gif_header(a.shape[1], a.shape[0])
            + _gif_image_block(a, interlace) + b"\x3b")


def encode_gif_frames(frames: np.ndarray, delay_cs: int = 10) -> bytes:
    """Animated GIF89a fixture: one graphic-control extension (frame
    delay in centiseconds, no transparency) per full-canvas frame."""
    f = _to_u8(frames)
    n, h, w = f.shape
    out = bytearray(_gif_header(w, h))
    gce = b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
    for i in range(n):
        out += gce
        out += _gif_image_block(f[i], interlace=False)
    out += b"\x3b"
    return bytes(out)


def encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (test fixture / round-trip
    utility); img: (h, w) float in [0, 1]."""
    a = np.clip(np.round(np.asarray(img, dtype=np.float64) * 255), 0, 255).astype(
        np.uint8
    )
    h, w = a.shape
    raw = np.concatenate(
        [np.concatenate(([0], row)).astype(np.uint8) for row in a]
    ).tobytes()

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
