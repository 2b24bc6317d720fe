"""Pure-NumPy video decoder: REAL frame decode for YUV4MPEG2 (.y4m)
payloads -- the uncompressed interchange format -- with no codec library.

Completes the multimodal decode triple (functions/wavcodec.py for audio,
functions/imagecodec.py for images): frame-sampling and per-frame feature
stages run on real bitstreams end to end.  Compressed containers
(mp4/h264/vp9/webm) remain behind the declared NotImplementedError seam.

Format: ``YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<colorspace>]\\n`` then per
frame ``FRAME[params]\\n`` + raw planar YUV.  Supported colorspaces: C420
(and its jpeg/paldv variants, same layout), C422, C444, Cmono.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2 "


def _plane_sizes(w: int, h: int, cs: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_total) per frame."""
    y = w * h
    if cs.startswith("420"):
        return y, (w // 2) * (h // 2) * 2
    if cs.startswith("422"):
        return y, (w // 2) * h * 2
    if cs.startswith("444"):
        return y, w * h * 2
    if cs.startswith("mono"):
        return y, 0
    raise NotImplementedError(f"Y4M colorspace C{cs}")


def decode_y4m_bytes(
    data: bytes, max_frames: int | None = None
) -> tuple[np.ndarray, float]:
    """Decode a Y4M payload -> ``(frames, fps)``: luma planes as an
    ``(n_frames, h, w)`` float64 array in [0, 1] (chroma is parsed past,
    not returned -- the feature stages are grayscale)."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    w = h = None
    num, den = 30, 1
    cs = "420"
    for tok in data[len(_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == b"C":
            cs = val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    y_bytes, c_bytes = _plane_sizes(w, h, cs)
    pos = nl + 1
    frames = []
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = data.index(b"\n", pos)
        pos = fnl + 1
        plane = np.frombuffer(data, dtype=np.uint8, count=y_bytes, offset=pos)
        frames.append(plane.reshape(h, w))
        pos += y_bytes + c_bytes
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("Y4M payload has no frames")
    return np.stack(frames).astype(np.float64) / 255.0, num / den


def probe_y4m_header(data: bytes) -> dict:
    """Metadata-only probe: (width, height, fps, colorspace, n_frames)
    computed from the header + fixed frame stride, no pixel decode."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    w = h = None
    num, den = 30, 1
    cs = "420"
    for tok in data[len(_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == b"C":
            cs = val
    y_bytes, c_bytes = _plane_sizes(w, h, cs)
    # walk frames by stride: markers are only valid at computed frame
    # boundaries -- raw pixel bytes may contain the ASCII sequence "FRAME",
    # so a payload-wide count() would overcount (ADVICE r3).  Per-frame
    # params vary the header length, so find each header's newline.
    n = 0
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1 + y_bytes + c_bytes
        n += 1
    return {"width": w, "height": h, "fps": num / den, "colorspace": cs, "n_frames": n}


def encode_y4m_gray(frames: np.ndarray, fps: int = 30) -> bytes:
    """Minimal Cmono Y4M encoder (test fixture / round-trip utility);
    frames: (n, h, w) float in [0, 1]."""
    f = np.clip(np.round(np.asarray(frames, dtype=np.float64) * 255), 0, 255).astype(
        np.uint8
    )
    n, h, w = f.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode())
    for i in range(n):
        out += b"FRAME\n" + f[i].tobytes()
    return bytes(out)
