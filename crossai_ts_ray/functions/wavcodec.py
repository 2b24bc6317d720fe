"""Pure-NumPy WAV (RIFF) decoder: REAL byte-level audio decode with no
external codec library.

Closes the ``wav_loader`` / ``audio_loader`` decode seam
(/root/reference/caits/loading/_audio.py:16-135, which calls
``soundfile.read``): PCM 8/16/24/32-bit and IEEE float32/64 WAV payloads
decode to the same normalized float arrays soundfile produces
(``always_2d=True`` semantics -- (frames, channels); integer PCM scaled by
2^(bits-1), unsigned 8-bit recentered).  Compressed codecs (mp3/flac/ogg)
remain behind the declared NotImplementedError seam -- they need a real
codec library.
"""

from __future__ import annotations

import struct

import numpy as np

#: wFormatTag values
_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def decode_wav_bytes(
    data: bytes, dtype: str = "float64"
) -> tuple[np.ndarray, int]:
    """Decode a WAV payload -> ``(audio, sample_rate)``.

    ``audio`` is ``(frames, channels)`` (soundfile ``always_2d=True``).
    ``dtype`` "float64"/"float32": normalized to [-1, 1) like soundfile
    (int16 / 2^15, int32 / 2^31, uint8 recentered, 24-bit / 2^23);
    "int16"/"int32": raw integer samples when the payload is integer PCM.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, n_ch, sr, _brate, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == _FMT_EXTENSIBLE and size >= 26:
                # wValidBitsPerSample + dwChannelMask + SubFormat GUID
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, n_ch, sr, block_align, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    tag, n_ch, sr, block_align, bits = fmt
    if n_ch <= 0 or sr <= 0:
        raise ValueError(f"invalid WAV header: channels={n_ch} sr={sr}")

    if tag == _FMT_IEEE_FLOAT:
        src = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
        x = src.astype(np.float64)
        scale = None
    elif tag == _FMT_PCM:
        if bits == 8:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            scale = 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
            scale = float(1 << 15)
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.uint32)
            u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            x = u.astype(np.int64)
            x[x >= (1 << 23)] -= 1 << 24
            x = x.astype(np.float64)
            scale = float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64)
            scale = float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    else:
        raise NotImplementedError(
            f"WAV format tag {tag}: compressed codecs need a real codec "
            "library (the declared non-PCM seam)"
        )

    frames = len(x) // n_ch
    x = x[: frames * n_ch].reshape(frames, n_ch)
    if dtype in ("float64", "float32"):
        if scale is not None:
            x = x / scale
        return x.astype(dtype), int(sr)
    if dtype in ("int16", "int32"):
        if scale is None:
            raise ValueError("integer dtype requested for float WAV payload")
        return x.astype(dtype), int(sr)
    raise ValueError(f"unsupported dtype: {dtype}")


def encode_wav_pcm16(audio: np.ndarray, sr: int) -> bytes:
    """Minimal PCM16 WAV encoder (test fixture / round-trip utility).
    ``audio``: (frames,) or (frames, channels) float in [-1, 1]."""
    a = np.asarray(audio, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    pcm = np.clip(np.round(a * (1 << 15)), -(1 << 15), (1 << 15) - 1).astype("<i2")
    body = pcm.reshape(-1).tobytes()
    n_ch = a.shape[1]
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, _FMT_PCM, n_ch, sr, sr * n_ch * 2, n_ch * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body


def decode_audio_bytes(
    data: bytes, dtype: str = "float64"
) -> tuple[np.ndarray, int]:
    """Magic-dispatching audio decode -> ``(audio (frames, channels), sr)``:
    RIFF/WAVE -> :func:`decode_wav_bytes`, fLaC -> the pure-Python FLAC
    decoder (functions/flaccodec.py).  This is the soundfile-transparent
    surface the reference's ``wav_loader``/``audio_loader`` lean on
    (/root/reference/caits/loading/_audio.py:16-135): WAV and FLAC decode
    for real; mp3/ogg remain the declared compressed-codec seam."""
    if data[:4] == b"fLaC":
        from .flaccodec import decode_flac_bytes

        if dtype == "int16":
            a, sr = decode_flac_bytes(data, dtype="int32")
            return a.astype(np.int16), sr
        return decode_flac_bytes(data, dtype=dtype)
    if data[:4] == b"RIFF":
        return decode_wav_bytes(data, dtype=dtype)
    raise NotImplementedError(
        "unrecognized audio container (WAV and FLAC decode for real; "
        "mp3/ogg need a real codec library -- the declared seam)"
    )
