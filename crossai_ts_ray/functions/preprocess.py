"""Preprocessing kernels: the ``caits/preprocessing.py`` + ``_core_fix``
surface as pure NumPy batch functions."""

from __future__ import annotations

import numpy as np


def normalize_signal(x: np.ndarray) -> np.ndarray:
    """Scale to [-1, 1]: int dtypes by their type max, floats by max |x|
    (caits/preprocessing.py:4)."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.integer):
        return x.astype(np.float64) / np.iinfo(x.dtype).max
    peak = np.max(np.abs(x))
    return x.astype(np.float64) / peak if peak > 0 else x.astype(np.float64)


def resample_signal(x: np.ndarray, orig_fs: float, target_fs: float) -> np.ndarray:
    """Linear-interpolation resampling via ``np.interp``
    (caits/preprocessing.py:24-61) -- THE reference semantic the engine's
    linear gap-fill is pinned to."""
    x = np.asarray(x, dtype=np.float64)
    n_out = int(round(len(x) * target_fs / orig_fs))
    t_in = np.arange(len(x)) / orig_fs
    t_out = np.arange(n_out) / target_fs
    return np.interp(t_out, t_in, x)


def resample_2d(x: np.ndarray, orig_fs: float, target_fs: float) -> np.ndarray:
    """Per-channel resampling (caits/preprocessing.py:63; columns=channels)."""
    x = np.asarray(x, dtype=np.float64)
    cols = [resample_signal(x[:, c], orig_fs, target_fs) for c in range(x.shape[1])]
    return np.stack(cols, axis=1)


def trim_signal(x: np.ndarray, epsilon: float = 0.01) -> np.ndarray:
    """Trim leading/trailing samples below ``epsilon * max|x|``
    (caits/preprocessing.py:103)."""
    x = np.asarray(x)
    thr = epsilon * np.max(np.abs(x))
    keep = np.flatnonzero(np.abs(x) >= thr)
    if len(keep) == 0:
        return x[:0]
    return x[keep[0] : keep[-1] + 1]


def fix_length(x: np.ndarray, size: int, axis: int = -1, pad_value=0) -> np.ndarray:
    """Pad (constant) or trim to exactly ``size`` along ``axis``
    (caits/core/_core_fix.py:9)."""
    x = np.asarray(x)
    n = x.shape[axis]
    if n > size:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, size)
        return x[tuple(sl)]
    if n < size:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, size - n)
        return np.pad(x, widths, constant_values=pad_value)
    return x


def create_chunks(x: np.ndarray, chunk_len: int) -> list[np.ndarray]:
    """Fixed-length chunks INCLUDING the ragged tail
    (caits/windowing.py:188 -- ceil count)."""
    n = len(x)
    return [x[i : i + chunk_len] for i in range(0, n, chunk_len)]


def samples_to_time(samples, fs: float):
    """caits/convert.py:81"""
    return np.asarray(samples, dtype=np.float64) / fs


def frames_to_samples(frames, hop_length: int = 512, n_fft: int | None = None):
    """caits/convert.py:100 (librosa convention: optional center offset)."""
    offset = n_fft // 2 if n_fft else 0
    return np.asarray(frames) * hop_length + offset


def times_like(x, fs: float = 1.0, axis=0):
    """caits/convert.py:8 -- time coordinate per sample."""
    return np.arange(np.asarray(x).shape[axis]) / fs


def tiny(x) -> float:
    """Smallest positive normal for the dtype (float32 tiny for non-float
    inputs; caits/core/_core_window.py:212)."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating) or np.issubdtype(
        x.dtype, np.complexfloating
    ):
        dtype = x.dtype
    else:
        dtype = np.dtype(np.float32)
    return np.finfo(dtype).tiny


def normalize(S: np.ndarray, norm=np.inf, axis: int | None = 0,
              threshold=None, fill=None) -> np.ndarray:
    """lp / inf / min / l0 normalization along an axis with small-norm
    threshold handling (caits/core/_core_window.py:134, librosa semantics):
    norm=inf -> max|.|, -inf -> min|.|, 0 -> count of nonzeros, p>0 -> lp
    norm, None -> passthrough.  fill=None leaves small columns unscaled,
    False zeroes them, True fills with the unit-norm constant."""
    S = np.asarray(S)
    if threshold is None:
        threshold = tiny(S)
    elif threshold <= 0:
        raise ValueError(f"threshold={threshold} must be strictly positive")
    if fill not in (None, False, True):
        raise ValueError(f"fill={fill} must be None or boolean")
    if not np.all(np.isfinite(S)):
        raise ValueError("Input must be finite")

    mag = np.abs(S).astype(float)
    fill_norm = 1
    if norm is None:
        return S
    elif norm == np.inf:
        length = np.max(mag, axis=axis, keepdims=True)
    elif norm == -np.inf:
        length = np.min(mag, axis=axis, keepdims=True)
    elif norm == 0:
        if fill is True:
            raise ValueError("Cannot normalize with norm=0 and fill=True")
        length = np.sum(mag > 0, axis=axis, keepdims=True, dtype=mag.dtype)
    elif np.issubdtype(type(norm), np.number) and norm > 0:
        length = np.sum(mag**norm, axis=axis, keepdims=True) ** (1.0 / norm)
        if axis is None:
            fill_norm = mag.size ** (-1.0 / norm)
        else:
            fill_norm = mag.shape[axis] ** (-1.0 / norm)
    else:
        raise ValueError(f"Unsupported norm: {norm!r}")

    small_idx = length < threshold
    Snorm = np.empty_like(S, dtype=float)
    if fill is None:
        length[small_idx] = 1.0
        Snorm[:] = S / length
    elif fill:
        length[small_idx] = np.nan
        Snorm[:] = S / length
        Snorm[np.isnan(Snorm)] = fill_norm
    else:
        length[small_idx] = np.inf
        Snorm[:] = S / length
    return Snorm


def _resample_fourier(x: np.ndarray, num: int) -> np.ndarray:
    """Fourier-method resampling to ``num`` samples (the scipy.signal.resample
    real-input recipe: rfft, truncate/zero-pad the spectrum with the even-N
    Nyquist-bin correction, irfft scaled by num/n)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    X = np.fft.rfft(x)
    Y = np.zeros(num // 2 + 1, dtype=complex)
    N = min(num, n)
    nyq = N // 2 + 1
    Y[:nyq] = X[:nyq]
    if N % 2 == 0:
        if num < n:
            Y[N // 2] *= 2.0
        elif num > n:
            Y[N // 2] *= 0.5
    return np.fft.irfft(Y, num) * (float(num) / float(n))


def _kaiser_sinc_filter(up: int, down: int, half_len_mult: int = 10,
                        beta: float = 5.0) -> np.ndarray:
    """Kaiser-windowed-sinc lowpass for polyphase resampling (the
    scipy.signal.resample_poly default design: cutoff 1/max(up,down) in
    Nyquist units, half-length 10*max(up,down), ('kaiser', 5.0) window,
    unity DC gain)."""
    max_rate = max(up, down)
    half_len = half_len_mult * max_rate
    n = np.arange(2 * half_len + 1) - half_len
    # sinc lowpass at normalized cutoff f_c = 1/max_rate (cycles/sample of
    # the UPSAMPLED stream), windowed; normalize to unity DC gain
    f_c = 1.0 / max_rate
    h = f_c * np.sinc(f_c * n) * np.kaiser(2 * half_len + 1, beta)
    return h / np.sum(h)


def _resample_polyphase(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Polyphase rational resampling (zero-stuff by ``up``, Kaiser-sinc FIR,
    decimate by ``down``) with the filter's group delay compensated so
    output sample k sits at input time k*down/up. Pure NumPy rendition of
    the scipy ``resample_poly``/``upfirdn`` semantics the reference reaches
    through librosa's 'polyphase' res_type (caits/core/_core_resample.py)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    h = _kaiser_sinc_filter(up, down) * up  # *up restores amplitude lost to zero-stuffing
    n_out = int(np.ceil(n * up / down))
    xs = np.zeros(n * up + len(h) - 1)
    xs[: n * up : up] = x
    y = np.convolve(xs, h)[: n * up + len(h) - 1]
    delay = (len(h) - 1) // 2
    idx = delay + down * np.arange(n_out)
    return y[idx]


_SINC_MODES = {
    # windowed-sinc design constants (resampy's PUBLISHED filter designs --
    # num zero-crossings, Kaiser beta, rolloff; the textbook band-limited
    # interpolation method of Smith, "Digital Audio Resampling", CCRMA):
    "kaiser_best": (64, 14.769656459379492, 0.9475937167399596),
    "kaiser_fast": (16, 8.555504641634386, 0.85),
}


def _sinc_resample(y: np.ndarray, orig_sr: float, target_sr: float,
                   num_zeros: int, beta: float, rolloff: float) -> np.ndarray:
    """Band-limited sinc interpolation at arbitrary (non-rational) rate
    ratios: each output sample is a Kaiser-windowed-sinc weighted sum of the
    input samples within ``num_zeros`` zero-crossings, with the filter
    stretched by 1/ratio when downsampling (anti-aliasing).  Fully
    vectorized: one (n_out x taps) gather + weight matrix, no Python loop.
    Clean-room implementation of the algorithm family behind resampy's
    kaiser_best/kaiser_fast modes (caits/core/_core_resample.py reaches it
    through librosa); same design constants, not the library's precomputed
    interpolated tables, so outputs agree to filter precision rather than
    bitwise."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    ratio = float(target_sr) / float(orig_sr)
    n_out = int(np.ceil(n * ratio))
    # filter scale: stretch the sinc when downsampling so its cutoff tracks
    # the OUTPUT Nyquist
    scale = min(1.0, ratio)
    half_width = int(np.ceil(num_zeros / scale)) + 1
    pos = np.arange(n_out, dtype=np.float64) / ratio  # output k at input time
    base = np.floor(pos).astype(np.int64)
    offs = np.arange(-half_width, half_width + 1, dtype=np.int64)
    idx = base[:, None] + offs[None, :]
    t = pos[:, None] - idx  # distance in input samples
    ts = t * scale * rolloff
    # Kaiser window evaluated continuously: i0(beta*sqrt(1-(x/zeros)^2))/i0(beta)
    xw = t * scale / num_zeros
    inside = np.abs(xw) < 1.0
    w = np.zeros_like(t)
    w[inside] = np.i0(beta * np.sqrt(1.0 - xw[inside] ** 2)) / np.i0(beta)
    taps = np.sinc(ts) * w * scale * rolloff
    valid = (idx >= 0) & (idx < n)
    gathered = np.where(valid, y[np.clip(idx, 0, n - 1)], 0.0)
    return (gathered * taps * valid).sum(axis=1)


_SOXR_FALLBACK = {
    "soxr_vhq": "kaiser_best",
    "soxr_hq": "kaiser_best",
    "soxr_mq": "kaiser_fast",
    "soxr_lq": "kaiser_fast",
}


def resample(y: np.ndarray, orig_sr: float, target_sr: float,
             res_type: str = "linear", scale: bool = False,
             soxr_fallback: bool = False) -> np.ndarray:
    """librosa-style resample dispatch (caits/core/_core_resample.py:14):
    output length ceil(n * target/orig); ``res_type`` 'linear' (np.interp),
    'fft' (Fourier method), 'polyphase' (integer rates),
    'kaiser_best'/'kaiser_fast' (band-limited sinc interpolation, any
    ratio).  soxr modes need the soxr library (absent in this container)
    and raise with that pointer -- UNLESS ``soxr_fallback=True``, which
    routes them to the quality-matched band-limited sinc kernel
    (vhq/hq -> kaiser_best, mq/lq -> kaiser_fast; same anti-aliasing
    contract, NOT bit-identical to libsoxr).  ``scale=True`` rescales so
    the energy (sum of squares) is approximately preserved."""
    y = np.asarray(y, dtype=np.float64)
    if orig_sr == target_sr:
        return y.copy()
    ratio = float(target_sr) / float(orig_sr)
    n_out = int(np.ceil(len(y) * ratio))
    if res_type == "linear":
        t_in = np.arange(len(y)) / orig_sr
        t_out = np.arange(n_out) / target_sr
        out = np.interp(t_out, t_in, y)
    elif res_type == "fft":
        out = _resample_fourier(y, n_out)
    elif res_type == "polyphase":
        import math

        up, down = int(target_sr), int(orig_sr)
        if up != target_sr or down != orig_sr:
            raise ValueError("polyphase resampling requires integer rates")
        g = math.gcd(up, down)
        out = _resample_polyphase(y, up // g, down // g)
    elif res_type in _SINC_MODES:
        out = _sinc_resample(y, orig_sr, target_sr, *_SINC_MODES[res_type])
    elif res_type in _SOXR_FALLBACK:
        if not soxr_fallback:
            raise NotImplementedError(
                f"res_type={res_type!r} needs the soxr library (absent in "
                "this container); pass soxr_fallback=True to route to the "
                f"quality-matched {_SOXR_FALLBACK[res_type]!r} sinc kernel, "
                "or use 'kaiser_best', 'linear', 'fft' or 'polyphase'"
            )
        out = _sinc_resample(
            y, orig_sr, target_sr, *_SINC_MODES[_SOXR_FALLBACK[res_type]]
        )
    else:
        raise ValueError(f"unknown res_type {res_type!r}")
    if scale:
        out = out / np.sqrt(ratio)
    return out
