"""Augmentation kernels: the ``caits/augmentation/_augment_1d.py`` surface as
deterministic (seeded) NumPy functions.  Every random op takes an explicit
``seed`` so distributed retries are bitwise-stable (the reference threads
``seed`` the same way, e.g. _augment_1d.py:70)."""

from __future__ import annotations

import numpy as np


def _rng(seed):
    return np.random.default_rng(seed)


def add_white_noise(x, snr_db: float = 20.0, seed: int = 0):
    """White noise at a target SNR (caits/augmentation/_augment_1d.py:12)."""
    x = np.asarray(x, dtype=np.float64)
    p_sig = (x**2).mean()
    p_noise = p_sig / (10 ** (snr_db / 10.0))
    return x + _rng(seed).normal(0.0, np.sqrt(p_noise), x.shape)


def random_gain(x, min_gain: float = 0.5, max_gain: float = 1.5, seed: int = 0):
    """_augment_1d.py (random_gain)."""
    g = _rng(seed).uniform(min_gain, max_gain)
    return np.asarray(x, dtype=np.float64) * g


def polarity_inversion(x):
    """_augment_1d.py (polarity_inversion)."""
    return -np.asarray(x)


def drift_ts(x, max_drift: float = 0.1, n_points: int = 10, seed: int = 0):
    """Smooth additive drift (tsaug AddDrift shape; _augment_1d.py drift)."""
    x = np.asarray(x, dtype=np.float64)
    anchors = _rng(seed).uniform(-max_drift, max_drift, n_points)
    drift = np.interp(
        np.linspace(0, 1, len(x)), np.linspace(0, 1, n_points), anchors
    )
    return x + drift * (np.abs(x).max() or 1.0)


def dropout_ts(x, p: float = 0.05, fill: str = "ffill", seed: int = 0):
    """Random sample dropout with fill policy (\"ffill\" | \"bfill\" | \"mean\")
    -- _augment_1d.py:324,344-350.  ``ffill`` is THE reference LOCF semantic
    the engine's gap-fill is pinned to (leading dropped samples keep their
    original value under ffill-with-no-predecessor -> stay as-filled-by-bfill
    in the reference; here leading gaps fall back to the first valid value)."""
    x = np.asarray(x, dtype=np.float64).copy()
    n = len(x)
    drop = _rng(seed).random(n) < p
    if fill == "mean":
        x[drop] = x[~drop].mean() if (~drop).any() else 0.0
        return x
    idx = np.arange(n)
    if fill == "ffill":
        valid = np.where(~drop, idx, -1)
        carry = np.maximum.accumulate(valid)
        has_prev = carry >= 0
        x[drop & has_prev] = x[carry[drop & has_prev]]
        # leading gap: backfill from first valid
        lead = drop & ~has_prev
        if lead.any() and (~drop).any():
            x[lead] = x[idx[~drop][0]]
        return x
    if fill == "bfill":
        valid = np.where(~drop, idx, n)
        carry = np.minimum.accumulate(valid[::-1])[::-1]
        has_next = carry < n
        x[drop & has_next] = x[carry[drop & has_next]]
        tail = drop & ~has_next
        if tail.any() and (~drop).any():
            x[tail] = x[idx[~drop][-1]]
        return x
    raise ValueError(fill)


def crop_ts(x, size: int, seed: int = 0):
    """Random contiguous crop (_augment_1d.py crop)."""
    x = np.asarray(x)
    if len(x) <= size:
        return x
    start = int(_rng(seed).integers(0, len(x) - size + 1))
    return x[start : start + size]


def reverse_ts(x):
    """_augment_1d.py reverse."""
    return np.asarray(x)[::-1]


def quantize_ts(x, n_levels: int = 16):
    """Amplitude quantization to n uniform levels (_augment_1d.py quantize)."""
    x = np.asarray(x, dtype=np.float64)
    lo, hi = x.min(), x.max()
    if hi == lo:
        return x
    q = np.round((x - lo) / (hi - lo) * (n_levels - 1))
    return q / (n_levels - 1) * (hi - lo) + lo


def pool_ts(x, size: int = 4, mode: str = "mean"):
    """Pooling that keeps length (repeat pooled values; _augment_1d.py pool)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    pads = (-n) % size
    xp = np.pad(x, (0, pads), mode="edge") if pads else x
    blocks = xp.reshape(-1, size)
    agg = {"mean": blocks.mean, "max": blocks.max, "min": blocks.min}[mode](axis=1)
    return np.repeat(agg, size)[:n]


def resize_ts(x, size: int):
    """Linear-interp resize (tsaug Resize; _augment_1d.py resize) -- same
    np.interp semantic as preprocess.resample_signal."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == size:
        return x.copy()
    return np.interp(
        np.linspace(0.0, len(x) - 1.0, size), np.arange(len(x), dtype=np.float64), x
    )


def time_stretch_fft(x, rate: float):
    """Phase-vocoder time stretch (caits/augmentation ``time_stretch_ts`` via
    STFT + phase vocoder, _augment_1d.py:~700); uses functions.spectral."""
    from .spectral import istft, phase_vocoder, stft

    S = stft(np.asarray(x, dtype=np.float64))
    S2 = phase_vocoder(S, rate)
    return istft(S2, length=int(round(len(x) / rate)))


_WINDOWS = {
    "hann": np.hanning,
    "hamming": np.hamming,
    "blackman": np.blackman,
    "bartlett": np.bartlett,
    "boxcar": lambda n: np.ones(n),
}


def convolve_ts(x, window: str = "hann", kernel: int = 7):
    """Length-preserving smoothing convolution with a normalized window
    kernel (caits/augmentation/_augment_1d.py:144 delegates to
    tsaug.Convolve; same semantic: 'same'-mode convolution, kernel summing
    to 1 so the signal level is preserved)."""
    x = np.asarray(x, dtype=np.float64)
    if window not in _WINDOWS:
        raise ValueError(f"unknown window {window!r}")
    k = _WINDOWS[window](kernel).astype(np.float64)
    k /= k.sum()
    return np.convolve(x, k, mode="same")


def time_warp_ts(x, n_speed_change: int = 3, max_speed_ratio: float = 3.0,
                 seed: int = 0):
    """Random smooth monotonic time warp, length-preserving
    (caits/augmentation/_augment_1d.py:598 delegates to tsaug.TimeWarp;
    same semantic: ``n_speed_change + 1`` segments with speeds whose max/min
    ratio is bounded by ``max_speed_ratio``, piecewise-linear cumulative time
    curve, linear resampling back onto the original grid).  Seeded
    deterministic."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2:
        return x.copy()
    rng = _rng(seed)
    speeds = rng.uniform(1.0, float(max_speed_ratio), n_speed_change + 1)
    # segment boundaries in source time
    seg = np.linspace(0, n - 1, n_speed_change + 2)
    # cumulative warped time at boundaries (piecewise-linear, monotone)
    seg_len = np.diff(seg)
    warped = np.concatenate(([0.0], np.cumsum(seg_len * speeds)))
    warped *= (n - 1) / warped[-1]  # normalize so endpoints map to endpoints
    # source position for each output sample: invert the warp curve
    src = np.interp(np.arange(n, dtype=np.float64), warped, seg)
    return np.interp(src, np.arange(n, dtype=np.float64), x)


def pitch_shift_ts(x, sr: float, n_steps: float, bins_per_octave: int = 12):
    """Pitch shift by ``n_steps`` (fractions of an octave per
    ``bins_per_octave``): phase-vocoder time stretch at rate
    ``2 ** (-n_steps / bins_per_octave)``, then resample back to the original
    rate and fix the length (caits/augmentation/_augment_1d.py:743, the
    librosa-effects recipe; resampling is the engine's linear-interp
    ``resample_signal``)."""
    if bins_per_octave <= 0 or int(bins_per_octave) != bins_per_octave:
        raise ValueError(
            f"bins_per_octave={bins_per_octave} must be a positive integer."
        )
    from .preprocess import fix_length, resample_signal

    x = np.asarray(x, dtype=np.float64)
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    stretched = time_stretch_fft(x, rate)
    shifted = resample_signal(stretched, orig_fs=float(sr) / rate, target_fs=sr)
    return fix_length(shifted, size=len(x))
