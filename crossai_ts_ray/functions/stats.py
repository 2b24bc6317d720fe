"""Statistical feature kernels: the ``caits/fe/_statistical.py`` surface
re-expressed as axis-aware NumPy functions (the reference implements these
over np.ndarray with an ``axis`` argument; we keep that contract so they drop
into ``map_batches`` batch kernels and per-window reducers).

Reference citations per function in docstrings.  SciPy is unavailable in this
environment, so scipy-derived moments are implemented from their public
definitions and property-tested (tests/test_functions.py).
"""

from __future__ import annotations

import numpy as np


def mean_value(x, axis=0):
    """caits/fe/_statistical.py:49"""
    return np.mean(x, axis=axis)


def median_value(x, axis=0):
    """caits/fe/_statistical.py:66"""
    return np.median(x, axis=axis)


def std_value(x, axis=0):
    """caits/fe/_statistical.py:13 (population std, ddof=0)"""
    return np.std(x, axis=axis)


def variance_value(x, axis=0):
    """caits/fe/_statistical.py:31"""
    return np.var(x, axis=axis)


def min_value(x, axis=0):
    """caits/fe/_statistical.py:100"""
    return np.min(x, axis=axis)


def max_value(x, axis=0):
    """caits/fe/_statistical.py:83"""
    return np.max(x, axis=axis)


def kurtosis_value(x, axis=0):
    """Fisher kurtosis (excess, biased) -- scipy.stats.kurtosis defaults,
    caits/fe/_statistical.py:117."""
    x = np.asarray(x, dtype=np.float64)
    m = np.mean(x, axis=axis, keepdims=True)
    d = x - m
    m2 = np.mean(d**2, axis=axis)
    m4 = np.mean(d**4, axis=axis)
    return m4 / m2**2 - 3.0


def sample_skewness(x, axis=0):
    """Bias-corrected (G1) sample skewness -- scipy.stats.skew(bias=False),
    caits/fe/_statistical.py:133 (requires n >= 3)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[axis]
    if n < 3:
        raise ValueError("sample skewness requires at least 3 samples")
    m = np.mean(x, axis=axis, keepdims=True)
    d = x - m
    m2 = np.mean(d**2, axis=axis)
    m3 = np.mean(d**3, axis=axis)
    g1 = m3 / m2**1.5
    return np.sqrt(n * (n - 1)) / (n - 2) * g1


def central_moments(x, axis=0, orders=(1, 2, 3, 4)):
    """caits/fe/_statistical.py:189 -- dict of central moments."""
    x = np.asarray(x, dtype=np.float64)
    m = np.mean(x, axis=axis, keepdims=True)
    return {f"moment_{k}": np.mean((x - m) ** k, axis=axis) for k in orders}


def rms_value(x, axis=0):
    """caits/fe/_statistical.py:237"""
    x = np.asarray(x, dtype=np.float64)
    return np.sqrt(np.mean(x**2, axis=axis))


def energy(x, axis=0):
    """caits/fe/_statistical.py:424 -- sum of squares."""
    x = np.asarray(x, dtype=np.float64)
    return np.sum(x**2, axis=axis)


def average_power(x, axis=0):
    """caits/fe/_statistical.py:441 -- energy / n."""
    return energy(x, axis=axis) / np.asarray(x).shape[axis]


def crest_factor(x, axis=0):
    """caits/fe/_statistical.py:458 -- peak / rms."""
    x = np.asarray(x, dtype=np.float64)
    return np.max(np.abs(x), axis=axis) / rms_value(x, axis=axis)


def zcr_value(x, axis=0):
    """Zero-crossing rate: count of adjacent products < 0, over (n - 1)
    (caits/fe/_statistical.py:324 uses x[:-1]*x[1:] < 0, so a transition
    through an exact-zero sample does NOT count as a crossing)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[axis]
    lo = np.take(x, np.arange(n - 1), axis=axis)
    hi = np.take(x, np.arange(1, n), axis=axis)
    return np.sum(lo * hi < 0, axis=axis) / (n - 1)


def signal_length(x, fs: float = 1.0, axis=0):
    """caits/fe/_statistical.py:161 -- sample count / rate."""
    return np.asarray(x).shape[axis] / fs


def _frame_series(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(num_frames, frame) strided view; trailing partial dropped
    (caits/windowing.py:158 frame_signal semantics)."""
    n = len(x)
    if n < frame:
        return np.zeros((0, frame), dtype=x.dtype)
    num = 1 + (n - frame) // hop
    return np.lib.stride_tricks.as_strided(
        x, shape=(num, frame), strides=(x.strides[0] * hop, x.strides[0])
    )


def rolling_rms(x, frame: int = 256, hop: int = 128,
                padding_mode: str = "constant") -> np.ndarray:
    """Per-frame RMS series (caits/properties.py:111) -- the fine-grained
    rollup whose min/mean/max feed the tier cascade. Matches the reference:
    the signal is center-padded by frame//2 on both sides (constant zeros by
    default) before framing."""
    x = np.pad(np.asarray(x, dtype=np.float64), frame // 2, mode=padding_mode)
    f = _frame_series(x, frame, hop)
    return np.sqrt((f**2).mean(axis=1))


def rolling_zcr(x, frame: int = 256, hop: int = 128, center: bool = True,
                padding_mode: str = "edge") -> np.ndarray:
    """Per-frame ZCR series (caits/properties.py:175). Matches the reference:
    edge-pad by frame//2 when center, count signbit changes within each
    frame, divide by frame_length (not frame-1)."""
    x = np.asarray(x, dtype=np.float64)
    if center:
        x = np.pad(x, frame // 2, mode=padding_mode)
    f = _frame_series(x, frame, hop)
    if not len(f):
        return np.zeros(0)
    return np.abs(np.diff(np.signbit(f), axis=1)).sum(axis=1) / float(frame)


def rms_max(x, frame=256, hop=128):
    """max-of-rolling-rms (caits/fe/_statistical.py:252) -- rollup of a
    rollup: the reference's own tier-cascade recombination semantic."""
    return rolling_rms(x, frame, hop).max()


def rms_mean(x, frame=256, hop=128):
    """caits/fe/_statistical.py:~275"""
    return rolling_rms(x, frame, hop).mean()


def rms_min(x, frame=256, hop=128):
    """caits/fe/_statistical.py:~298"""
    return rolling_rms(x, frame, hop).min()


def zcr_max(x, frame=256, hop=128):
    """caits/fe/_statistical.py:~344"""
    return rolling_zcr(x, frame, hop).max()


def zcr_mean(x, frame=256, hop=128):
    return rolling_zcr(x, frame, hop).mean()


def zcr_min(x, frame=256, hop=128):
    return rolling_zcr(x, frame, hop).min()


def welch_psd(x, fs: float = 1.0, nperseg: int = 256):
    """Welch power spectral density (NumPy rfft, hann window, 50% overlap,
    mean of per-segment periodograms) -- backs dominant_frequency
    (caits/fe/_statistical.py:542 uses scipy.signal.welch)."""
    x = np.asarray(x, dtype=np.float64)
    nperseg = min(nperseg, len(x))
    hop = max(1, nperseg // 2)
    frames = _frame_series(x, nperseg, hop)
    if not len(frames):
        frames = x[None, :nperseg]
    w = np.hanning(nperseg)
    scale = 1.0 / (fs * (w**2).sum())
    spec = np.abs(np.fft.rfft(frames * w, axis=1)) ** 2 * scale
    spec[:, 1:-1] *= 2.0
    freqs = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, spec.mean(axis=0)


def dominant_frequency(x, fs: float = 1.0, nperseg: int = 256) -> float:
    """argmax of the Welch PSD (caits/fe/_statistical.py:542)."""
    freqs, psd = welch_psd(x, fs=fs, nperseg=nperseg)
    return float(freqs[np.argmax(psd)])


def signal_stats(x, fs: float = 1.0) -> dict:
    """The canonical windowed aggregate bundle
    (caits/fe/_statistical.py:597 ``signal_stats``).  The audio-band members
    (Butterworth-banded EEPD peak counts, per-coefficient MFCC means)
    auto-enable when ``fs`` supports the EEPD band grid / an STFT frame
    fits, so token-rate signals stay lean while audio-rate parity is
    complete."""
    x = np.asarray(x, dtype=np.float64)
    out = {
        "mean": float(mean_value(x)),
        "median": float(median_value(x)),
        "std": float(std_value(x)),
        "var": float(variance_value(x)),
        "min": float(min_value(x)),
        "max": float(max_value(x)),
        "kurtosis": float(kurtosis_value(x)),
        "skewness": float(sample_skewness(x)) if len(x) >= 3 else float("nan"),
        "length_s": float(signal_length(x, fs)),
        "rms": float(rms_value(x)),
        "energy": float(energy(x)),
        "avg_power": float(average_power(x)),
        "crest_factor": float(crest_factor(x)),
        "zcr": float(zcr_value(x)),
        "dominant_frequency": dominant_frequency(x, fs),
    }
    frame = min(256, max(2, len(x) // 4))
    hop = max(1, frame // 2)
    rr = rolling_rms(x, frame, hop)
    rz = rolling_zcr(x, frame, hop)
    # STABLE KEY SET: every member is always present (NaN/None when gated
    # off) so consumers tabulating dicts across mixed-length / mixed-rate
    # windows never see ragged schemas
    if len(rr):
        out.update(
            rms_min=float(rr.min()), rms_mean=float(rr.mean()), rms_max=float(rr.max()),
            zcr_min=float(rz.min()), zcr_mean=float(rz.mean()), zcr_max=float(rz.max()),
        )
    else:
        out.update(
            rms_min=float("nan"), rms_mean=float("nan"), rms_max=float("nan"),
            zcr_min=float("nan"), zcr_mean=float("nan"), zcr_max=float("nan"),
        )
    mom = central_moments(x)
    out.update({k: float(v) for k, v in mom.items()})
    # the reference bundle also carries EEPD peak counts and per-coefficient
    # MFCC means (caits/fe/_statistical.py:642-644); they only make sense for
    # audio-rate signals, so their VALUES auto-enable when fs supports the
    # EEPD band grid / an STFT frame fits -- the keys are always emitted
    out["eepd"] = None
    out["mfcc_mean"] = None
    if fs / 2.0 > 1000:
        from .filters import envelope_energy_peak_detection

        out["eepd"] = envelope_energy_peak_detection(x, fs)
        if len(x) >= 2048:
            from .spectral import mfcc_mean

            out["mfcc_mean"] = mfcc_mean(x, sr=fs)
    return out
