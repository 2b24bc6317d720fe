"""Spectral aggregate features -- the ``caits/fe/_spectral.py`` family
(reference semantics at /root/reference/caits/fe/_spectral.py:8-540),
re-implemented as vectorized NumPy kernels with no SciPy dependency.

These are per-window scalar aggregates (1-D input -> float), the spectral
sibling of ``functions.stats.signal_stats``; the Ray side applies them
inside ``map_batches`` over windowed signals (see
pipelines/feature_pipeline.py).

SciPy stand-ins implemented here and used by the Welch-based features:

* ``welch``: periodic Hann window, per-segment constant detrend, density
  scaling, one-sided doubling, mean of periodograms -- the
  ``scipy.signal.welch`` recipe the reference calls.
* ``simpson``: composite Simpson integration with the even-sample
  last-interval correction (the ``scipy.integrate.simpson`` rule).
"""

from __future__ import annotations

import numpy as np

# -- SciPy stand-ins ---------------------------------------------------------


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def welch(x: np.ndarray, fs: float, nperseg: int, noverlap: int | None = None):
    """One-sided Welch PSD (density scaling), scipy.signal.welch recipe:
    periodic Hann, constant detrend per segment, partial tail dropped."""
    x = np.asarray(x, dtype=np.float64)
    nperseg = int(min(nperseg, len(x)))
    if noverlap is None:
        noverlap = nperseg // 2
    noverlap = int(min(noverlap, nperseg - 1))
    step = nperseg - noverlap
    nseg = 1 + (len(x) - nperseg) // step if len(x) >= nperseg else 0
    if nseg == 0:
        frames = x[None, :nperseg]
        nseg = 1
    else:
        idx = np.arange(nperseg)[None, :] + step * np.arange(nseg)[:, None]
        frames = x[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)  # detrend='constant'
    win = _hann_periodic(nperseg)
    scale = 1.0 / (fs * (win * win).sum())
    spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2 * scale
    if nperseg % 2 == 0:
        spec[:, 1:-1] *= 2.0  # all but DC and Nyquist
    else:
        spec[:, 1:] *= 2.0  # no Nyquist bin
    freqs = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, spec.mean(axis=0)


def simpson(y: np.ndarray, dx: float = 1.0) -> float:
    """Composite Simpson over uniformly spaced samples; for an even sample
    count, Simpson over the first N-1 points plus the parabolic last-interval
    correction (scipy.integrate.simpson semantics)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 2:
        return 0.0
    if n == 2:
        return float(0.5 * dx * (y[0] + y[1]))

    def _simps_odd(v: np.ndarray) -> float:
        return float(dx / 3.0 * (v[0] + v[-1] + 4.0 * v[1:-1:2].sum() + 2.0 * v[2:-1:2].sum()))

    if n % 2 == 1:
        return _simps_odd(y)
    head = _simps_odd(y[:-1])
    corr = dx * (5.0 / 12.0 * y[-1] + 2.0 / 3.0 * y[-2] - 1.0 / 12.0 * y[-3])
    return head + corr


# -- FFT-based aggregates (reference _spectral.py) ---------------------------


def underlying_spectral(x: np.ndarray, fs: float):
    """abs(rfft), |fftfreq| grid, total magnitude
    (caits/fe/_spectral.py:142)."""
    x = np.asarray(x, dtype=np.float64)
    magnitudes = np.abs(np.fft.rfft(x))
    n = len(x)
    freqs = np.abs(np.fft.fftfreq(n, 1.0 / fs)[: n // 2 + 1])
    return magnitudes, freqs, magnitudes.sum()


def spectral_centroid(x: np.ndarray, fs: float) -> float:
    """Magnitude-weighted mean frequency (caits/fe/_spectral.py:8)."""
    mag, freqs, sum_mag = underlying_spectral(x, fs)
    return float(mag @ freqs / sum_mag)


def spectral_rolloff(x: np.ndarray, fs: float, perc: float = 0.95) -> float:
    """First BIN INDEX where cumulative magnitude reaches ``perc`` of the
    total (the reference returns the bin, not a frequency;
    caits/fe/_spectral.py:26)."""
    mag, _, sum_mag = underlying_spectral(x, fs)
    cs = np.cumsum(mag)
    return float(np.min(np.flatnonzero(cs >= perc * sum_mag)))


def spectral_spread(x: np.ndarray, fs: float) -> float:
    """Magnitude-weighted std of frequency (caits/fe/_spectral.py:58)."""
    mag, freqs, sum_mag = underlying_spectral(x, fs)
    c = spectral_centroid(x, fs)
    return float(np.sqrt(np.sum(((freqs - c) ** 2) * mag) / sum_mag))


def spectral_skewness(x: np.ndarray, fs: float) -> float:
    """Third standardized spectral moment (caits/fe/_spectral.py:85)."""
    mag, freqs, sum_mag = underlying_spectral(x, fs)
    c = spectral_centroid(x, fs)
    sp = spectral_spread(x, fs)
    return float(np.sum(((freqs - c) ** 3) * mag) / ((sp**3) * sum_mag))


def spectral_kurtosis(x: np.ndarray, fs: float) -> float:
    """Fourth standardized spectral moment (caits/fe/_spectral.py:114)."""
    mag, freqs, sum_mag = underlying_spectral(x, fs)
    c = spectral_centroid(x, fs)
    sp = spectral_spread(x, fs)
    return float(np.sum(((freqs - c) ** 4) * mag) / ((sp**4) * sum_mag))


def spectral_bandwidth(x: np.ndarray, fs: float) -> float:
    """Std of the normalized one-sided power spectrum
    (caits/fe/_spectral.py:178; keeps the reference's truncation of the
    positive-frequency block and its doubling of every kept bin)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    ps = np.abs(np.fft.fft(x)) ** 2
    half = n // 2 if n % 2 == 0 else (n - 1) // 2
    ps = ps[:half] * 2
    ps = ps / ps.sum()
    freqs = np.fft.fftfreq(n, 1.0 / fs)[: n // 2]
    mean_freq = np.sum(freqs * ps)
    return float(np.sqrt(np.sum(((freqs - mean_freq) ** 2) * ps)))


def spectral_flatness(
    x: np.ndarray, fs: float, nperseg_th: int = 900, noverlap_th: int = 600
) -> float:
    """Geometric / arithmetic mean of the Welch PSD
    (caits/fe/_spectral.py:259)."""
    x = np.asarray(x, dtype=np.float64)
    nperseg = min(nperseg_th, len(x))
    noverlap = min(noverlap_th, int(nperseg / 2))
    _, psd = welch(x, fs, nperseg=nperseg, noverlap=noverlap)
    m = len(psd)
    gmean = np.exp((1.0 / m) * np.sum(np.log(psd + 1e-17)))
    amean = (1.0 / m) * np.sum(psd)
    return float(gmean / amean)


def spectral_std(
    x: np.ndarray, fs: float, nperseg_th: int = 900, noverlap_th: int = 600,
    ddof: int = 1,
) -> float:
    """Std of the Welch PSD (caits/fe/_spectral.py:289)."""
    x = np.asarray(x, dtype=np.float64)
    nperseg = min(nperseg_th, len(x))
    noverlap = min(noverlap_th, int(nperseg / 2))
    _, psd = welch(x, fs, nperseg=nperseg, noverlap=noverlap)
    return float(np.std(psd, ddof=ddof))


def spectral_slope(
    x: np.ndarray, fs: float, b1_th: int = 0, b2_th: int = 8000
) -> float:
    """Least-squares slope of magnitude vs frequency in [b1, b2]; the means
    are over the FULL half-spectrum, as in caits/fe/_spectral.py:317."""
    x = np.asarray(x, dtype=np.float64)
    s = np.abs(np.fft.fft(x))[: len(x) // 2]
    muS = s.mean()
    f = np.linspace(0.0, fs / 2.0, len(s))
    muF = f.mean()
    bidx = np.flatnonzero((b1_th <= f) & (f <= b2_th))
    return float(
        np.sum(((f - muF) * (s - muS))[bidx]) / np.sum((f[bidx] - muF) ** 2)
    )


def spectral_decrease(
    x: np.ndarray, fs: float, b1_th: int = 0, b2_th: int = 8000
) -> float:
    """Average rate of magnitude decrease from the band's first bin
    (caits/fe/_spectral.py:374, including its ``f - 1`` denominator quirk)."""
    x = np.asarray(x, dtype=np.float64)
    s = np.abs(np.fft.fft(x))[: len(x) // 2]
    f = np.linspace(0.0, fs / 2.0, len(s))
    bidx = np.flatnonzero((b1_th <= f) & (f <= b2_th))
    k = bidx[1:]
    sb1 = s[bidx[0]]
    return float(
        np.sum((s[k] - sb1) / (f[k] - 1 + 1e-17)) / (np.sum(s[k]) + 1e-17)
    )


DEFAULT_FREQ_CUTS = (
    (0, 200),
    (300, 425),
    (500, 650),
    (950, 1150),
    (1400, 1800),
    (2300, 2400),
    (2850, 2950),
    (3800, 3900),
)


def power_spectral_density(
    x: np.ndarray,
    fs: float,
    nperseg_th: int = 900,
    noverlap_th: int = 600,
    freq_cuts=DEFAULT_FREQ_CUTS,
    export: str = "array",
):
    """Relative Welch-PSD power per frequency band, Simpson-integrated
    (caits/fe/_spectral.py:429)."""
    x = np.asarray(x, dtype=np.float64)
    nperseg = min(nperseg_th, len(x))
    noverlap = min(noverlap_th, int(nperseg / 2))
    freqs, psd = welch(x, fs, nperseg=nperseg, noverlap=noverlap)
    dx = freqs[1] - freqs[0]
    total = simpson(psd, dx=dx)
    band_powers = []
    for lf, hf in freq_cuts:
        m = (freqs >= lf) & (freqs <= hf)
        band_powers.append(simpson(psd[m], dx=dx) / total)
    if export == "array":
        return np.array(band_powers)
    if export == "dict":
        return {f"PSD_{lf}-{hf}": p for (lf, hf), p in zip(freq_cuts, band_powers)}
    raise ValueError(f"Unsupported export={export}")


def spectral_values_matrix(
    frames: np.ndarray,
    fs: float,
    perc: float = 0.95,
    nperseg_th: int = 900,
    noverlap_th: int = 600,
    b1_th: int = 0,
    b2_th: int = 8000,
) -> dict:
    """Vectorized ``spectral_values`` over a (W, L) window matrix -- one rfft
    per batch of windows instead of W python calls.  This is the kernel the
    Ray ``map_batches`` stage uses; per-window results match the scalar
    functions above.  The Welch-based features vectorize when L <= nperseg_th
    (the per-window Welch then has exactly one segment); longer windows fall
    back to a per-row loop for those three features only."""
    frames = np.asarray(frames, dtype=np.float64)
    W, L = frames.shape
    mag = np.abs(np.fft.rfft(frames, axis=1))
    freqs = np.abs(np.fft.fftfreq(L, 1.0 / fs)[: L // 2 + 1])
    sum_mag = mag.sum(axis=1)
    centroid = mag @ freqs / sum_mag
    cs = np.cumsum(mag, axis=1)
    rolloff = np.argmax(cs >= perc * sum_mag[:, None], axis=1).astype(np.float64)
    dev = freqs[None, :] - centroid[:, None]
    spread = np.sqrt(np.sum(dev**2 * mag, axis=1) / sum_mag)
    skew = np.sum(dev**3 * mag, axis=1) / (spread**3 * sum_mag)
    kurt = np.sum(dev**4 * mag, axis=1) / (spread**4 * sum_mag)

    half = L // 2 if L % 2 == 0 else (L - 1) // 2
    ps = mag[:, :half] ** 2 * 2
    ps = ps / ps.sum(axis=1, keepdims=True)
    fb = np.fft.fftfreq(L, 1.0 / fs)[: L // 2]
    mean_freq = ps @ fb
    bandwidth = np.sqrt(
        np.sum((fb[None, :] - mean_freq[:, None]) ** 2 * ps, axis=1)
    )

    s_half = mag[:, : L // 2]
    muS = s_half.mean(axis=1)
    f = np.linspace(0.0, fs / 2.0, L // 2)
    muF = f.mean()
    bidx = np.flatnonzero((b1_th <= f) & (f <= b2_th))
    slope = np.sum(
        (f[bidx] - muF)[None, :] * (s_half[:, bidx] - muS[:, None]), axis=1
    ) / np.sum((f[bidx] - muF) ** 2)
    k = bidx[1:]
    sb1 = s_half[:, bidx[0]]
    decrease = np.sum(
        (s_half[:, k] - sb1[:, None]) / (f[k] - 1 + 1e-17)[None, :], axis=1
    ) / (np.sum(s_half[:, k], axis=1) + 1e-17)

    if L <= nperseg_th:
        # one Welch segment per window: vectorize the periodogram
        nperseg = L
        noverlap = min(noverlap_th, int(nperseg / 2))  # noqa: F841 (single segment)
        det = frames - frames.mean(axis=1, keepdims=True)
        win = _hann_periodic(nperseg)
        scale = 1.0 / (fs * (win * win).sum())
        psd = np.abs(np.fft.rfft(det * win, axis=1)) ** 2 * scale
        if nperseg % 2 == 0:
            psd[:, 1:-1] *= 2.0
        else:
            psd[:, 1:] *= 2.0
        m = psd.shape[1]
        gmean = np.exp(np.sum(np.log(psd + 1e-17), axis=1) / m)
        amean = psd.sum(axis=1) / m
        flatness = gmean / amean
        p_std = np.std(psd, ddof=1, axis=1)
    else:
        flatness = np.array([spectral_flatness(r, fs, nperseg_th, noverlap_th) for r in frames])
        p_std = np.array([spectral_std(r, fs, nperseg_th, noverlap_th) for r in frames])

    return {
        "spectral_centroid": centroid,
        "spectral_rolloff": rolloff,
        "spectral_spread": spread,
        "spectral_skewness": skew,
        "spectral_kurtosis": kurt,
        "spectral_bandwidth": bandwidth,
        "spectral_flatness": flatness,
        "spectral_std": p_std,
        "spectral_slope": slope,
        "spectral_decrease": decrease,
    }


def spectral_values(
    x: np.ndarray,
    fs: float,
    perc: float = 0.95,
    nperseg_th: int = 900,
    noverlap_th: int = 600,
    b1_th: int = 0,
    b2_th: int = 8000,
) -> dict:
    """The full per-window spectral bundle (caits/fe/_spectral.py:499)."""
    return {
        "spectral_centroid": spectral_centroid(x, fs),
        "spectral_rolloff": spectral_rolloff(x, fs, perc),
        "spectral_spread": spectral_spread(x, fs),
        "spectral_skewness": spectral_skewness(x, fs),
        "spectral_kurtosis": spectral_kurtosis(x, fs),
        "spectral_bandwidth": spectral_bandwidth(x, fs),
        "spectral_flatness": spectral_flatness(x, fs, nperseg_th, noverlap_th),
        "spectral_std": spectral_std(x, fs, nperseg_th, noverlap_th),
        "spectral_slope": spectral_slope(x, fs, b1_th, b2_th),
        "spectral_decrease": spectral_decrease(x, fs, b1_th, b2_th),
    }
