"""Filtering kernels: the ``caits/filtering.py`` surface in pure NumPy
(SciPy is not available in this environment).

Butterworth design is implemented from the public textbook formulation
(analog prototype poles on the unit circle -> lp2lp/lp2hp/lp2bp frequency
transform -> bilinear transform -> second-order sections); zero-phase
filtering is forward-backward SOS with odd-reflection padding (the
``filtfilt`` method of caits/filtering.py:72-163).  Verified by response
properties (monotonic magnitude, -3 dB at cutoff, zero phase) rather than
SciPy parity -- tests/test_functions.py."""

from __future__ import annotations

import numpy as np


def filter_median_simple(x: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """Median filter with zero padding (scipy.signal.medfilt convention;
    caits/filtering.py:9)."""
    x = np.asarray(x, dtype=np.float64)
    k = kernel_size
    if k % 2 == 0:
        raise ValueError("kernel_size must be odd")
    pad = k // 2
    xp = np.pad(x, pad, mode="constant")
    win = np.lib.stride_tricks.sliding_window_view(xp, k)
    return np.median(win, axis=-1)


_NDIMAGE_PAD = {
    "reflect": "symmetric",  # scipy.ndimage 'reflect' == np.pad 'symmetric'
    "mirror": "reflect",
    "nearest": "edge",
    "wrap": "wrap",
    "constant": "constant",
}


def filter_median_gen(
    x: np.ndarray,
    window_size: int,
    mode: str = "reflect",
    cval: float = 0.0,
    origin: int = 0,
) -> np.ndarray:
    """General median filter with boundary modes and origin shift
    (caits/filtering.py:34 calls scipy.ndimage.median_filter; same semantics
    for 1-D signals, vectorized via a sliding-window view).  The window at
    output i covers input ``[i - w//2 + origin, i + (w-1)//2 + origin]``."""
    x = np.asarray(x, dtype=np.float64)
    w = int(window_size)
    if mode not in _NDIMAGE_PAD:
        raise ValueError(f"unknown mode {mode!r}")
    left = w // 2 - origin
    right = (w - 1) // 2 + origin
    if left < 0 or right < 0:
        raise ValueError(f"origin={origin} out of range for window {w}")
    kw = {"constant_values": cval} if mode == "constant" else {}
    xp = np.pad(x, (left, right), mode=_NDIMAGE_PAD[mode], **kw)
    win = np.lib.stride_tricks.sliding_window_view(xp, w)
    return np.median(win, axis=-1)


def filter_gaussian(x: np.ndarray, sigma: float = 1.0, truncate: float = 4.0) -> np.ndarray:
    """Gaussian smoothing, 'reflect' boundary in the scipy.ndimage sense
    ((d c b a | a b c d), i.e. np.pad mode='symmetric');
    caits/filtering.py:166 calls scipy.ndimage.gaussian_filter1d."""
    x = np.asarray(x, dtype=np.float64)
    r = int(truncate * sigma + 0.5)
    t = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    xp = np.pad(x, r, mode="symmetric")
    return np.convolve(xp, k, mode="valid")


# ---------------------------------------------------------------------------
# Butterworth (caits/filtering.py:72 filter_butterworth)
# ---------------------------------------------------------------------------

def _butter_analog_poles(order: int) -> np.ndarray:
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k - 1) / (2 * order)
    return -np.sin(theta) + 1j * np.cos(theta)


def _bilinear_zpk(z, p, k, fs):
    fs2 = 2.0 * fs
    zb = (fs2 + z) / (fs2 - z)
    pb = (fs2 + p) / (fs2 - p)
    # zeros at infinity map to -1
    zb = np.append(zb, -np.ones(len(p) - len(z)))
    kb = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return zb, pb, kb


def _zpk2sos(z, p, k):
    """Pair conjugate roots into second-order sections (simple pairing by
    ascending |imag|; adequate for Butterworth's well-conditioned poles)."""

    def pair(roots):
        roots = sorted(roots, key=lambda r: (abs(r.imag), r.real))
        used = [False] * len(roots)
        pairs = []
        for i, r in enumerate(roots):
            if used[i]:
                continue
            used[i] = True
            if abs(r.imag) > 1e-12:
                for j in range(i + 1, len(roots)):
                    if not used[j] and abs(roots[j] - np.conj(r)) < 1e-8:
                        used[j] = True
                        pairs.append((r, roots[j]))
                        break
                else:
                    pairs.append((r, np.conj(r)))
            else:
                mate = None
                for j in range(i + 1, len(roots)):
                    if not used[j] and abs(roots[j].imag) <= 1e-12:
                        mate = roots[j]
                        used[j] = True
                        break
                pairs.append((r, mate))
        return pairs

    zp, pp = pair(list(z)), pair(list(p))
    while len(zp) < len(pp):
        zp.append((None, None))
    sos = []
    gain = k
    for (z1, z2), (p1, p2) in zip(zp, pp):
        b = np.poly([r for r in (z1, z2) if r is not None]).real
        a = np.poly([r for r in (p1, p2) if r is not None]).real
        b = np.atleast_1d(b)
        a = np.atleast_1d(a)
        b = np.pad(b, (0, 3 - len(b)))[::1]
        a = np.pad(a, (0, 3 - len(a)))
        sos.append(np.concatenate([b, a]))
    sos = np.array(sos)
    sos[0, :3] *= gain
    return sos


def butter_sos(order: int, cutoff, btype: str = "lowpass", fs: float = 2.0) -> np.ndarray:
    """Digital Butterworth as SOS.  ``cutoff`` in Hz (scalar, or (lo, hi) for
    bandpass)."""
    p = _butter_analog_poles(order)
    z = np.zeros(0, dtype=complex)
    if btype in ("lowpass", "highpass"):
        wc = 2.0 * fs * np.tan(np.pi * float(np.atleast_1d(cutoff)[0]) / fs)
        if btype == "lowpass":
            pw = p * wc
            kw = wc**order
        else:  # lp2hp
            pw = wc / p
            z = np.zeros(order, dtype=complex)
            kw = np.real(np.prod(-p)) ** -1 if order else 1.0
            kw = 1.0  # hp prototype gain resolves to 1 after normalization below
    elif btype == "bandpass":
        lo, hi = (2.0 * fs * np.tan(np.pi * c / fs) for c in cutoff)
        bw, w0 = hi - lo, np.sqrt(lo * hi)
        phalf = p * bw / 2.0
        pw = np.concatenate(
            [phalf + np.sqrt(phalf**2 - w0**2), phalf - np.sqrt(phalf**2 - w0**2)]
        )
        z = np.zeros(order, dtype=complex)
        kw = bw**order
    else:
        raise ValueError(btype)
    if btype == "lowpass":
        zd, pd, kd = _bilinear_zpk(z, pw, kw, fs)
        # normalize gain to exactly 1 at DC (z = +1)
        h = kd * np.prod(1.0 - zd) / np.prod(1.0 - pd)
        kd /= abs(h)
    elif btype == "highpass":
        zd, pd, kd = _bilinear_zpk(z, pw, 1.0, fs)
        # normalize gain to 1 at Nyquist (z = -1)
        w = np.exp(1j * np.pi)
        h = kd * np.prod(w - zd) / np.prod(w - pd)
        kd /= abs(h)
    else:
        zd, pd, kd = _bilinear_zpk(z, pw, kw, fs)
        # normalize gain to 1 at center frequency
        w0d = 2.0 * np.pi * np.sqrt(np.prod(cutoff)) / fs
        w = np.exp(1j * w0d)
        h = kd * np.prod(w - zd) / np.prod(w - pd)
        kd /= abs(h)
    return _zpk2sos(zd, pd, kd)


def sosfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Direct-form-II-transposed SOS filtering (scipy.signal.sosfilt
    semantics), sequential over time, vectorized over sections' state."""
    y = np.asarray(x, dtype=np.float64).copy()
    for b0, b1, b2, a0, a1, a2 in sos:
        b1, b2, a1, a2 = b1 / a0, b2 / a0, a1 / a0, a2 / a0
        b0 = b0 / a0
        out = np.empty_like(y)
        z1 = z2 = 0.0
        for i in range(len(y)):
            xi = y[i]
            yi = b0 * xi + z1
            z1 = b1 * xi - a1 * yi + z2
            z2 = b2 * xi - a2 * yi
            out[i] = yi
        y = out
    return y


def sosfiltfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward SOS filtering with odd-reflection padding
    (scipy.signal.sosfiltfilt convention)."""
    x = np.asarray(x, dtype=np.float64)
    pad = min(3 * (2 * len(sos) + 1), len(x) - 1)
    if pad > 0:
        pre = 2 * x[0] - x[pad:0:-1]
        post = 2 * x[-1] - x[-2 : -pad - 2 : -1]
        ext = np.concatenate([pre, x, post])
    else:
        ext = x
    y = sosfilt(sos, ext)
    y = sosfilt(sos, y[::-1])[::-1]
    return y[pad : pad + len(x)] if pad > 0 else y


def filter_butterworth(
    x: np.ndarray,
    fs: float,
    filter_type: str = "lowpass",
    cutoff_freq=None,
    order: int = 4,
    method: str = "filtfilt",
) -> np.ndarray:
    """caits/filtering.py:72 -- Butterworth low/high/band-pass with
    ``filtfilt`` (zero-phase) or ``sosfilt`` (causal) application."""
    sos = butter_sos(order, cutoff_freq, btype=filter_type, fs=fs)
    if method == "filtfilt":
        return sosfiltfilt(sos, x)
    return sosfilt(sos, x)


def butterworth_bandpass_energy(
    x: np.ndarray, fs: float, bands: list[tuple[float, float]], order: int = 2
) -> np.ndarray:
    """Per-band filtered energies -- the EEPD building block
    (caits/fe/_statistical.py:476 envelope_energy_peak_detection)."""
    return np.array(
        [
            float((filter_butterworth(x, fs, "bandpass", b, order) ** 2).sum())
            for b in bands
        ]
    )


def find_peaks_simple(x: np.ndarray) -> np.ndarray:
    """Indices of local maxima, scipy.signal.find_peaks default semantics:
    strictly higher than both neighbors; a flat plateau flanked by lower
    values peaks at its midpoint; edges are never peaks."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    peaks = []
    i = 1
    while i < n - 1:
        if x[i - 1] < x[i]:
            ahead = i + 1
            while ahead < n - 1 and x[ahead] == x[i]:
                ahead += 1
            if x[ahead] < x[i]:
                peaks.append((i + ahead - 1) // 2)
                i = ahead
        i += 1
    return np.array(peaks, dtype=np.int64)


def envelope_energy_peak_detection(
    x: np.ndarray,
    fs: float,
    start: int = 50,
    stop: int = 1000,
    freq_step: int = 50,
    fcl_add: int = 50,
    export: str = "array",
):
    """Envelope Energy Peak Detection (caits/fe/_statistical.py:476): per
    frequency band [fcl, fcl + fcl_add], order-1 Butterworth bandpass
    (zero-phase), square, order-2 10 Hz lowpass envelope, normalize by the
    max, count local maxima.  Returns peak counts per band."""
    x = np.asarray(x, dtype=np.float64)
    names, n_peaks = [], []
    for fcl in range(start, stop, freq_step):
        names.append(f"EEPD{fcl}_{fcl + freq_step}")
        bp = filter_butterworth(x, fs, "bandpass", (fcl, fcl + fcl_add), order=1)
        eed = filter_butterworth(bp**2, fs, "lowpass", 10.0, order=2)
        eed = eed / np.max(eed + 1e-17)
        n_peaks.append(int(len(find_peaks_simple(eed))))
    if export == "array":
        return np.array(n_peaks)
    if export == "dict":
        return dict(zip(names, n_peaks))
    raise ValueError(f"Unsupported export={export}")
