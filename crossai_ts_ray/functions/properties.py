"""Signal-property kernels: the ``caits/properties.py`` surface in NumPy
(Hilbert analytic signal via FFT -- scipy.signal.hilbert's public method)."""

from __future__ import annotations

import numpy as np


def hilbert(x: np.ndarray) -> np.ndarray:
    """Analytic signal via the FFT one-sided spectrum trick."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    X = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1 : n // 2] = 2
    else:
        h[0] = 1
        h[1 : (n + 1) // 2] = 2
    return np.fft.ifft(X * h)


def amplitude_envelope_hbt(x: np.ndarray) -> np.ndarray:
    """caits/properties.py:9 -- |analytic signal|."""
    return np.abs(hilbert(x))


def instantaneous_amplitude_hbt(x: np.ndarray) -> np.ndarray:
    """caits/properties.py:55"""
    return np.abs(hilbert(x))


def instantaneous_frequency_hbt(x: np.ndarray, fs: float = 1.0) -> np.ndarray:
    """caits/properties.py:30 -- derivative of unwrapped phase / 2 pi."""
    phase = np.unwrap(np.angle(hilbert(x)))
    return np.diff(phase) / (2.0 * np.pi) * fs


def sma_signal(x: np.ndarray) -> np.ndarray:
    """Signal magnitude area: per-row sum of |channels|
    (caits/properties.py:74; x shape (n, channels))."""
    return np.abs(np.asarray(x, dtype=np.float64)).sum(axis=1)


def magnitude_signal(x: np.ndarray) -> np.ndarray:
    """Per-row L2 magnitude across channels (caits/properties.py:92)."""
    x = np.asarray(x, dtype=np.float64)
    return np.sqrt((x**2).sum(axis=1))
