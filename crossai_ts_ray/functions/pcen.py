"""PCEN: per-channel energy normalization with an order-dependent IIR
smoother along time (caits/fe/_pcen.py:18,141 -- lfilter with initial state,
_pcen.py:128-138).

The IIR recurrence M[t] = (1-b) * M[t-1] + b * S[t] is a sequential scan --
in the engine this runs inside ``groupby(source).map_groups`` with
sort-by-offset inside the group (SURVEY.md §2.4): per-series contiguity is
the partitioning assumption, stated here."""

from __future__ import annotations

import numpy as np


def iir_smooth(S: np.ndarray, b: float, axis: int = -1, zi: np.ndarray | None = None):
    """First-order IIR along ``axis``; vectorized across the other axes
    (the time loop is inherent; everything else is array ops)."""
    S = np.moveaxis(np.asarray(S, dtype=np.float64), axis, 0)
    M = np.empty_like(S)
    state = S[0] if zi is None else np.broadcast_to(zi, S[0].shape).copy()
    for t in range(S.shape[0]):
        state = (1.0 - b) * state + b * S[t]
        M[t] = state
    return np.moveaxis(M, 0, axis)


def pcen(
    S: np.ndarray,
    sr: float = 22050,
    hop_length: int = 512,
    gain: float = 0.98,
    bias: float = 2.0,
    power: float = 0.5,
    time_constant: float = 0.4,
    eps: float = 1e-6,
    axis: int = -1,
) -> np.ndarray:
    """caits/fe/_pcen.py:18 -- (S / (eps + M)^gain + bias)^power - bias^power
    with M the IIR-smoothed spectrogram; b from the time constant via the
    librosa formula."""
    t_frames = time_constant * sr / float(hop_length)
    b = (np.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2)
    M = iir_smooth(S, b, axis=axis)
    smooth = (eps + M) ** (-gain)
    return (np.asarray(S) * smooth + bias) ** power - bias**power
