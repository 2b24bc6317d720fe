"""Spectral kernels: the ``caits/fe/_spectrum.py`` surface in pure NumPy
(rfft-based).  These are per-window batch kernels (heavy transforms run as
actor-pool ``map_batches`` stages with the mel filterbank cached per actor --
SURVEY.md §2.5).

Conventions follow the librosa-derived reference: hann window, centered
frames with reflect padding, mel filterbank with Slaney normalization
(caits/fe/core_spectrum/_utils.py:160), DCT-II orthonormal MFCC.
"""

from __future__ import annotations

import numpy as np


def frame(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """librosa-style framing -> (frame_length, num_frames)
    (caits/core/_core_window.py:12; caits/windowing.py:158 frame_signal)."""
    n = len(x)
    num = 1 + (n - frame_length) // hop_length if n >= frame_length else 0
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(frame_length, num),
        strides=(x.strides[0], hop_length * x.strides[0]),
    )


def stft(
    x: np.ndarray,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    center: bool = True,
) -> np.ndarray:
    """Short-time Fourier transform (caits/fe/_spectrum.py:563): hann window,
    reflect-pad centering; returns (1 + n_fft//2, num_frames) complex.

    The reference bounds memory with a 256 KB column block loop
    (_spectrum.py:23-24,853-861); here memory is bounded by the *batch* --
    the engine slices work upstream via map_batches batch_size."""
    x = np.asarray(x, dtype=np.float64)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    w = np.hanning(win_length + 1)[:-1]
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    if center:
        x = np.pad(x, n_fft // 2, mode="reflect")
    frames = frame(x, n_fft, hop_length)
    return np.fft.rfft(frames * w[:, None], axis=0)


def istft(
    S: np.ndarray,
    hop_length: int | None = None,
    win_length: int | None = None,
    center: bool = True,
    length: int | None = None,
) -> np.ndarray:
    """Inverse STFT via windowed overlap-add with squared-window
    normalization (caits/fe/_spectrum.py:866)."""
    n_fft = 2 * (S.shape[0] - 1)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    w = np.hanning(win_length + 1)[:-1]
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    frames = np.fft.irfft(S, n=n_fft, axis=0)
    n_frames = S.shape[1]
    out_len = n_fft + hop_length * (n_frames - 1)
    y = np.zeros(out_len)
    norm = np.zeros(out_len)
    for i in range(n_frames):
        o = i * hop_length
        y[o : o + n_fft] += frames[:, i] * w
        norm[o : o + n_fft] += w**2
    y = np.where(norm > 1e-10, y / np.where(norm > 1e-10, norm, 1.0), y)
    if center:
        y = y[n_fft // 2 :]
    if length is not None:
        y = y[:length] if len(y) >= length else np.pad(y, (0, length - len(y)))
    elif center:
        y = y[: out_len - n_fft]
    return y


def spectrogram(x, n_fft: int = 2048, hop_length: int | None = None, power: float = 2.0):
    """|STFT|^power (caits/fe/_spectrum.py:343)."""
    return np.abs(stft(x, n_fft=n_fft, hop_length=hop_length)) ** power


def power_to_db(S, ref: float = 1.0, amin: float = 1e-10, top_db: float = 80.0):
    """caits/fe/_spectrum.py:136"""
    S = np.asarray(S)
    log_spec = 10.0 * np.log10(np.maximum(amin, S)) - 10.0 * np.log10(max(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def db_to_power(S_db, ref: float = 1.0):
    """caits/fe/_spectrum.py:217"""
    return ref * 10.0 ** (0.1 * np.asarray(S_db))


def amplitude_to_db(S, ref: float = 1.0, amin: float = 1e-5, top_db: float = 80.0):
    """caits/fe/_spectrum.py:246"""
    return power_to_db(np.abs(S) ** 2, ref=ref**2, amin=amin**2, top_db=top_db)


def db_to_amplitude(S_db, ref: float = 1.0):
    """caits/fe/_spectrum.py:315"""
    return np.sqrt(db_to_power(S_db, ref=ref**2))


def fft_frequencies(sr: float = 22050, n_fft: int = 2048):
    """caits/fe/_spectrum.py:1083"""
    return np.fft.rfftfreq(n_fft, 1.0 / sr)


def hz_to_mel(f):
    """Slaney mel scale (librosa convention)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mel)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filter(sr: float, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: float | None = None):
    """Slaney-normalized triangular mel filterbank
    (caits/fe/core_spectrum/_utils.py:160) -- cacheable per-actor state."""
    fmax = fmax or sr / 2.0
    fftfreqs = fft_frequencies(sr, n_fft)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return weights * enorm[:, None]


def melspectrogram(x, sr: float = 22050, n_fft: int = 2048, hop_length: int = 512, n_mels: int = 128):
    """caits/fe/_spectrum.py:27"""
    S = spectrogram(x, n_fft=n_fft, hop_length=hop_length, power=2.0)
    return mel_filter(sr, n_fft, n_mels) @ S


def _dct_ii_ortho(n_out: int, n_in: int) -> np.ndarray:
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis


def mfcc(x, sr: float = 22050, n_mfcc: int = 20, n_fft: int = 2048, hop_length: int = 512, n_mels: int = 128):
    """MFCC = DCT-II(ortho) of log-mel power (caits/fe/_spectrum.py:532)."""
    M = melspectrogram(x, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)
    logM = power_to_db(M)
    return _dct_ii_ortho(n_mfcc, n_mels) @ logM


def delta(feat: np.ndarray, width: int = 9, order: int = 1) -> np.ndarray:
    """Local-slope delta features via least-squares regression window
    (caits/fe/_spectrum.py:465; librosa.feature.delta semantics, edge-padded)."""
    if width % 2 == 0 or width < 3:
        raise ValueError("width must be an odd integer >= 3")
    half = width // 2
    kernel = np.arange(-half, half + 1, dtype=np.float64)
    kernel /= (kernel**2).sum()
    out = feat
    for _ in range(order):
        padded = np.pad(out, [(0, 0), (half, half)], mode="edge")
        out = np.stack(
            [np.convolve(row, kernel[::-1], mode="valid") for row in padded]
        )
    return out


def phase_vocoder(S: np.ndarray, rate: float, hop_length: int | None = None) -> np.ndarray:
    """Phase-vocoder time stretch of an STFT matrix
    (caits/fe/core_spectrum/_phase.py)."""
    n_fft = 2 * (S.shape[0] - 1)
    hop_length = hop_length or n_fft // 4
    time_steps = np.arange(0, S.shape[1], rate)
    phi_advance = np.linspace(0, np.pi * hop_length, S.shape[0])
    out = np.zeros((S.shape[0], len(time_steps)), dtype=complex)
    phase_acc = np.angle(S[:, 0])
    Spad = np.pad(S, [(0, 0), (0, 2)])
    for t, step in enumerate(time_steps):
        i = int(step)
        frac = step - i
        mag = (1 - frac) * np.abs(Spad[:, i]) + frac * np.abs(Spad[:, i + 1])
        out[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(Spad[:, i + 1]) - np.angle(Spad[:, i]) - phi_advance
        dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc += phi_advance + dphase
    return out


def mel_to_stft(M: np.ndarray, sr: float = 22050, n_fft: int = 2048, power: float = 2.0):
    """Approximate STFT magnitude from a mel spectrogram via non-negative
    least squares on the filterbank (caits/fe/inverse.py:16; nnls approximated
    by projected gradient -- SciPy-free)."""
    mel_basis = mel_filter(sr, n_fft, n_mels=M.shape[0])
    # projected-gradient NNLS: minimize ||mel_basis @ X - M||^2, X >= 0
    X = np.maximum(0.0, np.linalg.pinv(mel_basis) @ M)
    step = 1.0 / (np.linalg.norm(mel_basis, 2) ** 2 + 1e-12)
    for _ in range(30):
        grad = mel_basis.T @ (mel_basis @ X - M)
        X = np.maximum(0.0, X - step * grad)
    return X ** (1.0 / power)


def griffinlim(
    S_mag: np.ndarray, n_iter: int = 32, hop_length: int | None = None,
    length: int | None = None, seed: int = 0,
) -> np.ndarray:
    """Iterative phase reconstruction from an STFT magnitude
    (caits/fe/inverse.py:71): alternate istft/stft keeping the target
    magnitude; deterministic seeded init."""
    n_fft = 2 * (S_mag.shape[0] - 1)
    hop_length = hop_length or n_fft // 4
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(S_mag.shape))
    for _ in range(n_iter):
        y = istft(S_mag * angles, hop_length=hop_length, length=length)
        rebuilt = stft(y, n_fft=n_fft, hop_length=hop_length)
        rebuilt = rebuilt[:, : S_mag.shape[1]]
        if rebuilt.shape[1] < S_mag.shape[1]:
            rebuilt = np.pad(rebuilt, [(0, 0), (0, S_mag.shape[1] - rebuilt.shape[1])])
        angles = np.exp(1j * np.angle(rebuilt))
    return istft(S_mag * angles, hop_length=hop_length, length=length)


def mfcc_mean(y, sr: float = 22050, n_mfcc: int = 20, **kw) -> np.ndarray:
    """Mean of each MFCC coefficient over frames
    (caits/fe/_statistical.py:574)."""
    return mfcc(y, sr=sr, n_mfcc=n_mfcc, **kw).mean(axis=1)


def mfcc_stats(
    x, sr: float = 22050, n_mfcc: int = 13, export: str = "array", **kw
) -> np.ndarray | dict:
    """Per-coefficient MFCC aggregate bundle (caits/fe/_spectrum.py:432):
    mean and std of the MFCC matrix plus means of its first- and second-order
    deltas, each aggregated over frames -> four (n_mfcc,) vectors."""
    m = mfcc(x, sr=sr, n_mfcc=n_mfcc, **kw)
    d1 = delta(m)
    d2 = delta(m, order=2)
    stats = {
        "mfcc_mean": m.mean(axis=1),
        "mfcc_std": m.std(axis=1),
        "delta_mean": d1.mean(axis=1),
        "delta2_mean": d2.mean(axis=1),
    }
    if export == "array":
        return np.concatenate(list(stats.values()))
    if export == "dict":
        return stats
    raise ValueError(f"Unsupported export={export}")


def mel_to_audio(
    M: np.ndarray,
    sr: float = 22050,
    n_fft: int = 2048,
    hop_length: int | None = None,
    power: float = 2.0,
    n_iter: int = 32,
    length: int | None = None,
) -> np.ndarray:
    """Invert a mel power spectrogram to audio: mel -> STFT magnitude (NNLS)
    -> Griffin-Lim phase reconstruction (caits/fe/inverse.py:273)."""
    S = mel_to_stft(M, sr=sr, n_fft=n_fft, power=power)
    return griffinlim(
        S, n_iter=n_iter, hop_length=hop_length or n_fft // 4, length=length
    )


def magphase(S):
    """caits/hpss.py:191"""
    mag = np.abs(S)
    phase = np.exp(1j * np.angle(S))
    return mag, phase


def softmask(X, X_ref, power: float = 1.0):
    """caits/hpss.py:231"""
    Z = np.maximum(X, X_ref).astype(np.float64)
    bad = Z < np.finfo(np.float64).tiny
    Z[bad] = 1.0
    m = (X / Z) ** power / ((X / Z) ** power + (X_ref / Z) ** power)
    m[bad] = 0.5
    return m


def hpss(S, kernel_size: int = 31, power: float = 2.0):
    """Harmonic/percussive separation via median filtering along time/freq
    (caits/hpss.py:9)."""
    from .filters import filter_median_simple

    mag, phase = magphase(S)
    harm = np.stack([filter_median_simple(row, kernel_size) for row in mag])
    perc = np.stack([filter_median_simple(col, kernel_size) for col in mag.T]).T
    mask_h = softmask(harm, perc, power=power)
    mask_p = softmask(perc, harm, power=power)
    return S * mask_h, S * mask_p
