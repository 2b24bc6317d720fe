"""Function-surface tests: the reference's shape-matrix strategy
(/root/reference/test/conftest.py:22-32 -- arrays of several shapes/axes)
plus numerical property checks for the NumPy reimplementations."""

from __future__ import annotations

import numpy as np
import pytest

from crossai_ts_ray.functions import augment, filters, preprocess, properties, spectral, stats

SHAPES = [(1000,), (1000, 1), (1000, 2)]


@pytest.fixture(params=SHAPES, ids=[str(s) for s in SHAPES])
def arr(request):
    rng = np.random.default_rng(11)
    return rng.normal(0, 1, request.param)


FEATURES_AXIS0 = [
    stats.mean_value, stats.median_value, stats.std_value, stats.variance_value,
    stats.min_value, stats.max_value, stats.kurtosis_value, stats.sample_skewness,
    stats.rms_value, stats.energy, stats.average_power, stats.crest_factor,
    stats.zcr_value,
]


@pytest.mark.parametrize("fn", FEATURES_AXIS0, ids=lambda f: f.__name__)
def test_feature_shapes(arr, fn):
    out = np.asarray(fn(arr, axis=0))
    assert out.shape == arr.shape[1:]


def test_moments_match_formulas():
    rng = np.random.default_rng(3)
    x = rng.normal(2, 3, 500)
    # kurtosis: normal -> ~0 (excess); uniform -> -1.2
    assert abs(stats.kurtosis_value(x)) < 0.5
    u = rng.uniform(0, 1, 20000)
    assert abs(stats.kurtosis_value(u) + 1.2) < 0.1
    # skewness of symmetric ~0; exponential ~2
    e = rng.exponential(1.0, 20000)
    assert abs(stats.sample_skewness(e) - 2.0) < 0.2


def test_rolling_rms_cascade_semantics():
    """rms_max = max over frame RMS series, NOT rms over all samples --
    the rollup-of-rollup recombination the tier cascade preserves."""
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, 0.1, 512), rng.normal(0, 2.0, 256)])
    assert stats.rms_max(x, 256, 128) > stats.rms_value(x)
    assert stats.rms_min(x, 256, 128) < stats.rms_value(x)


def test_dominant_frequency():
    fs = 1000.0
    t = np.arange(2048) / fs
    x = np.sin(2 * np.pi * 50.0 * t) + 0.1 * np.sin(2 * np.pi * 120.0 * t)
    assert abs(stats.dominant_frequency(x, fs=fs, nperseg=512) - 50.0) < 4.0


def test_signal_stats_bundle_keys():
    x = np.random.default_rng(0).normal(0, 1, 1024)
    out = stats.signal_stats(x, fs=100.0)
    for k in ("mean", "median", "std", "rms", "zcr", "kurtosis", "skewness",
              "rms_max", "zcr_mean", "dominant_frequency", "moment_3"):
        assert k in out, k
        assert np.isfinite(out[k])


def test_resample_signal_linear():
    x = np.arange(10, dtype=np.float64)
    up = preprocess.resample_signal(x, 1.0, 2.0)
    assert len(up) == 20
    assert np.allclose(up[:4], [0.0, 0.5, 1.0, 1.5])
    down = preprocess.resample_signal(x, 1.0, 0.5)
    assert np.allclose(down, [0, 2, 4, 6, 8])


def test_normalize_trim_fix():
    x = np.array([0, 16384, -32768], dtype=np.int16)
    n = preprocess.normalize_signal(x)
    assert n.max() <= 1.0 and abs(n[1] - 0.5) < 1e-3
    y = np.array([0.0, 0.001, 0.5, 1.0, 0.001, 0.0])
    assert np.array_equal(preprocess.trim_signal(y, 0.01), np.array([0.5, 1.0]))
    assert preprocess.fix_length(np.ones(5), 8).shape == (8,)
    assert preprocess.fix_length(np.ones(5), 3).shape == (3,)
    chunks = preprocess.create_chunks(np.arange(10), 4)
    assert [len(c) for c in chunks] == [4, 4, 2]


def test_median_and_gaussian_filters():
    x = np.zeros(50)
    x[25] = 100.0  # impulse
    assert filters.filter_median_simple(x, 5).max() == 0.0  # impulse removed
    g = filters.filter_gaussian(x, sigma=2.0)
    assert g.max() < 25.0 and abs(g.sum() - 100.0) < 1.0  # spread, mass kept


@pytest.mark.parametrize("btype,cut", [("lowpass", 50.0), ("highpass", 50.0), ("bandpass", (40.0, 60.0))])
def test_butterworth_response(btype, cut):
    """-3dB at cutoff, strong attenuation an octave away, passband ~1."""
    fs = 1000.0
    sos = filters.butter_sos(4, cut, btype=btype, fs=fs)

    def mag(f):
        w = np.exp(1j * 2 * np.pi * f / fs)
        h = 1.0
        for b0, b1, b2, a0, a1, a2 in sos:
            h *= (b0 + b1 / w + b2 / w**2) / (a0 + a1 / w + a2 / w**2)
        return abs(h)

    if btype == "lowpass":
        assert abs(mag(1.0) - 1.0) < 1e-6
        assert abs(mag(50.0) - 1 / np.sqrt(2)) < 0.02
        assert mag(200.0) < 0.01
    elif btype == "highpass":
        assert abs(mag(499.0) - 1.0) < 1e-3
        assert abs(mag(50.0) - 1 / np.sqrt(2)) < 0.02
        assert mag(12.5) < 0.01
    else:
        assert abs(mag(np.sqrt(40 * 60)) - 1.0) < 1e-3
        assert mag(10.0) < 0.01 and mag(300.0) < 0.01


def test_filtfilt_zero_phase():
    fs = 500.0
    t = np.arange(1000) / fs
    x = np.sin(2 * np.pi * 5 * t) + 0.5 * np.sin(2 * np.pi * 100 * t)
    y = filters.filter_butterworth(x, fs, "lowpass", 20.0, order=4, method="filtfilt")
    clean = np.sin(2 * np.pi * 5 * t)
    # high freq removed, low freq preserved WITHOUT phase shift
    err = y[100:-100] - clean[100:-100]
    assert np.abs(err).max() < 0.05


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 4096)
    S = spectral.stft(x, n_fft=512, hop_length=128)
    y = spectral.istft(S, hop_length=128, length=len(x))
    assert np.abs(x[256:-256] - y[256:-256]).max() < 1e-8


def test_spectrogram_parseval_ish():
    x = np.sin(2 * np.pi * 0.1 * np.arange(2048))
    S = spectral.spectrogram(x, n_fft=256, hop_length=64)
    freqs = np.fft.rfftfreq(256)
    peak_bin = np.argmax(S.mean(axis=1))
    assert abs(freqs[peak_bin] - 0.1) < 0.01


def test_mel_and_mfcc_shapes():
    x = np.random.default_rng(4).normal(0, 1, 8192)
    M = spectral.melspectrogram(x, sr=16000, n_fft=1024, hop_length=256, n_mels=40)
    assert M.shape[0] == 40 and (M >= 0).all()
    C = spectral.mfcc(x, sr=16000, n_mfcc=13, n_fft=1024, hop_length=256, n_mels=40)
    assert C.shape[0] == 13
    D = spectral.delta(C)
    assert D.shape == C.shape


def test_db_roundtrips():
    S = np.abs(np.random.default_rng(1).normal(0, 1, (10, 10))) + 0.1
    assert np.allclose(spectral.db_to_power(spectral.power_to_db(S, top_db=None)), S)


def test_hilbert_envelope():
    t = np.arange(4096) / 1000.0
    am = 1.0 + 0.5 * np.sin(2 * np.pi * 2.0 * t)
    x = am * np.sin(2 * np.pi * 100.0 * t)
    env = properties.amplitude_envelope_hbt(x)
    assert np.abs(env[500:-500] - am[500:-500]).max() < 0.05
    inst_f = properties.instantaneous_frequency_hbt(x, fs=1000.0)
    assert abs(np.median(inst_f) - 100.0) < 1.0


def test_sma_magnitude():
    x = np.array([[3.0, 4.0], [-3.0, 4.0]])
    assert np.array_equal(properties.sma_signal(x), [7.0, 7.0])
    assert np.array_equal(properties.magnitude_signal(x), [5.0, 5.0])


def test_augmentations_deterministic():
    x = np.sin(np.linspace(0, 10, 500))
    assert np.array_equal(
        augment.add_white_noise(x, 10, seed=3), augment.add_white_noise(x, 10, seed=3)
    )
    assert not np.array_equal(
        augment.add_white_noise(x, 10, seed=3), augment.add_white_noise(x, 10, seed=4)
    )
    assert np.array_equal(augment.polarity_inversion(x), -x)
    assert len(augment.crop_ts(x, 100, seed=1)) == 100
    assert len(augment.resize_ts(x, 250)) == 250
    q = augment.quantize_ts(x, 4)
    assert len(np.unique(np.round(q, 9))) <= 4


def test_dropout_ts_ffill_is_locf():
    """The reference LOCF semantic the gap-fill stage is pinned to."""
    x = np.arange(10, dtype=np.float64)
    rng_out = augment.dropout_ts(x, p=0.5, fill="ffill", seed=7)
    drop = np.random.default_rng(7).random(10) < 0.5
    expect = x.copy()
    last = None
    first_valid = np.flatnonzero(~drop)[0]
    for i in range(10):
        if drop[i]:
            expect[i] = x[first_valid] if last is None else last
        else:
            last = x[i]
    assert np.array_equal(rng_out, expect)


def test_time_stretch_changes_length():
    x = np.sin(2 * np.pi * 0.01 * np.arange(4096))
    y = augment.time_stretch_fft(x, rate=2.0)
    assert abs(len(y) - 2048) <= 2
    y2 = augment.time_stretch_fft(x, rate=0.5)
    assert abs(len(y2) - 8192) <= 2


def test_hpss_masks_sum_to_identity():
    x = np.random.default_rng(9).normal(0, 1, 4096)
    S = spectral.stft(x, n_fft=256, hop_length=64)
    H, P = spectral.hpss(S, kernel_size=11)
    assert np.allclose(np.abs(H + P), np.abs(S), atol=1e-6)


def test_mel_to_stft_reconstruction():
    x = np.sin(2 * np.pi * 0.05 * np.arange(4096))
    S = spectral.spectrogram(x, n_fft=512, hop_length=128)
    M = spectral.mel_filter(16000, 512, 64) @ S
    S_rec = spectral.mel_to_stft(M, sr=16000, n_fft=512) ** 2
    # energy concentrated at the same bin
    assert abs(int(np.argmax(S_rec.mean(1))) - int(np.argmax(S.mean(1)))) <= 2


def test_griffinlim_reconstructs_tone():
    x = np.sin(2 * np.pi * 0.07 * np.arange(4096))
    S = np.abs(spectral.stft(x, n_fft=512, hop_length=128))
    y = spectral.griffinlim(S, n_iter=16, hop_length=128, length=len(x))
    fy = np.abs(np.fft.rfft(y))
    fx = np.abs(np.fft.rfft(x))
    assert abs(int(np.argmax(fy)) - int(np.argmax(fx))) <= 2
