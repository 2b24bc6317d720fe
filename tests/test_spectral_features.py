"""Spectral aggregate family (caits/fe/_spectral.py semantics): scalar
kernels, vectorized matrix kernel parity, welch/simpson stand-ins, and the
Ray pipeline surface."""

from __future__ import annotations

import numpy as np
import pytest

from crossai_ts_ray.functions import spectral_features as sfx

FS = 1000.0


def _sine(f, n=1000, fs=FS):
    # n=1000 @ fs=1000 -> integer cycle counts, no spectral leakage
    t = np.arange(n) / fs
    return np.sin(2 * np.pi * f * t)


def test_centroid_tracks_tone_frequency():
    lo = sfx.spectral_centroid(_sine(50), FS)
    hi = sfx.spectral_centroid(_sine(300), FS)
    assert abs(lo - 50) < 5
    assert abs(hi - 300) < 5


def test_spread_skewness_kurtosis_consistency():
    x = _sine(50) + 0.5 * _sine(120)
    sp = sfx.spectral_spread(x, FS)
    assert sp > 0
    # skewness/kurtosis are standardized moments of the magnitude dist
    sk = sfx.spectral_skewness(x, FS)
    ku = sfx.spectral_kurtosis(x, FS)
    assert np.isfinite(sk) and np.isfinite(ku) and ku > 0


def test_rolloff_is_bin_index():
    x = _sine(50)
    r = sfx.spectral_rolloff(x, FS, perc=0.95)
    # pure 50 Hz tone, 1024 samples @ 1 kHz -> bin ~51
    assert 45 <= r <= 60
    # 100% energy -> last contributing bin, monotone in perc
    assert sfx.spectral_rolloff(x, FS, 0.5) <= sfx.spectral_rolloff(x, FS, 0.99)


def test_flatness_noise_vs_tone():
    rng = np.random.default_rng(3)
    noise = rng.normal(size=2048)
    tone = _sine(100, 2048)
    assert sfx.spectral_flatness(noise, FS) > 10 * sfx.spectral_flatness(tone, FS)


def test_slope_negative_for_decaying_spectrum():
    # pink-ish: cumulative sum of white noise has falling spectrum
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.normal(size=2048))
    assert sfx.spectral_slope(x, FS, 0, 500) < 0


def test_bandwidth_wider_for_two_tones():
    one = sfx.spectral_bandwidth(_sine(100), FS)
    two = sfx.spectral_bandwidth(_sine(100) + _sine(400), FS)
    assert two > one


def test_simpson_matches_analytic():
    # integral of x^2 over [0, 1] = 1/3 (Simpson exact for quadratics, odd n)
    x = np.linspace(0, 1, 101)
    assert sfx.simpson(x**2, dx=0.01) == pytest.approx(1 / 3, abs=1e-12)
    # even sample count: close, not exact
    x = np.linspace(0, 1, 100)
    assert sfx.simpson(x**2, dx=1 / 99) == pytest.approx(1 / 3, abs=1e-4)


def test_welch_parseval_density():
    rng = np.random.default_rng(7)
    x = rng.normal(size=4096)
    freqs, psd = sfx.welch(x, FS, nperseg=512)
    # density integrates to ~variance (white noise)
    df = freqs[1] - freqs[0]
    assert np.sum(psd) * df == pytest.approx(np.var(x), rel=0.1)


def test_psd_banded_relative_power():
    x = _sine(100, 4096)
    bands = sfx.power_spectral_density(
        x, FS, freq_cuts=[(0, 50), (75, 125), (150, 400)]
    )
    assert bands[1] > 0.9  # the tone band dominates
    d = sfx.power_spectral_density(
        x, FS, freq_cuts=[(0, 50), (75, 125)], export="dict"
    )
    assert set(d) == {"PSD_0-50", "PSD_75-125"}
    with pytest.raises(ValueError):
        sfx.power_spectral_density(x, FS, export="bogus")


def test_matrix_kernel_matches_scalar():
    rng = np.random.default_rng(11)
    frames = rng.normal(size=(7, 256))
    got = sfx.spectral_values_matrix(frames, FS)
    for i in range(7):
        want = sfx.spectral_values(frames[i], FS)
        for k, v in want.items():
            assert got[k][i] == pytest.approx(v, rel=1e-9, abs=1e-12), k


def test_matrix_kernel_long_window_fallback():
    rng = np.random.default_rng(13)
    frames = rng.normal(size=(3, 1200))  # > nperseg_th=900 -> welch loop path
    got = sfx.spectral_values_matrix(frames, FS)
    for i in range(3):
        want = sfx.spectral_values(frames[i], FS)
        for k, v in want.items():
            assert got[k][i] == pytest.approx(v, rel=1e-9, abs=1e-12), k


def test_spectral_values_bundle_keys():
    x = _sine(80)
    d = sfx.spectral_values(x, FS)
    assert set(d) == {
        "spectral_centroid", "spectral_rolloff", "spectral_spread",
        "spectral_skewness", "spectral_kurtosis", "spectral_bandwidth",
        "spectral_flatness", "spectral_std", "spectral_slope",
        "spectral_decrease",
    }


def test_mfcc_stats_bundle():
    from crossai_ts_ray.functions.spectral import mfcc, mfcc_stats

    rng = np.random.default_rng(17)
    x = rng.normal(size=8192)
    d = mfcc_stats(x, sr=8000, n_mfcc=13, export="dict")
    assert set(d) == {"mfcc_mean", "mfcc_std", "delta_mean", "delta2_mean"}
    assert all(v.shape == (13,) for v in d.values())
    arr = mfcc_stats(x, sr=8000, n_mfcc=13)
    assert arr.shape == (52,)
    m = mfcc(x, sr=8000, n_mfcc=13)
    np.testing.assert_allclose(d["mfcc_mean"], m.mean(axis=1))
    with pytest.raises(ValueError):
        mfcc_stats(x, export="bogus")


def test_mel_to_audio_roundtrip_energy():
    from crossai_ts_ray.functions.spectral import mel_to_audio, melspectrogram

    fs = 8000
    t = np.arange(4096) / fs
    x = np.sin(2 * np.pi * 440 * t)
    M = melspectrogram(x, sr=fs, n_fft=512, hop_length=128, n_mels=64)
    y = mel_to_audio(M, sr=fs, n_fft=512, hop_length=128, n_iter=8, length=len(x))
    assert y.shape == x.shape
    # reconstruction concentrates energy near the tone frequency
    Y = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(len(y), 1 / fs)
    peak = f[np.argmax(Y)]
    assert abs(peak - 440) < 30


def test_doc_spectral_features_pipeline(ray_session):
    from crossai_ts_ray.pipelines.feature_pipeline import (
        FEATURE_NAMES,
        doc_spectral_features,
    )
    from crossai_ts_ray.util import dataset_to_table

    t = dataset_to_table(doc_spectral_features("/root/testdata/sf0.001", window=32, overlap=16))
    assert t.num_rows > 0
    assert set(FEATURE_NAMES) <= set(t.schema.names)
    # window count parity: sum over docs of 1 + (n - w) // hop for n >= w
    import duckdb

    n_tok = duckdb.sql(
        "SELECT length(string_split(text, ' ')) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchnumpy()
    n = list(n_tok.values())[0].astype(np.int64)
    want = int(np.sum(np.where(n >= 32, 1 + (n - 32) // 16, 0)))
    assert t.num_rows == want
    # deterministic across runs
    t2 = dataset_to_table(doc_spectral_features("/root/testdata/sf0.001", window=32, overlap=16))
    import pyarrow.compute as pc

    s1 = t.sort_by([("doc_id", "ascending"), ("win_id", "ascending")])
    s2 = t2.sort_by([("doc_id", "ascending"), ("win_id", "ascending")])
    assert s1.equals(s2)
