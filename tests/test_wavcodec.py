"""Real WAV decode: pure-NumPy RIFF parser vs the stdlib ``wave`` writer,
all PCM depths + IEEE float, wav_loader, and the actor-pool audio stage with
decode="real" end to end."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray.functions.wavcodec import decode_wav_bytes, encode_wav_pcm16


def _stdlib_wav(pcm16: np.ndarray, sr: int, n_ch: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm16.astype("<i2").tobytes())
    return buf.getvalue()


def test_pcm16_matches_stdlib_writer():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-(1 << 15), 1 << 15, size=400, dtype=np.int64)
    payload = _stdlib_wav(pcm, sr=8000, n_ch=2)
    audio, sr = decode_wav_bytes(payload)
    assert sr == 8000
    assert audio.shape == (200, 2)
    # soundfile normalization: int16 / 2^15
    assert np.array_equal(audio.reshape(-1), pcm.astype(np.float64) / (1 << 15))
    # raw integer dtype passthrough
    raw, _ = decode_wav_bytes(payload, dtype="int16")
    assert np.array_equal(raw.reshape(-1), pcm.astype(np.int16))


def _manual_wav(fmt_tag: int, bits: int, n_ch: int, sr: int, body: bytes) -> bytes:
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_tag, n_ch, sr, sr * n_ch * bits // 8, n_ch * bits // 8, bits
    )
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body


def test_float32_and_float64_payloads():
    x = np.linspace(-1, 1, 64)
    for bits, dt in ((32, "<f4"), (64, "<f8")):
        payload = _manual_wav(3, bits, 1, 16000, x.astype(dt).tobytes())
        audio, sr = decode_wav_bytes(payload)
        assert sr == 16000
        assert np.allclose(audio[:, 0], x, atol=1e-6 if bits == 32 else 0)


def test_pcm8_and_pcm24_and_pcm32():
    # uint8: recentered by 128
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    a, _ = decode_wav_bytes(_manual_wav(1, 8, 1, 8000, u8.tobytes()))
    assert np.array_equal(a[:, 0], (u8.astype(np.float64) - 128) / 128)
    # int32: / 2^31
    i32 = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype="<i4")
    a, _ = decode_wav_bytes(_manual_wav(1, 32, 1, 8000, i32.tobytes()))
    assert np.array_equal(a[:, 0], i32.astype(np.float64) / (1 << 31))
    # int24 little-endian triplets: / 2^23
    vals = np.array([-(1 << 23), -1, 0, 1, (1 << 23) - 1], dtype=np.int64)
    tri = ((vals & 0xFFFFFF).astype(np.uint32)).astype(np.uint32)
    body = b"".join(struct.pack("<I", v)[:3] for v in tri)
    a, _ = decode_wav_bytes(_manual_wav(1, 24, 1, 8000, body))
    assert np.array_equal(a[:, 0], vals.astype(np.float64) / (1 << 23))


def test_roundtrip_through_own_encoder():
    rng = np.random.default_rng(9)
    x = rng.uniform(-0.9, 0.9, size=(300, 2))
    audio, sr = decode_wav_bytes(encode_wav_pcm16(x, 22050))
    assert sr == 22050
    assert audio.shape == (300, 2)
    assert np.max(np.abs(audio - x)) <= 1.0 / (1 << 15)


def test_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        decode_wav_bytes(b"not a wav at all")
    # fmt tag 85 (MP3) -> declared compressed-codec seam
    with pytest.raises(NotImplementedError):
        decode_wav_bytes(_manual_wav(85, 16, 1, 8000, b"\x00" * 64))


def test_wav_loader_file_and_resample(tmp_path):
    from crossai_ts_ray.sources.loaders import wav_loader, wav_specs_check

    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = tmp_path / "tone.wav"
    p.write_bytes(encode_wav_pcm16(x, 8000))
    audio, sr = wav_loader(str(p))
    assert sr == 8000 and audio.shape == (800, 1)
    assert np.max(np.abs(audio[:, 0] - x)) <= 1.0 / (1 << 15)
    specs = wav_specs_check(str(p))
    assert specs["framerate"] == 8000 and specs["nchannels"] == 1
    # per-channel resample to half rate
    half, sr2 = wav_loader(str(p), target_sr=4000)
    assert sr2 == 4000 and half.shape == (400, 1)


def test_audio_stage_real_decode_end_to_end(ray_session):
    """Actor-pool map_batches with decode='real': known sine -> known rms."""
    import ray.data as rd

    from crossai_ts_ray.pipelines.multimodal import MEDIA_SCHEMA, AudioDecodeFeatures

    t = np.arange(1600) / 16000.0
    rows = []
    for i, amp in enumerate((0.25, 0.5, 0.9)):
        x = amp * np.sin(2 * np.pi * 200 * t)
        rows.append(
            {
                "media_id": f"a{i}",
                "kind": "audio",
                "payload": encode_wav_pcm16(x, 16000),
                "width": 0,
                "height": 0,
                "sample_rate": 16000,
                "n_frames": 0,
            }
        )
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = (
        ds.map_batches(
            AudioDecodeFeatures(decode="real"), batch_format="pyarrow", concurrency=2
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == 3
    # sine rms = amp / sqrt(2), to PCM16 quantization accuracy
    exp = np.array([0.25, 0.5, 0.9]) / np.sqrt(2)
    assert np.allclose(out["rms"].to_numpy(), exp, atol=1e-3)
    assert np.allclose(out["duration_s"].to_numpy(), 0.1)


def test_wav_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0 - 2**-15, width=64),
            min_size=1, max_size=200,
        ),
        st.integers(min_value=1, max_value=4),
        st.sampled_from([8000, 16000, 44100]),
    )
    def run(vals, n_ch, sr):
        x = np.array(vals, dtype=np.float64)
        x = x[: (len(x) // n_ch) * n_ch]
        if not len(x):
            x = np.zeros(n_ch)
        x = x.reshape(-1, n_ch)
        audio, got_sr = decode_wav_bytes(encode_wav_pcm16(x, sr))
        assert got_sr == sr
        assert audio.shape == x.shape
        assert np.max(np.abs(audio - x)) <= 1.0 / (1 << 15)

    run()
