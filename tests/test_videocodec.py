"""Real video decode: pure-NumPy YUV4MPEG2 parser + the frame-sample stage
with decode="real"."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray.functions.videocodec import (
    decode_y4m_bytes,
    encode_y4m_gray,
    probe_y4m_header,
)


def test_y4m_roundtrip_mono():
    rng = np.random.default_rng(2)
    frames = rng.random((5, 6, 8))
    payload = encode_y4m_gray(frames, fps=25)
    got, fps = decode_y4m_bytes(payload)
    assert fps == 25.0
    assert got.shape == (5, 6, 8)
    assert np.max(np.abs(got - frames)) <= 0.5 / 255
    hdr = probe_y4m_header(payload)
    assert hdr == {
        "width": 8, "height": 6, "fps": 25.0, "colorspace": "mono", "n_frames": 5,
    }


def test_y4m_420_layout():
    """Hand-built C420 payload: luma plane recovered, chroma skipped."""
    w, h = 4, 2
    luma = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    chroma = bytes(range((w // 2) * (h // 2) * 2))
    payload = (
        f"YUV4MPEG2 W{w} H{h} F30:1 C420jpeg\n".encode()
        + b"FRAME\n" + luma.tobytes() + chroma
        + b"FRAME\n" + luma[::-1].tobytes() + chroma
    )
    got, fps = decode_y4m_bytes(payload)
    assert got.shape == (2, 2, 4)
    assert np.array_equal(got[0], luma.astype(np.float64) / 255.0)
    assert np.array_equal(got[1], luma[::-1].astype(np.float64) / 255.0)
    assert fps == 30.0


def test_y4m_max_frames_and_errors():
    frames = np.zeros((10, 4, 4))
    payload = encode_y4m_gray(frames)
    got, _ = decode_y4m_bytes(payload, max_frames=3)
    assert got.shape[0] == 3
    with pytest.raises(ValueError):
        decode_y4m_bytes(b"not video")
    with pytest.raises(NotImplementedError):
        decode_y4m_bytes(b"YUV4MPEG2 W4 H4 F30:1 C410\nFRAME\n" + b"\x00" * 24)


def test_video_stage_real_decode_end_to_end(ray_session):
    import ray.data as rd

    from crossai_ts_ray.pipelines.multimodal import MEDIA_SCHEMA, VideoFrameSample

    rows = []
    for i, nf in enumerate((9, 12)):
        # constant-intensity frames: frame k has intensity k/16
        frames = np.tile(
            (np.arange(nf) / 16.0)[:, None, None], (1, 4, 4)
        )
        from crossai_ts_ray.functions.videocodec import encode_y4m_gray

        rows.append(
            {
                "media_id": f"v{i}", "kind": "video",
                "payload": encode_y4m_gray(frames, fps=10),
                "width": 4, "height": 4, "sample_rate": 0, "n_frames": nf,
            }
        )
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = (
        ds.map_batches(
            VideoFrameSample(every=4, decode="real"),
            batch_format="pyarrow", concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert list(out["sampled_frames"][0]) == [0, 4, 8]
    assert list(out["sampled_frames"][1]) == [0, 4, 8]
    # sampled frame k has mean intensity k/16 (quantized to 1/255 steps)
    exp = np.round(np.round(np.array([0, 4, 8]) / 16.0 * 255) / 255, 6)
    assert np.allclose(np.array(list(out["frame_means"][0])), exp, atol=1e-6)
    assert (out["fps"] == 10.0).all()


def test_y4m_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def run(n, h, w, seed):
        rng = np.random.default_rng(seed)
        frames = rng.random((n, h, w))
        got, _ = decode_y4m_bytes(encode_y4m_gray(frames))
        assert got.shape == (n, h, w)
        assert np.max(np.abs(got - frames)) <= 0.5 / 255

    run()


def test_y4m_probe_frame_bytes_in_pixels():
    """Pixel bytes containing the ASCII sequence 'FRAME' must not inflate
    the probe's frame count (ADVICE r3: stride walk, not payload count)."""
    w, h = 8, 4
    luma = np.frombuffer(b"xxFRAMExxFRAMExxFRAMExxFRAMExxxx", dtype=np.uint8)
    payload = (
        f"YUV4MPEG2 W{w} H{h} F30:1 Cmono\n".encode()
        + b"FRAME\n" + luma.tobytes()
        + b"FRAME\n" + luma.tobytes()
    )
    hdr = probe_y4m_header(payload)
    assert hdr["n_frames"] == 2
    got, _ = decode_y4m_bytes(payload)
    assert got.shape == (2, h, w)
