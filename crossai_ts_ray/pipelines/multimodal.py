"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool decode / feature stages.

The image/audio codec libraries are NOT in this container, so the byte-level
decode is STUBBED: ``decode=\"fake\"`` produces a deterministic pseudo-decode
from the bytes (so the full Ray plumbing -- schema, batch size, actor
signature, output layout -- is real and tested); ``decode=\"real\"`` raises
``NotImplementedError`` pointing at the import seam where PIL/soundfile slot
in.  Reference analogue: the WAV/audio loaders
(/root/reference/caits/loading/_audio.py:16-135) which decode bytes into
channel arrays + metadata."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8)
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": kind,
                "payload": payload.tobytes(),
                "width": 32 if kind == "image" else 0,
                "height": 32 if kind == "image" else 0,
                "sample_rate": 16000 if kind == "audio" else 0,
                "n_frames": 30 if kind == "video" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-decode: bytes -> (h, w) float image in [0,1]."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = w * h
    reps = -(-need // len(raw))
    return (np.tile(raw, reps)[:need].reshape(h, w).astype(np.float64)) / 255.0


def _fake_pcm(payload: bytes, n: int = 2048) -> np.ndarray:
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    reps = -(-n // len(raw))
    return (np.tile(raw, reps)[:n] - 127.5) / 127.5


class ImageDecodeResize:
    """Actor: decode -> resize -> per-image features.  Real decode slots in
    at the marked seam; the Ray-side contract (arrow in/out, small batches
    for large payloads, per-actor init) is the tested part."""

    def __init__(self, out_size: int = 16, decode: str = "fake"):
        self.out = out_size
        self.decode = decode

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.decode == "real":
            raise NotImplementedError(
                "real image decode requires PIL/opencv (not in this container); "
                "plug in here: bytes -> np.ndarray(h, w[, c])"
            )
        return _fake_pixels(payload, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        rows = []
        for r in t.to_pylist():
            if r["kind"] != "image":
                continue
            img = self._decode(r["payload"], r["width"], r["height"])
            # nearest-neighbor resize (vectorized index grid)
            ys = (np.arange(self.out) * img.shape[0] // self.out)
            xs = (np.arange(self.out) * img.shape[1] // self.out)
            small = img[np.ix_(ys, xs)]
            rows.append(
                {
                    "media_id": r["media_id"],
                    "pixels": small.ravel().astype(np.float32).tolist(),
                    "mean_intensity": float(img.mean()),
                    "std_intensity": float(img.std()),
                }
            )
        return pa.Table.from_pylist(rows, schema=self._schema())

    @staticmethod
    def _schema():
        return pa.schema(
            [
                ("media_id", pa.string()),
                ("pixels", pa.list_(pa.float32())),
                ("mean_intensity", pa.float64()),
                ("std_intensity", pa.float64()),
            ]
        )


class AudioDecodeFeatures:
    """Actor: decode -> frame -> per-clip features (rms/zcr series stats),
    reusing the engine's stats kernels."""

    def __init__(self, decode: str = "fake"):
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.stats import rms_value, zcr_value

        t = batch.combine_chunks()
        rows = []
        for r in t.to_pylist():
            if r["kind"] != "audio":
                continue
            if self.decode == "real":
                raise NotImplementedError(
                    "real audio decode requires soundfile (not in this "
                    "container); plug in here: bytes -> (pcm, sr)"
                )
            pcm = _fake_pcm(r["payload"])
            rows.append(
                {
                    "media_id": r["media_id"],
                    "rms": float(rms_value(pcm)),
                    "zcr": float(zcr_value(pcm)),
                    "duration_s": len(pcm) / max(1, r["sample_rate"]),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_id", pa.string()),
                    ("rms", pa.float64()),
                    ("zcr", pa.float64()),
                    ("duration_s", pa.float64()),
                ]
            ),
        )


class VideoFrameSample:
    """Actor: sample every k-th frame id (metadata-level; decode stubbed)."""

    def __init__(self, every: int = 10):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        rows = []
        for r in t.to_pylist():
            if r["kind"] != "video":
                continue
            frames = list(range(0, r["n_frames"], self.every))
            rows.append({"media_id": r["media_id"], "sampled_frames": frames})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("media_id", pa.string()), ("sampled_frames", pa.list_(pa.int32()))]
            ),
        )


def media_pipeline(media_ds, out_size: int = 16):
    """Compose the three modality stages as actor pools over one mixed
    corpus; large binary payloads -> small batch_size (memory-aware)."""
    img = media_ds.map_batches(
        ImageDecodeResize,
        fn_constructor_kwargs={"out_size": out_size},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )
    aud = media_ds.map_batches(
        AudioDecodeFeatures, batch_format="pyarrow", batch_size=32, concurrency=2
    )
    vid = media_ds.map_batches(
        VideoFrameSample, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return img, aud, vid
