"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool decode / feature stages.

All three modalities decode REAL codec-free bitstreams with
``decode=\"real\"``: audio parses PCM/IEEE-float WAV (pure-NumPy RIFF,
functions/wavcodec.py), images parse PNG/BMP/PGM/PPM
(functions/imagecodec.py), video parses uncompressed YUV4MPEG2
(functions/videocodec.py).  Compressed codecs (mp3/flac, JPEG/WebP/GIF,
mp4/h264) raise inside the decoders -- the declared seam where a codec
library slots in.  ``decode=\"fake\"`` keeps a deterministic pseudo-decode
so the Ray plumbing (schema, batch size, actor signature, output layout)
is testable without any bitstream.  Reference analogue: the WAV/audio
loaders (/root/reference/caits/loading/_audio.py:16-135) which decode
bytes into channel arrays + metadata."""

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
            # REAL decode: pure-NumPy PNG/BMP/PGM/PPM parsers
            # (functions/imagecodec.py); JPEG/WebP/GIF raise inside the
            # decoder -- the declared compressed-codec seam
            from ..functions.imagecodec import decode_image_bytes

            return decode_image_bytes(bytes(payload))
        return _fake_pixels(payload, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.combine_chunks()
        sub = t.filter(pc.equal(t["kind"], "image")).combine_chunks()
        n = sub.num_rows
        if n == 0:
            return pa.table(
                {f.name: pa.nulls(0, f.type) for f in self._schema()},
                schema=self._schema(),
            )
        pay = sub["payload"]
        w = sub["width"].to_numpy(zero_copy_only=False)
        h = sub["height"].to_numpy(zero_copy_only=False)
        # per-payload decode is inherent (ragged bytes); feature math is
        # batched over a preallocated (n, out*out) matrix -- no per-row dicts
        pix = np.empty((n, self.out * self.out), dtype=np.float32)
        means = np.empty(n)
        stds = np.empty(n)
        for i in range(n):
            img = self._decode(pay[i].as_buffer(), int(w[i]), int(h[i]))
            ys = np.arange(self.out) * img.shape[0] // self.out
            xs = np.arange(self.out) * img.shape[1] // self.out
            pix[i] = img[np.ix_(ys, xs)].ravel()
            means[i] = img.mean()
            stds[i] = img.std()
        offs = pa.array(
            np.arange(0, (n + 1) * self.out * self.out, self.out * self.out, np.int32)
        )
        return pa.table(
            {
                "media_id": sub["media_id"],
                "pixels": pa.ListArray.from_arrays(
                    offs, pa.array(pix.reshape(-1), pa.float32())
                ),
                "mean_intensity": pa.array(means, pa.float64()),
                "std_intensity": pa.array(stds, pa.float64()),
            },
            schema=self._schema(),
        )

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
        import pyarrow.compute as pc

        schema = pa.schema(
            [
                ("media_id", pa.string()),
                ("rms", pa.float64()),
                ("zcr", pa.float64()),
                ("duration_s", pa.float64()),
            ]
        )
        t = batch.combine_chunks()
        sub = t.filter(pc.equal(t["kind"], "audio")).combine_chunks()
        n = sub.num_rows
        if n == 0:
            return pa.table({f.name: pa.nulls(0, f.type) for f in schema}, schema=schema)
        pay = sub["payload"]
        if self.decode == "real":
            # REAL decode: pure-NumPy RIFF/PCM WAV + pure-Python FLAC
            # (functions/wavcodec.py -- the _audio.py:16-135 soundfile
            # semantics without the codec dependency).  Ragged clips force
            # per-clip decode; the feature math stays a couple of numpy
            # reductions per clip.  Non-PCM codecs raise inside the decoder
            # (the declared compressed-codec seam).
            from ..functions.wavcodec import decode_audio_bytes

            rms = np.empty(n)
            zcr = np.empty(n)
            dur = np.empty(n)
            for i in range(n):
                audio, sr_i = decode_audio_bytes(bytes(pay[i].as_buffer()))
                mono = audio.mean(axis=1)
                rms[i] = np.sqrt((mono**2).mean()) if len(mono) else 0.0
                zcr[i] = (
                    np.sum(mono[:-1] * mono[1:] < 0) / (len(mono) - 1)
                    if len(mono) > 1
                    else 0.0
                )
                dur[i] = len(mono) / sr_i
            return pa.table(
                {
                    "media_id": sub["media_id"],
                    "rms": pa.array(rms, pa.float64()),
                    "zcr": pa.array(zcr, pa.float64()),
                    "duration_s": pa.array(dur, pa.float64()),
                },
                schema=schema,
            )
        # fixed-length fake decode -> one (n, L) matrix; rms/zcr vectorized
        # across the whole batch (axis=1), no per-clip kernel calls
        pcm = np.stack([_fake_pcm(pay[i].as_buffer()) for i in range(n)])
        rms = np.sqrt((pcm**2).mean(axis=1))
        zcr = np.sum(pcm[:, :-1] * pcm[:, 1:] < 0, axis=1) / (pcm.shape[1] - 1)
        sr = np.maximum(1, sub["sample_rate"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "media_id": sub["media_id"],
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
                "duration_s": pa.array(pcm.shape[1] / sr, pa.float64()),
            },
            schema=schema,
        )


class VideoFrameSample:
    """Actor: sample every k-th frame.  ``decode="real"`` parses YUV4MPEG2
    payloads with the pure-NumPy decoder (functions/videocodec.py) and emits
    per-sampled-frame mean intensities alongside the frame ids; compressed
    containers raise inside the decoder -- the declared seam.  The default
    metadata-level mode samples ids from ``n_frames`` without touching
    bytes (the plan-only path)."""

    def __init__(self, every: int = 10, decode: str = "fake"):
        self.every = every
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.decode == "real":
            return self._real(batch)
        schema = pa.schema(
            [("media_id", pa.string()), ("sampled_frames", pa.list_(pa.int32()))]
        )
        t = batch.combine_chunks()
        sub = t.filter(pc.equal(t["kind"], "video")).combine_chunks()
        n = sub.num_rows
        if n == 0:
            return pa.table({f.name: pa.nulls(0, f.type) for f in schema}, schema=schema)
        nf = sub["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = -(-nf // self.every)  # ceil
        offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        # frame ids for all rows in one arange (vectorized ragged build)
        local = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            offs[:-1].astype(np.int64), counts
        )
        values = (local * self.every).astype(np.int32)
        return pa.table(
            {
                "media_id": sub["media_id"],
                "sampled_frames": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(values, pa.int32())
                ),
            },
            schema=schema,
        )

    def _real(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.imagecodec import decode_gif_frames
        from ..functions.videocodec import decode_y4m_bytes

        def decode_clip(raw: bytes):
            # magic dispatch: Y4M or animated GIF (both -> (frames, fps))
            if raw[:3] == b"GIF":
                return decode_gif_frames(raw)
            return decode_y4m_bytes(raw)

        schema = pa.schema(
            [
                ("media_id", pa.string()),
                ("sampled_frames", pa.list_(pa.int32())),
                ("frame_means", pa.list_(pa.float64())),
                ("fps", pa.float64()),
            ]
        )
        t = batch.combine_chunks()
        sub = t.filter(pc.equal(t["kind"], "video")).combine_chunks()
        n = sub.num_rows
        if n == 0:
            return pa.table({f.name: pa.nulls(0, f.type) for f in schema}, schema=schema)
        pay = sub["payload"]
        ids_out, means_out, fps_out, counts = [], [], np.empty(n), []
        for i in range(n):
            frames, fps = decode_clip(bytes(pay[i].as_buffer()))
            sel = np.arange(0, len(frames), self.every, dtype=np.int32)
            ids_out.append(sel)
            # per-frame luma mean over ALL sampled frames, one reduction
            means_out.append(frames[sel].mean(axis=(1, 2)))
            fps_out[i] = fps
            counts.append(len(sel))
        offs = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int32), pa.int32()
        )
        return pa.table(
            {
                "media_id": sub["media_id"],
                "sampled_frames": pa.ListArray.from_arrays(
                    offs, pa.array(np.concatenate(ids_out), pa.int32())
                ),
                "frame_means": pa.ListArray.from_arrays(
                    offs,
                    pa.array(
                        np.round(np.concatenate(means_out), 6), pa.float64()
                    ),
                ),
                "fps": pa.array(fps_out, pa.float64()),
            },
            schema=schema,
        )


def synth_real_media_table(n: int = 96, seed: int = 0) -> pa.Table:
    """Deterministic media corpus with REAL payloads: PCM16 WAV clips
    (functions/wavcodec.encode_wav_pcm16) interleaved with FLAC clips
    (functions/flaccodec.encode_flac_pcm16 -- exercises the
    magic-dispatched compressed-audio decode in the actor pool),
    grayscale PNGs (functions/imagecodec.encode_png_gray) interleaved
    with baseline JPEGs (functions/jpegcodec.encode_jpeg) and GIFs
    (imagecodec.encode_gif_gray, one interlaced -- exercises the
    magic-dispatched compressed-image decode), and Y4M video clips
    (functions/videocodec.encode_y4m_gray), so the decode='real' path
    runs end to end for all modalities with no external data."""
    from ..functions.flaccodec import encode_flac_pcm16
    from ..functions.imagecodec import (
        encode_gif_frames,
        encode_gif_gray,
        encode_png_gray,
    )
    from ..functions.jpegcodec import encode_jpeg
    from ..functions.videocodec import encode_y4m_gray
    from ..functions.wavcodec import encode_wav_pcm16

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 == 0:
            sr = 8000
            t = np.arange(sr // 10) / sr
            amp = 0.2 + 0.6 * rng.random()
            x = amp * np.sin(2 * np.pi * (100 + 50 * (i % 7)) * t)
            enc = (encode_flac_pcm16(x[:, None], sr) if i % 6 == 0
                   else encode_wav_pcm16(x, sr))
            rows.append(
                {
                    "media_id": f"m{i:05d}", "kind": "audio",
                    "payload": enc,
                    "width": 0, "height": 0, "sample_rate": sr, "n_frames": 0,
                }
            )
        elif i % 3 == 1:
            w = h = 16 + 8 * (i % 3)
            img = rng.random((h, w))
            if i % 6 == 1:
                enc = encode_jpeg(img, quality=95)
            elif i % 12 == 4:
                enc = encode_gif_gray(img, interlace=bool(i % 24 == 4))
            else:
                enc = encode_png_gray(img)
            rows.append(
                {
                    "media_id": f"m{i:05d}", "kind": "image",
                    "payload": enc,
                    "width": w, "height": h, "sample_rate": 0, "n_frames": 0,
                }
            )
        else:
            nf = 12 + (i % 5)
            clip = rng.random((nf, 8, 8))
            enc = (encode_gif_frames(clip, delay_cs=10) if i % 6 == 5
                   else encode_y4m_gray(clip, fps=10))
            rows.append(
                {
                    "media_id": f"m{i:05d}", "kind": "video",
                    "payload": enc,
                    "width": 8, "height": 8, "sample_rate": 0, "n_frames": nf,
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_features(sf_dir: str, n: int = 96) -> pa.Table:
    """Driver query: REAL decode end to end over the deterministic synthetic
    media corpus -- WAV clips through the RIFF decoder, PNGs through the PNG
    unfilter -- via the actor-pool stages, unioned into one feature table
    (media_id, modality, f1, f2).  Rows-only: byte-level codecs have no SQL
    oracle; decoder exactness is pytest-verified against spec fixtures."""
    import ray.data as rd

    ds = rd.from_arrow(synth_real_media_table(n))
    aud = ds.map_batches(
        AudioDecodeFeatures(decode="real"),
        batch_format="pyarrow", batch_size=32, concurrency=2,
    )
    img = ds.map_batches(
        ImageDecodeResize(out_size=8, decode="real"),
        batch_format="pyarrow", batch_size=32, concurrency=2,
    )
    vid = ds.map_batches(
        VideoFrameSample(every=4, decode="real"),
        batch_format="pyarrow", batch_size=32, concurrency=2,
    )

    out_schema = pa.schema(
        [
            ("media_id", pa.string()),
            ("modality", pa.string()),
            ("f1", pa.float64()),
            ("f2", pa.float64()),
        ]
    )

    def shape_aud(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["media_id"],
                "modality": pa.array(["audio"] * t.num_rows, pa.string()),
                "f1": t["rms"],
                "f2": t["zcr"],
            },
            schema=out_schema,
        )

    def shape_img(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["media_id"],
                "modality": pa.array(["image"] * t.num_rows, pa.string()),
                "f1": t["mean_intensity"],
                "f2": t["std_intensity"],
            },
            schema=out_schema,
        )

    def shape_vid(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        fm = t["frame_means"]
        if isinstance(fm, pa.ChunkedArray):
            fm = fm.combine_chunks()
        flat = fm.flatten().to_numpy(zero_copy_only=False)
        offs = fm.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        counts = np.maximum(offs[1:] - offs[:-1], 1)
        sums = (
            np.add.reduceat(flat, offs[:-1])
            if len(flat)
            else np.zeros(t.num_rows)
        )
        return pa.table(
            {
                "media_id": t["media_id"],
                "modality": pa.array(["video"] * t.num_rows, pa.string()),
                "f1": pa.array(np.round(sums / counts, 6), pa.float64()),
                "f2": pa.array(counts.astype(np.float64), pa.float64()),
            },
            schema=out_schema,
        )

    return (
        aud.map_batches(shape_aud, batch_format="pyarrow")
        .union(img.map_batches(shape_img, batch_format="pyarrow"))
        .union(vid.map_batches(shape_vid, batch_format="pyarrow"))
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
