"""Per-window spectral feature extraction over the documents-derived token
table -- the Ray-side surface for the ``caits/fe/_spectral.py`` aggregate
family (see functions/spectral_features.py for the kernels).

Shape: one ``map_batches`` pass; each task frames every doc's token signal
into complete sliding windows (stride-tricked view, no copy), stacks ALL
windows of the batch into one (W, L) matrix, and runs the vectorized
``spectral_values_matrix`` kernel -- one rfft per batch, not per window.
No shuffle: windowing is per-doc, embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.spectral_features import spectral_values_matrix
from ..sources.readers import tokens_from_documents

FEATURE_NAMES = (
    "spectral_centroid",
    "spectral_rolloff",
    "spectral_spread",
    "spectral_skewness",
    "spectral_kurtosis",
    "spectral_bandwidth",
    "spectral_flatness",
    "spectral_std",
    "spectral_slope",
    "spectral_decrease",
)


def _batch_spectral(t: pa.Table, window: int, overlap: int, fs: float) -> pa.Table:
    t = t.combine_chunks()
    tok = t["tokens"]
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    flat = tok.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    dids = t["doc_id"].to_numpy(zero_copy_only=False) if t["doc_id"].type != pa.string() else np.asarray(t["doc_id"].to_pylist())
    hop = window - overlap
    frames_list, rep_doc, win_ids = [], [], []
    for i in range(t.num_rows):
        x = flat[offs[i] : offs[i + 1]]
        n = len(x)
        if n < window:
            continue
        m = 1 + (n - window) // hop
        v = np.lib.stride_tricks.as_strided(
            x, shape=(m, window), strides=(x.strides[0] * hop, x.strides[0])
        )
        frames_list.append(v)
        rep_doc.append(np.repeat(dids[i], m))
        win_ids.append(np.arange(m, dtype=np.int64))
    empty_cols = {
        "doc_id": pa.nulls(0, pa.string()),
        "win_id": pa.nulls(0, pa.int64()),
        **{f: pa.nulls(0, pa.float64()) for f in FEATURE_NAMES},
    }
    if not frames_list:
        return pa.table(empty_cols)
    frames = np.vstack(frames_list)
    feats = spectral_values_matrix(frames, fs)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(rep_doc).astype(str), pa.string()),
            "win_id": pa.array(np.concatenate(win_ids), pa.int64()),
            **{
                f: pa.array(np.round(feats[f], 6), pa.float64())
                for f in FEATURE_NAMES
            },
        }
    )


def doc_spectral_features(
    sf_dir: str, window: int = 64, overlap: int = 32, fs: float = 8000.0
):
    """(doc, window) -> the 10-feature spectral bundle over token signals.
    fs=8000 makes the reference's default [0, 8000] Hz slope/decrease band
    span the full half-spectrum."""
    ds = tokens_from_documents(sf_dir)
    return ds.map_batches(
        lambda b: _batch_spectral(b, window, overlap, fs),
        batch_format="pyarrow",
    )
