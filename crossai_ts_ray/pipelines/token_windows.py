"""Window-segmentation pipelines over the documents-derived token table --
driver-checkable versions of the reference's windowing operators."""

from __future__ import annotations

import pyarrow as pa

from ..sources.readers import tokens_from_documents
from ..stages.windows import window_aggregates, window_counts


def doc_window_counts(sf_dir: str, window: int = 16, overlap: int = 8):
    """Per document: number of complete sliding windows (the reference's
    count rule, /root/reference/caits/windowing.py:72)."""
    ds = tokens_from_documents(sf_dir)

    def count(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_win": pa.array(window_counts(n, window, overlap), pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def doc_window_aggs(sf_dir: str, window: int, overlap: int):
    """Per (doc, window): fused segment+aggregate over token values."""
    ds = tokens_from_documents(sf_dir)
    return ds.map_batches(
        lambda b: window_aggregates(b, window, overlap, decimals=6),
        batch_format="pyarrow",
    ).drop_columns(["source", "win_start", "win_count"])
