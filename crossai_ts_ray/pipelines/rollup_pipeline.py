"""Flagship pipeline compositions: token table -> tier cascade (-> gap-fill
-> codec -> partitioned parquet).

Two input paths:
* native: the sharded synthetic token table (synth.py) -- the scale path,
  used by bench.py and the checkpointed job runner (state/checkpoint.py);
* derived: token table derived from ``documents.parquet`` -- the
  driver-correctness path, whose results have a DuckDB-expressible oracle
  (__ray_entry__.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import Tier
from ..sources.readers import read_token_table, tokens_from_documents
from ..stages.rollup import rollup_cascade

# Tier widths for the documents-derived table (documents has ~25 rows per
# source at sf0.01; 4/8/16 give several buckets per source at every tier).
DOC_TIERS = (Tier("w4", 4), Tier("w8", 8), Tier("w16", 16))

ROUND_COLS = ["mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]


def round_for_oracle(batch: pa.Table, decimals: int = 6) -> pa.Table:
    """Round float stat columns so Ray and DuckDB oracle values are exactly
    equal (both sides compute the same real number up to last-bit summation
    order; 6 decimals removes that; verified by tools/verify_correctness.py)."""
    for c in ROUND_COLS:
        if c in batch.schema.names:
            v = np.round(batch[c].to_numpy(zero_copy_only=False), decimals)
            batch = batch.set_column(
                batch.schema.get_field_index(c), c, pa.array(v, pa.float64())
            )
    return batch


def documents_rollup(sf_dir: str, tier_name: str = "w4", salt_mod: int = 4):
    """Derived token table -> tier cascade; returns the requested tier,
    rounded for oracle comparison."""
    ds = tokens_from_documents(sf_dir)
    out = rollup_cascade(ds, DOC_TIERS, salt_mod=salt_mod, batch_size=4096)
    return out[tier_name].map_batches(round_for_oracle, batch_format="pyarrow")


def synth_rollup(token_dir: str, tiers, salt_mod: int = 8, batch_size: int = 8192):
    """Native path over the sharded synthetic table; returns dict of tier
    Datasets (not rounded -- bitwise vs oracle)."""
    ds = read_token_table(token_dir)
    return rollup_cascade(ds, tiers, salt_mod=salt_mod, batch_size=batch_size)
