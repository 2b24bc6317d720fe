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


# ---------------------------------------------------------------------------
# Tier anomaly scan: trailing-window z-score over a tier's bucket means
# ---------------------------------------------------------------------------


def tier_anomaly(sf_dir: str, tier_name: str = "w4", trail: int = 8,
                 z_thresh: float = 3.0):
    """Data-drift monitor over a ROLLUP TIER (never raw tokens): for each
    (source, bucket) row of the tier, z-score the bucket's mean ``n_tok``
    against the source's trailing ``trail``-bucket window (the bucket itself
    excluded), flagging ``|z| > z_thresh``.  This is the continuous-aggregate
    payoff the north star asks for -- anomaly scans run on the downsampled
    tiers, so a 100-TB raw table is monitored by scanning rollup-sized data.

    Exactness (bitwise-mirrored oracle, no rounding bridge on the stats):
    the tier's round-6 ``mean`` is re-quantized to exact int64 micro-units;
    trailing window count/sum/sum-of-squares are exact integer prefix-sum
    differences (order-free), and both sides evaluate the SAME float
    expression over those ints: ``avg = S1/n``; ``var = (S2 - S1*S1/n) /
    (n-1)``; ``z = (x - avg)/sqrt(var)``.  Identical ints + identical op
    order = identical doubles.  ``z`` is NULL when the window has <2 rows
    or zero variance.

    Scale shape: the per-source series is tier-bucket-sized (already
    aggregated), so the groupby moves rollup-sized rows; the scan is a
    vectorized cumsum, no per-row Python.
    """
    tier = documents_rollup(sf_dir, tier_name).select_columns(
        ["source", "bucket", "mean"]
    )

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("bucket", pa.int64()),
            ("mean", pa.float64()),
            ("trail_n", pa.int64()),
            ("trail_mean", pa.float64()),
            ("z", pa.float64()),
            ("is_anomaly", pa.bool_()),
        ]
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        n = g.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        b = g["bucket"].to_numpy(zero_copy_only=False)
        m = g["mean"].to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        b, m = b[order], m[order]
        xu = np.rint(m * 1e6).astype(np.int64)  # exact micro-units
        if np.abs(xu).max(initial=0) > 1_000_000_000:
            raise ValueError(
                "tier_anomaly: |mean| > 1000 overflows the int64 "
                "sum-of-squares window; re-quantize with a coarser unit"
            )
        c1 = np.concatenate(([0], np.cumsum(xu)))
        c2 = np.concatenate(([0], np.cumsum(xu * xu)))
        idx = np.arange(n)
        lo = np.maximum(idx - trail, 0)
        pn = idx - lo                      # rows in [i-trail, i)
        s1 = (c1[idx] - c1[lo]).astype(np.float64)
        s2 = (c2[idx] - c2[lo]).astype(np.float64)
        pnf = pn.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = s1 / pnf
            var = (s2 - s1 * s1 / pnf) / (pnf - 1.0)
            z = (xu.astype(np.float64) - avg) / np.sqrt(var)
            trail_mean = avg / 1e6
        valid = (pn >= 2) & (var > 0.0)
        zr = np.round(np.where(valid, z, 0.0), 6)
        src = g["source"][0].as_py()
        return pa.table(
            {
                "source": pa.array([src] * n, pa.string()),
                "bucket": pa.array(b, pa.int64()),
                "mean": pa.array(xu / 1e6, pa.float64()),
                "trail_n": pa.array(pn.astype(np.int64), pa.int64()),
                "trail_mean": pa.array(
                    np.where(pn > 0, trail_mean, np.nan),
                    pa.float64(),
                    mask=(pn == 0),
                ),
                "z": pa.array(zr, pa.float64(), mask=~valid),
                "is_anomaly": pa.array(
                    valid & (np.abs(z) > z_thresh), pa.bool_()
                ),
            },
            schema=out_schema,
        )

    return tier.groupby("source").map_groups(scan, batch_format="pyarrow")
