"""Core schema + bucket/offset arithmetic for the token-sequence table.

The one logical input table (BASELINE.json ``input_hint``)::

    doc_id: string       -- unique instance id (reference: DatasetList._id,
                            /root/reference/caits/dataset/_dataset/_list.py:27)
    tokens: list<int32>  -- the 1-D signal (reference: CoreArray.values,
                            /root/reference/caits/dataset/_core/_array.py:9)
    n_tok:  int32        -- per-row scalar stream (len(tokens))
    source: string       -- series key (reference: class label y / subdir,
                            /root/reference/caits/loading/_csv_read.py:44)
    seq:    int64        -- per-source running sequence number; the engine's
                            time axis.  The reference keeps time implicit as a
                            row offset x 1/fs (caits/convert.py:81-97); here the
                            offset is materialized so bucket assignment never
                            needs a global sort.

Retention tiers are keyed by sequence-offset buckets:
``bucket = seq // tier_width`` (reference analogue: ``create_chunks``
fixed-length chunking, /root/reference/caits/windowing.py:188).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

VOCAB_SIZE = 50257  # GPT-2-ish vocabulary; token values in [0, VOCAB_SIZE)
MAX_N_TOK = 2048

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("seq", pa.int64()),
    ]
)


@dataclass(frozen=True)
class Tier:
    """One retention tier: a bucket width over per-source sequence offsets."""

    name: str
    width: int  # rows (seq offsets) per bucket

    def bucket_of(self, seq):
        return seq // self.width


# Default cascade: raw -> 1m -> 1h -> 1d equivalents over sequence offsets
# (60 / 3600 / 86400 rows per bucket, mirroring 1s-resolution wall time).
DEFAULT_TIERS = (Tier("1m", 60), Tier("1h", 3600), Tier("1d", 86400))

# Small widths used for the documents-derived table in driver correctness
# queries (sf0.01 documents has only ~5k rows; 60/3600/86400 would give a
# single bucket per source).
SMALL_TIERS = (Tier("w16", 16), Tier("w128", 128), Tier("w1024", 1024))


# Rollup output schema per tier (FIXTURES.md F4) -- stats over the n_tok
# stream plus the flattened token stream.
ROLLUP_FIELDS = [
    ("source", pa.string()),
    ("bucket", pa.int64()),
    ("count", pa.int64()),
    ("sum", pa.int64()),
    ("mean", pa.float64()),
    ("min", pa.int32()),
    ("max", pa.int32()),
    ("p50", pa.float64()),
    ("p99", pa.float64()),
    ("tok_count", pa.int64()),
    ("tok_sum", pa.int64()),
    ("tok_mean", pa.float64()),
    ("tok_min", pa.int32()),
    ("tok_max", pa.int32()),
    ("tok_p50", pa.float64()),
    ("tok_p99", pa.float64()),
]
ROLLUP_SCHEMA = pa.schema(ROLLUP_FIELDS)

# Internal partial-aggregate schema: ROLLUP counters plus mergeable sparse
# value histograms (exact percentiles recombine across partials because the
# token / n_tok domains are bounded ints -- see stages/rollup.py).  Hist
# counts are int32: a (source, bucket) group holds at most
# tier_width * MAX_N_TOK = 86400 * 2048 = 1.77e8 < 2^31 tokens, at any scale
# (the bucket width bounds the group, not the table size).
PARTIAL_EXTRA_FIELDS = [
    ("ntok_vals", pa.list_(pa.int32())),
    ("ntok_cnts", pa.list_(pa.int32())),
    ("tok_vals", pa.list_(pa.int32())),
    ("tok_cnts", pa.list_(pa.int32())),
]
