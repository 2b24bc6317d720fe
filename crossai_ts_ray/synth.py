"""Deterministic synthetic token-sequence table generator (FIXTURES.md F1/F2).

Every chunk is generated from a counter-based Philox key
``(seed, source_index, chunk_index)`` so content is independent of generation
order / parallelism / chunking -- the same (seed, params) always produces the
same table.  Row counts per source are Zipf-skewed (source 0 holds ~half the
rows) to exercise the salted-key shuffle path (SURVEY.md §4.2).

Output layout: ``out_dir/shard=NN/part-<src>-<chunk>.parquet`` where
``NN = source_index % num_shards``.  A (source, bucket) group never spans two
shards, which is what makes per-shard checkpoint partitions independent
(state/checkpoint.py).  Many small row groups so reads parallelize.

No reference code is used here; semantics are engine-new (the reference has no
data generator).  Gap injection (F2) deletes whole base-tier buckets per
source: interior, leading, trailing and >=3-consecutive runs.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import MAX_N_TOK, VOCAB_SIZE

CHUNK_ROWS = 25_000


@dataclass(frozen=True)
class SynthSpec:
    total_rows: int = 2_000
    num_sources: int = 4
    seed: int = 42
    zipf_s: float = 1.2  # Zipf exponent for per-source row counts
    mean_n_tok: float = 96.0  # lognormal-ish mean token count per row
    sigma_n_tok: float = 0.8
    num_shards: int = 4
    # gaps: {source_index: ((bucket_lo, bucket_hi), ...)} at gap_width; rows
    # with seq // gap_width in [lo, hi) are dropped.
    gaps: tuple = ()
    gap_width: int = 60
    # stride_layout=True writes each source's rows STRIPED across its files
    # (chunk c holds seq c, c+K, c+2K, ...): an unclustered ingest where every
    # (source, bucket) fragments across all files -- the skew/salting perf
    # fixture (the aligned fast path does not apply; generic shuffle path
    # with salted keys is the target)
    stride_layout: bool = False

    def rows_per_source(self) -> np.ndarray:
        w = 1.0 / np.arange(1, self.num_sources + 1) ** self.zipf_s
        w /= w.sum()
        n = np.floor(w * self.total_rows).astype(np.int64)
        n[0] += self.total_rows - n.sum()  # remainder onto the hot source
        return n

    def cache_key(self) -> str:
        blob = json.dumps(
            [
                self.total_rows, self.num_sources, self.seed, self.zipf_s,
                self.mean_n_tok, self.sigma_n_tok, self.num_shards,
                list(map(list, ((g[0], list(map(list, g[1]))) for g in self.gaps))),
                self.gap_width, self.stride_layout,
            ]
        )
        return hashlib.sha1(blob.encode()).hexdigest()[:12]


def source_name(i: int) -> str:
    return f"src{i:03d}"


def _gen_chunk(
    spec: SynthSpec, src_idx: int, seq_lo: int, seq_hi: int,
    seq_override: np.ndarray | None = None, chunk_idx: int | None = None,
) -> pa.Table:
    """Rows [seq_lo, seq_hi) of one source; content depends only on the key."""
    if chunk_idx is None:
        chunk_idx = seq_lo // CHUNK_ROWS
    key = np.array(
        [np.uint64(spec.seed) ^ np.uint64(0xC0FFEE) << np.uint64(32),
         np.uint64(src_idx) << np.uint64(32) | np.uint64(chunk_idx)],
        dtype=np.uint64,
    )
    rng = np.random.Generator(np.random.Philox(key=key))
    if seq_override is not None:
        seq = seq_override.astype(np.int64)
        n = len(seq)
    else:
        n = seq_hi - seq_lo
        seq = np.arange(seq_lo, seq_hi, dtype=np.int64)
    n_tok = np.clip(
        rng.lognormal(np.log(spec.mean_n_tok), spec.sigma_n_tok, n), 1, MAX_N_TOK
    ).astype(np.int32)
    flat = rng.integers(0, VOCAB_SIZE, int(n_tok.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    src = source_name(src_idx)

    # gap injection (F2): drop whole base buckets
    gaps = dict(spec.gaps).get(src_idx)
    keep = np.ones(n, dtype=bool)
    if gaps:
        bucket = seq // spec.gap_width
        for lo, hi in gaps:
            keep &= ~((bucket >= lo) & (bucket < hi))
    if not keep.all():
        kept_idx = np.flatnonzero(keep)
        tok_keep = np.zeros(len(flat), dtype=bool)
        for i in kept_idx:
            tok_keep[offsets[i] : offsets[i + 1]] = True
        flat = flat[tok_keep]
        seq, n_tok = seq[kept_idx], n_tok[kept_idx]
        offsets = np.zeros(len(kept_idx) + 1, dtype=np.int32)
        np.cumsum(n_tok, out=offsets[1:])
        n = len(kept_idx)

    doc_id = pa.array([f"{src}-{s:08d}" for s in seq], pa.string())
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int32()))
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array([src] * n, pa.string()),
            "seq": pa.array(seq, pa.int64()),
        }
    )


def generate(spec: SynthSpec, out_dir: str, row_group_size: int = 25_000) -> str:
    """Write the table under ``out_dir`` (idempotent via a marker file)."""
    marker = os.path.join(out_dir, "_SYNTH_OK")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == spec.cache_key():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    counts = spec.rows_per_source()
    for src_idx in range(spec.num_sources):
        shard = src_idx % spec.num_shards
        shard_dir = os.path.join(out_dir, f"shard={shard:02d}")
        os.makedirs(shard_dir, exist_ok=True)
        n_rows = int(counts[src_idx])
        n_chunks = -(-n_rows // CHUNK_ROWS)
        for c, lo in enumerate(range(0, n_rows, CHUNK_ROWS)):
            hi = min(lo + CHUNK_ROWS, n_rows)
            if spec.stride_layout:
                t = _gen_chunk(
                    spec, src_idx, lo, hi,
                    seq_override=np.arange(c, n_rows, n_chunks), chunk_idx=c,
                )
            else:
                t = _gen_chunk(spec, src_idx, lo, hi)
            path = os.path.join(
                shard_dir, f"part-{source_name(src_idx)}-{c:05d}.parquet"
            )
            pq.write_table(t, path, row_group_size=row_group_size)
    with open(marker, "w") as f:
        f.write(spec.cache_key())
    return out_dir


def read_all(dir_: str) -> pa.Table:
    """Driver-side full read (tests/oracle only -- never the engine path)."""
    import pyarrow.dataset as pads

    return pads.dataset(dir_, format="parquet").to_table()


# Canonical specs (FIXTURES.md F1 scales)
TINY = SynthSpec(total_rows=2_000, num_sources=4, num_shards=2)
TINY_GAPPED = SynthSpec(
    total_rows=2_000,
    num_sources=4,
    num_shards=2,
    gaps=(
        (0, ((2, 3), (5, 9))),       # interior gap + >=3-consecutive run (hot source)
        (1, ((0, 2),)),              # leading gap
        (2, ((3, 1_000_000),)),      # trailing gap
    ),
    gap_width=60,
)
SMALL = SynthSpec(total_rows=200_000, num_sources=16, num_shards=8)


def default_cache_dir(spec: SynthSpec, root: str = "/tmp/crossai_ts_ray_synth") -> str:
    return os.path.join(root, spec.cache_key())
