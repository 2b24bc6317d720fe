"""Codec round-trips: Gorilla XOR + delta-of-delta must be lossless on edge
vectors (FIXTURES.md F4) and random data, and actually compress typical
rollup series."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crossai_ts_ray.stages.codec import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

I64 = np.iinfo(np.int64)

INT_VECTORS = [
    np.array([], dtype=np.int64),
    np.array([0], dtype=np.int64),
    np.array([42] * 100, dtype=np.int64),                      # constant
    np.arange(0, 10_000, 7, dtype=np.int64),                   # ramp (dod=0)
    np.array([I64.min, I64.max, 0, -1, 1], dtype=np.int64),    # extremes/overflow
    np.array([0, 63, -63, 64, 256, -255, 2048, -2047, 10**15], dtype=np.int64),
]

FLOAT_VECTORS = [
    np.array([], dtype=np.float64),
    np.array([3.14], dtype=np.float64),
    np.full(100, 2.5),                                          # constant
    np.linspace(0, 1, 257),                                     # smooth ramp
    np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308, 1e308]),
    np.array([1.0, 1.0000001, 1.0000002, 5.0, 5.0]),
]


@pytest.mark.parametrize("vec", INT_VECTORS, ids=range(len(INT_VECTORS)))
def test_dod_roundtrip(vec):
    got = dod_decode(dod_encode(vec), len(vec))
    assert (got == vec).all()


@pytest.mark.parametrize("vec", FLOAT_VECTORS, ids=range(len(FLOAT_VECTORS)))
def test_gorilla_roundtrip(vec):
    got = gorilla_decode(gorilla_encode(vec), len(vec))
    # bit-pattern equality (NaN == NaN, -0.0 != 0.0)
    assert (got.view(np.uint64) == vec.view(np.uint64)).all()


@given(st.lists(st.integers(I64.min, I64.max), max_size=200))
@settings(max_examples=50, deadline=None)
def test_dod_roundtrip_property(xs):
    vec = np.array(xs, dtype=np.int64)
    assert (dod_decode(dod_encode(vec), len(vec)) == vec).all()


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=200))
@settings(max_examples=50, deadline=None)
def test_gorilla_roundtrip_property(xs):
    vec = np.array(xs, dtype=np.float64)
    got = gorilla_decode(gorilla_encode(vec), len(vec))
    assert (got.view(np.uint64) == vec.view(np.uint64)).all()


def test_compression_ratio_on_typical_series():
    """Monotonic buckets (dod=0 after warmup) and slowly-varying floats must
    actually compress."""
    buckets = np.arange(10_000, dtype=np.int64)
    assert len(dod_encode(buckets)) < buckets.nbytes / 20
    rng = np.random.default_rng(0)
    vals = np.cumsum(rng.normal(0, 0.1, 10_000)) + 100
    assert len(gorilla_encode(vals)) < vals.nbytes


def test_codec_stage_roundtrip(ray_session):
    """Actor-pool CodecStage over a real tier rollup; decode every segment and
    compare to the uncompressed rollup."""
    from crossai_ts_ray import synth
    from crossai_ts_ray.schema import Tier
    from crossai_ts_ray.sources.readers import read_token_table
    from crossai_ts_ray.stages.codec import compress_rollup, decode_segment_column
    from crossai_ts_ray.stages.rollup import rollup_cascade
    from crossai_ts_ray.util import dataset_to_table

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    roll = rollup_cascade(read_token_table(d), (Tier("t60", 60),), salt_mod=0, batch_size=512)["t60"]
    plain = dataset_to_table(roll).sort_by(
        [("source", "ascending"), ("bucket", "ascending")]
    )
    segs = dataset_to_table(compress_rollup(roll, concurrency=2))
    assert segs.num_rows > 0
    total_raw = sum(segs["raw_bytes"].to_pylist())
    total_enc = sum(segs["enc_bytes"].to_pylist())
    assert total_enc < total_raw, "codec did not compress the rollup"
    # reassemble per source and compare
    import collections

    per_src: dict[str, dict[str, list]] = collections.defaultdict(
        lambda: collections.defaultdict(list)
    )
    rows = segs.to_pylist()
    rows.sort(key=lambda r: (r["source"], r["bucket_lo"]))
    for r in rows:
        for c in ("bucket", "count", "sum"):
            per_src[r["source"]][c].append(decode_segment_column(r, c, False))
        for c in ("mean", "p50", "tok_p99"):
            per_src[r["source"]][c].append(decode_segment_column(r, c, True))
    for src, cols in per_src.items():
        mask_rows = [i for i, s in enumerate(plain["source"].to_pylist()) if s == src]
        sub = plain.take(mask_rows)
        for c, chunks in cols.items():
            got = np.concatenate(chunks)
            want = sub[c].to_numpy(zero_copy_only=False)
            if want.dtype.kind == "f":
                assert (got.view(np.uint64) == want.view(np.uint64)).all(), (src, c)
            else:
                assert (got == want.astype(np.int64)).all(), (src, c)
