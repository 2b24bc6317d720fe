"""Property hardening for the bitwise-exactness claim: random tables, random
ROW ORDERS (unclustered input), random batch splits, salted / unsalted --
the distributed result must always equal the oracle bit-for-bit."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray import oracle
from crossai_ts_ray.schema import Tier
from crossai_ts_ray.stages import rollup as R

from .conftest import assert_tables_bitwise_equal


def _random_table(rng, n_rows: int, n_sources: int) -> pa.Table:
    src_idx = rng.integers(0, n_sources, n_rows)
    seqs = np.zeros(n_rows, dtype=np.int64)
    counters = collections.defaultdict(int)
    order = np.argsort(src_idx, kind="stable")
    for i in order:
        s = int(src_idx[i])
        seqs[i] = counters[s]
        counters[s] += 1
    rows = []
    for i in range(n_rows):
        ntok = int(rng.integers(1, 40))
        rows.append(
            {
                "doc_id": f"s{src_idx[i]}-{seqs[i]:06d}",
                "tokens": rng.integers(0, 500, ntok).astype(np.int32).tolist(),
                "n_tok": ntok,
                "source": f"s{src_idx[i]}",
                "seq": int(seqs[i]),
            }
        )
    return pa.Table.from_pylist(rows)


@pytest.mark.parametrize("trial", range(5))
def test_generic_path_bitwise_random(trial):
    """Driver-side simulation of the distributed plan with adversarial
    batching: shuffled row order, ragged batch sizes, salted two-level."""
    rng = np.random.default_rng(100 + trial)
    t = _random_table(rng, int(rng.integers(50, 400)), int(rng.integers(1, 5)))
    tier = Tier("w", int(rng.choice([3, 7, 16])))
    gold = oracle.rollup(t, tier)

    # random permutation of rows (unclustered!) + ragged batch splits
    perm = rng.permutation(t.num_rows)
    t_shuf = t.take(pa.array(perm))
    cuts = np.sort(rng.choice(np.arange(1, t.num_rows), size=min(6, t.num_rows - 1), replace=False))
    bounds = [0, *cuts.tolist(), t.num_rows]
    salt_mod = int(rng.choice([0, 3]))
    parts = []
    for a, b in zip(bounds, bounds[1:]):
        parts.append(R.partial_rollup(t_shuf.slice(a, b - a), tier.width, salt_mod))
    pt = pa.concat_tables(parts).combine_chunks()
    if salt_mod:
        # level A: merge per (source,bucket,salt) in random partition order
        keyed = R.with_partition_col(pt, 4, True)
        merged_a = []
        for p in rng.permutation(4):
            sub = keyed.filter(pa.compute.equal(keyed["prt"], int(p)))
            if sub.num_rows:
                merged_a.append(R.merge_partials_table(sub, with_salt=True))
        pt = pa.concat_tables(merged_a).combine_chunks()
    keyed = R.with_partition_col(pt, 3, False)
    finals = []
    for p in rng.permutation(3):
        sub = keyed.filter(pa.compute.equal(keyed["prt"], int(p)))
        if sub.num_rows:
            finals.append(R.merge_finalize_table(sub))
    got = pa.concat_tables(finals).combine_chunks()
    assert_tables_bitwise_equal(gold, got, f"trial{trial} salt={salt_mod}")


def test_two_step_merge_equals_fused():
    """merge_partials_table + finalize_batch == merge_finalize_table."""
    rng = np.random.default_rng(7)
    t = _random_table(rng, 200, 3)
    tier = Tier("w", 5)
    pt = pa.concat_tables(
        [R.partial_rollup(t.slice(i, 37), tier.width) for i in range(0, t.num_rows, 37)]
    ).combine_chunks()
    fused = R.merge_finalize_table(pt)
    stepped = R.finalize_batch(R.merge_partials_table(pt))
    assert_tables_bitwise_equal(fused, stepped, "fused-vs-stepped")
