"""Property tests for the store-maintenance kernels (no Ray needed):
``_prune_partition_dir``'s footer-stat fast paths and ``compact``'s bin
merge must preserve exactly the oracle row multiset for ANY layout of rows
across files."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from crossai_ts_ray.state.compact import _compact_partition_dir
from crossai_ts_ray.state.retention import _prune_partition_dir


def _rows_multiset(pdir: str) -> list[tuple]:
    tabs = [pq.read_table(f) for f in sorted(glob.glob(os.path.join(pdir, "*.parquet")))]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return []
    t = pa.concat_tables(tabs)
    return sorted(
        zip(
            t["source"].to_pylist(),
            t["bucket"].to_pylist(),
            t["v"].to_pylist(),
        )
    )


@st.composite
def _partition_layout(draw):
    """Random rows over 1-3 sources, split into 1-5 files in arbitrary
    bucket order (so per-file min/max stats take arbitrary shapes)."""
    n_src = draw(st.integers(1, 3))
    rows = []
    for s in range(n_src):
        n = draw(st.integers(1, 20))
        buckets = draw(
            st.lists(st.integers(0, 30), min_size=n, max_size=n)
        )
        for i, b in enumerate(buckets):
            rows.append((f"s{s}", b, s * 1000 + i))
    order = draw(st.permutations(rows))
    n_files = draw(st.integers(1, 5))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, len(order)), min_size=n_files - 1,
                max_size=n_files - 1,
            )
        )
    )
    files = []
    prev = 0
    for c in [*cuts, len(order)]:
        files.append(order[prev:c])
        prev = c
    keep_last = draw(st.integers(1, 12))
    return files, keep_last


@settings(max_examples=40, deadline=None)
@given(_partition_layout())
def test_prune_matches_filter_oracle(tmp_path_factory, layout):
    files, keep_last = layout
    pdir = str(tmp_path_factory.mktemp("prop"))
    all_rows = [r for f in files for r in f]
    for i, chunk in enumerate(files):
        if not chunk:
            continue
        t = pa.table(
            {
                "source": pa.array([r[0] for r in chunk], pa.string()),
                "bucket": pa.array([r[1] for r in chunk], pa.int64()),
                "v": pa.array([r[2] for r in chunk], pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(pdir, f"f{i}.parquet"))
    # oracle: per-source horizon over ALL rows
    hz = {}
    for s, b, _ in all_rows:
        hz[s] = max(hz.get(s, -1), b)
    hz = {s: mb + 1 - keep_last for s, mb in hz.items()}
    want = sorted(r for r in all_rows if r[1] >= hz[r[0]])

    st_ = _prune_partition_dir(pdir, hz)
    got = _rows_multiset(pdir)
    assert got == want
    assert (
        st_["files_kept"] + st_["files_dropped"] + st_["files_rewritten"]
        == sum(1 for f in files if f)
    )
    # idempotent: a second prune with the same horizons changes nothing
    _prune_partition_dir(pdir, hz)
    assert _rows_multiset(pdir) == want


@settings(max_examples=25, deadline=None)
@given(_partition_layout(), st.integers(1, 1 << 20))
def test_compact_preserves_rows(tmp_path_factory, layout, target):
    files, _ = layout
    pdir = str(tmp_path_factory.mktemp("prop"))
    for i, chunk in enumerate(files):
        if not chunk:
            continue
        t = pa.table(
            {
                "source": pa.array([r[0] for r in chunk], pa.string()),
                "bucket": pa.array([r[1] for r in chunk], pa.int64()),
                "v": pa.array([r[2] for r in chunk], pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(pdir, f"f{i}.parquet"))
    before = _rows_multiset(pdir)
    n_before = len(glob.glob(os.path.join(pdir, "*.parquet")))
    st_ = _compact_partition_dir(pdir, target_bytes=target, min_files=2)
    assert _rows_multiset(pdir) == before
    assert st_["files_before"] == n_before
    assert len(glob.glob(os.path.join(pdir, "*.parquet"))) == st_["files_after"]
    assert not glob.glob(os.path.join(pdir, "*.tmp"))
    assert not glob.glob(os.path.join(pdir, ".compact-*"))
