"""Sharded-directory documents ingestion: the derived token table (fragment
prefix-sum seq assignment) and the rollup family must be identical whether
the corpus is one file or a multi-file shard directory -- the realistic
ingest layout."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def sharded_dir(tmp_path):
    """A 2-shard copy of the sf0.001 documents table: rows split at the
    midpoint in doc_id order (per-source doc_id ranges stay sorted and
    non-overlapping across shards, as a sharded writer produces), each
    shard written with 2 row groups."""
    t = pq.read_table(f"{SF}/documents.parquet")
    t = t.take(pa.array(np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))))
    mid = t.num_rows // 2
    ddir = tmp_path / "documents"
    os.makedirs(ddir)
    pq.write_table(t.slice(0, mid), ddir / "part-000.parquet", row_group_size=max(1, mid // 2))
    pq.write_table(t.slice(mid), ddir / "part-001.parquet", row_group_size=max(1, (t.num_rows - mid) // 2))
    return str(tmp_path)


def _sorted_pandas(ds):
    df = ds.to_pandas()
    return df.sort_values(["source", "seq"]).reset_index(drop=True)


def test_sharded_tokens_equal_single_file(ray_session, sharded_dir):
    from crossai_ts_ray.sources.readers import _DERIVED_CACHE, tokens_from_documents

    _DERIVED_CACHE.clear()
    single = _sorted_pandas(tokens_from_documents(SF))
    sharded = _sorted_pandas(tokens_from_documents(sharded_dir))
    assert len(single) == len(sharded)
    for col in ("doc_id", "source", "seq", "n_tok"):
        assert single[col].tolist() == sharded[col].tolist(), col
    assert all(
        list(a) == list(b) for a, b in zip(single["tokens"], sharded["tokens"])
    )


def test_sharded_rollup_family_green(ray_session, sharded_dir):
    """rollup_w4 over the sharded layout == over the single file, bitwise."""
    from crossai_ts_ray.pipelines.rollup_pipeline import documents_rollup
    from crossai_ts_ray.sources.readers import _DERIVED_CACHE
    from crossai_ts_ray.util import dataset_to_table

    _DERIVED_CACHE.clear()
    a = dataset_to_table(documents_rollup(SF, "w4"))
    b = dataset_to_table(documents_rollup(sharded_dir, "w4"))
    ka = a.sort_by([("source", "ascending"), ("bucket", "ascending")])
    kb = b.sort_by([("source", "ascending"), ("bucket", "ascending")])
    assert ka.equals(kb)


def test_sharded_rejects_out_of_order_shards(ray_session, tmp_path):
    """Shards whose per-source doc_id ranges overlap violate the prefix-sum
    layout contract and must be rejected, not silently mis-sequenced."""
    from crossai_ts_ray.sources.readers import _plan_seq_offsets

    t = pq.read_table(f"{SF}/documents.parquet")
    t = t.take(pa.array(np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))))
    mid = t.num_rows // 2
    ddir = tmp_path / "documents"
    os.makedirs(ddir)
    # REVERSED shard naming: part-000 holds the HIGH doc_ids, so scan order
    # sees decreasing ranges
    pq.write_table(t.slice(mid), ddir / "part-000.parquet")
    pq.write_table(t.slice(0, mid), ddir / "part-001.parquet")
    with pytest.raises(ValueError, match="ordering"):
        _plan_seq_offsets(str(ddir))


def test_read_parquet_sized_block_planning(ray_session, tmp_path):
    """Small tables read at byte-derived block counts (>= 1 MB per block,
    floor 8) instead of Ray's ~2x-CPU heuristic; the explicit
    override_num_blocks kwarg is honored untouched."""
    import pyarrow.parquet as pq

    from crossai_ts_ray.sources.readers import read_parquet_sized

    t = pa.table({"a": pa.array(np.arange(50_000, dtype=np.int64))})
    p = tmp_path / "small.parquet"
    pq.write_table(t, p)  # ~400 KB -> floor of 8 blocks
    ds = read_parquet_sized(str(p))
    assert ds.materialize().num_blocks() == 8
    ds2 = read_parquet_sized(str(p), override_num_blocks=3)
    assert ds2.materialize().num_blocks() == 3


def test_read_persisted_one_block_per_file(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.text_pipeline import read_persisted

    for i in range(4):
        pq.write_table(
            pa.table({"x": pa.array(np.arange(100) + i * 100)}),
            tmp_path / f"f{i}.parquet",
        )
    ds = read_persisted(str(tmp_path))
    assert ds.materialize().num_blocks() == 4
