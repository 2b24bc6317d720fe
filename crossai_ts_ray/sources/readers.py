"""Sources: token-table reads + the documents-derived token table.

Reference analogues: ``csv_loader`` / ``load_dir`` recursive corpus loading
(/root/reference/caits/loading/_csv_read.py:11,
/root/reference/caits/loading/_dataset_loader.py:53) become
``ray.data.read_parquet`` over a sharded directory with column pruning; the
label-from-subdir convention becomes the ``source`` column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

TOKEN_COLUMNS = ["doc_id", "tokens", "n_tok", "source", "seq"]


def read_token_table(
    path: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Read the token-sequence table; prune to the columns the pipeline needs
    (a rollup that only needs (n_tok, source, seq) must not ship token lists).
    ``override_num_blocks`` caps read tasks -- many tiny read tasks are
    scheduling-bound on small clusters."""
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, columns=columns or TOKEN_COLUMNS, **kw)


def _tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> token-table rows (fully vectorized in Arrow).

    Deterministic whitespace tokenization: token value = utf8 length of each
    ``' '``-separated word (int32).  SQL-equivalent (oracle parity):
    ``string_split(text, ' ')`` + ``length(w)`` in DuckDB -- both keep empty
    strings between consecutive separators, matching Python ``str.split(' ')``.
    """
    t = batch.combine_chunks()
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    split = pc.split_pattern(text, pattern=" ")
    lens = pc.cast(pc.utf8_length(split.values), pa.int32())
    tokens = pa.ListArray.from_arrays(split.offsets, lens)
    n_tok = pc.cast(pc.list_value_length(split), pa.int32())
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "_did": pc.cast(t["doc_id"], pa.int64()),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": t["source"],
        }
    )


def _assign_seq(group: pa.Table) -> pa.Table:
    """Per-source running sequence number, ordered by numeric doc id
    (SQL parity: ``row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1``)."""
    did = group["_did"].to_numpy(zero_copy_only=False)
    order = np.argsort(did, kind="stable")
    seq = np.empty(len(did), dtype=np.int64)
    seq[order] = np.arange(len(did), dtype=np.int64)
    return group.append_column("seq", pa.array(seq, pa.int64())).drop_columns(["_did"])


_DERIVED_CACHE: dict[str, rd.Dataset] = {}


def tokens_from_documents(sf_dir: str) -> rd.Dataset:
    """Derive the token-sequence table from ``documents.parquet`` so driver
    correctness queries have a DuckDB-expressible oracle.  The per-source seq
    assignment is a keyed shuffle (small: one group per source).  The derived
    table is memoized per process as a MaterializedDataset -- many queries
    start from it, and it is rollup-small."""
    hit = _DERIVED_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    tok = docs.map_batches(_tokenize_batch, batch_format="pyarrow", zero_copy_batch=True)
    out = tok.groupby("source").map_groups(
        _assign_seq, batch_format="pyarrow"
    ).materialize()
    _DERIVED_CACHE[sf_dir] = out
    return out
