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
    filesystem=None,
) -> rd.Dataset:
    """Read the token-sequence table; prune to the columns the pipeline needs
    (a rollup that only needs (n_tok, source, seq) must not ship token lists).
    ``override_num_blocks`` caps read tasks -- many tiny read tasks are
    scheduling-bound on small clusters.  ``path`` may be a non-local URI
    (``s3://...``) or paired with an explicit pyarrow/fsspec ``filesystem``."""
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    if filesystem is not None or (isinstance(path, str) and "://" in path):
        from .loaders import resolve_filesystem

        fs, path = resolve_filesystem(path, filesystem) if isinstance(
            path, str
        ) else (resolve_filesystem("", filesystem)[0], path)
        kw["filesystem"] = fs
    return rd.read_parquet(path, columns=columns or TOKEN_COLUMNS, **kw)


#: size-aware read planning: tables under this total byte size get an
#: explicit block count derived from their SIZE instead of Ray's
#: parallelism heuristic (~2x CPUs regardless of bytes), which shreds a
#: 2 MB dimension table into 64 x 32 KB blocks -- every downstream exchange
#: then pays 64 task schedulings + object-store puts for microscopic
#: payloads (measured 5x wall inflation on the as-of join at sf0.1).
#: Large inputs keep the default planner: their block counts are governed
#: by file count x target_max_block_size, where the heuristic is right.
SMALL_TABLE_BYTES = 256 * 1024 * 1024
_SMALL_BLOCK_BYTES = 1 * 1024 * 1024


def ts_window_filter(field: str, lo_us: int, hi_us: int):
    """Pyarrow scan-filter expression for ``lo <= field < hi`` over a
    timestamp[us] column -- pass as ``filter=`` to the parquet readers so
    row-group statistics skip non-matching groups and rows filter at
    decode (only matching rows cross the read boundary).  Queries keep
    their in-task masks as the exactness belt."""
    lo = pa.scalar(int(lo_us), pa.timestamp("us"))
    hi = pa.scalar(int(hi_us), pa.timestamp("us"))
    return (pc.field(field) >= lo) & (pc.field(field) < hi)


def read_parquet_sized(path, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """``read_parquet`` with size-aware block planning for small tables.

    Block count for a small table = max(8, total_bytes / 1 MB): enough
    pipelining to keep a node busy, blocks big enough that per-block task
    scheduling is amortized.  Paths that can't be stat'ed cheaply (globs,
    URIs) fall through to the default planner."""
    import os

    if "override_num_blocks" not in kw:
        try:
            paths = path if isinstance(path, list) else [path]
            total = 0
            for p in paths:
                if os.path.isdir(p):
                    for root, _, fs in os.walk(p):
                        total += sum(
                            os.path.getsize(os.path.join(root, f)) for f in fs
                        )
                else:
                    total += os.path.getsize(p)
            if total < SMALL_TABLE_BYTES:
                kw["override_num_blocks"] = max(8, int(total // _SMALL_BLOCK_BYTES))
        except OSError:
            pass
    return rd.read_parquet(path, columns=columns, **kw)


def suggest_buckets(
    *paths: str,
    target_bytes: int = 64 * 1024 * 1024,
    lo: int = 32,
    hi: int = 65536,
) -> int:
    """Exchange partition count sized from the INPUT BYTES feeding it:
    ~one partition per 64 MB of input, clamped to [lo, hi].  A fixed
    partition count is wrong at both ends -- 32 partitions of a 100 TB
    exchange are 3 TB each (OOM in any group kernel), and 4096 partitions
    of a 2 MB table are pure scheduling overhead.  Callers pass the table
    paths that flow into the exchange; unstat-able paths fall back to
    ``lo``."""
    import os

    total = 0
    for p in paths:
        try:
            if os.path.isdir(p):
                for root, _, fs in os.walk(p):
                    total += sum(os.path.getsize(os.path.join(root, f)) for f in fs)
            else:
                total += os.path.getsize(p)
        except OSError:
            pass
    return int(min(hi, max(lo, total // target_bytes)))


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


def _fragment_source_stats(path: str, rg: int) -> pa.Table:
    """Per-(row-group, source) count and doc_id range -- the tiny planning
    pass (reads only two pruned columns of one row group)."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(path).read_row_group(
        rg, columns=["doc_id", "source"], use_threads=False
    )
    t = t.combine_chunks()
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    src = t["source"]
    d = src.combine_chunks().dictionary_encode() if isinstance(src, pa.ChunkedArray) else src.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(codes, kind="stable")
    c_s, d_s = codes[order], did[order]
    starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
    ends = np.append(starts[1:], len(c_s))
    return pa.table(
        {
            "rg": pa.array(np.full(len(starts), rg, np.int64), pa.int64()),
            "source": d.dictionary.take(pa.array(c_s[starts])).cast(pa.string()),
            "count": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "did_min": pa.array(np.minimum.reduceat(d_s, starts), pa.int64()),
            "did_max": pa.array(np.maximum.reduceat(d_s, starts), pa.int64()),
        }
    )


def _document_fragments(path: str) -> list[tuple[str, int]]:
    """(file, row_group) fragments of a documents input in scan order: a
    single file's row groups, or -- the realistic ingest layout -- every
    ``*.parquet`` under a sharded directory in lexicographic path order,
    each file contributing its row groups in order."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path!r}")
    else:
        files = [path]
    frags: list[tuple[str, int]] = []
    for f in files:
        frags += [(f, i) for i in range(pq.ParquetFile(f).metadata.num_row_groups)]
    return frags


def _plan_seq_offsets(path: str) -> dict[tuple[str, int, str], int]:
    """Per-(file, row-group, source) seq start offsets by prefix sum over
    fragment scan order (SURVEY.md section 7.5).  Handles both a single
    documents file and a sharded directory.  Validates that each source's
    doc_ids are non-overlapping and increasing across fragments -- the
    layout contract that makes rank-within-fragment + offset equal the
    global ``row_number() OVER (PARTITION BY source ORDER BY doc_id)``.
    Driver state is metadata-sized: O(fragments x sources)."""
    frags = _document_fragments(path)
    frag_idx = {fr: i for i, fr in enumerate(frags)}
    stats_ds = rd.from_items(
        [{"path": p, "rg": rg} for p, rg in frags]
    )

    def stats_batch(t: pa.Table) -> pa.Table:
        tabs = []
        for p, r in zip(t["path"].to_pylist(), t["rg"].to_pylist()):
            st = _fragment_source_stats(p, r)
            st = st.append_column(
                "path", pa.array([p] * st.num_rows, pa.string())
            )
            tabs.append(st)
        return pa.concat_tables(tabs)

    stats = pa.concat_tables(
        [
            b
            for b in stats_ds.map_batches(
                stats_batch, batch_size=None, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    offsets: dict[tuple[str, int, str], int] = {}
    running: dict[str, int] = {}
    last_max: dict[str, int] = {}
    keys = [
        frag_idx[(p, int(r))]
        for p, r in zip(
            stats["path"].to_pylist(),
            stats["rg"].to_numpy(zero_copy_only=False),
        )
    ]
    order = np.argsort(np.array(keys), kind="stable")
    for i in order:
        p = stats["path"][int(i)].as_py()
        rg = int(stats["rg"][int(i)].as_py())
        src = stats["source"][int(i)].as_py()
        cnt = int(stats["count"][int(i)].as_py())
        dmin = int(stats["did_min"][int(i)].as_py())
        dmax = int(stats["did_max"][int(i)].as_py())
        if src in last_max and dmin <= last_max[src]:
            raise ValueError(
                f"documents layout violates per-source doc_id ordering across "
                f"fragments (source {src!r}, file {p!r}, rg {rg}): fragment "
                "prefix-sum seq assignment needs sorted non-overlapping ranges"
            )
        last_max[src] = dmax
        offsets[(p, rg, src)] = running.get(src, 0)
        running[src] = running.get(src, 0) + cnt
    return offsets


_DERIVED_CACHE: dict[str, rd.Dataset] = {}


def tokens_from_documents(sf_dir: str) -> rd.Dataset:
    """Derive the token-sequence table from ``documents.parquet`` so driver
    correctness queries have a DuckDB-expressible oracle.

    seq parity: ``row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1``,
    computed WITHOUT whole-source groups or a raw-sized shuffle: a planning
    pass prefix-sums per-(row-group, source) counts into start offsets
    (metadata-sized, broadcast via ray.put), then each map task tokenizes one
    row group and adds rank-within-fragment to its offset.  Work per task is
    bounded by row-group size; the token lists never shuffle.  The constructed
    (lazy) plan is memoized per process; execution streams per consumer --
    nothing raw-sized is materialized."""
    hit = _DERIVED_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    import os

    import pyarrow.parquet as pq
    import ray

    # single file or -- the realistic ingest layout -- a sharded directory
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path) and os.path.isdir(f"{sf_dir}/documents"):
        path = f"{sf_dir}/documents"
    offsets = _plan_seq_offsets(path)
    off_ref = ray.put(offsets)
    frag_list = _document_fragments(path)

    def process_fragment(t: pa.Table) -> pa.Table:
        import ray as _ray

        offs = _ray.get(off_ref)
        out = []
        for p, rg in zip(t["path"].to_pylist(), t["rg"].to_pylist()):
            raw = pq.ParquetFile(p).read_row_group(
                rg, columns=["doc_id", "text", "source"], use_threads=False
            )
            tok = _tokenize_batch(raw)
            did = tok["_did"].to_numpy(zero_copy_only=False)
            src = tok["source"].combine_chunks() if isinstance(
                tok["source"], pa.ChunkedArray
            ) else tok["source"]
            d = src.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            # rank within (fragment, source) by doc_id + fragment offset
            order = np.lexsort((did, codes))
            c_s = codes[order]
            starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
            rank_sorted = np.arange(len(order), dtype=np.int64) - np.repeat(
                starts, np.diff(np.append(starts, len(order)))
            )
            rank = np.empty(len(order), dtype=np.int64)
            rank[order] = rank_sorted
            src_list = d.dictionary.to_pylist()
            base = np.array(
                [offs.get((p, rg, s), 0) for s in src_list], dtype=np.int64
            )[codes]
            seq = base + rank
            out.append(
                tok.append_column("seq", pa.array(seq, pa.int64())).drop_columns(["_did"])
            )
        return pa.concat_tables(out)

    frags = rd.from_items([{"path": p, "rg": i} for p, i in frag_list])
    ds = frags.map_batches(process_fragment, batch_size=None, batch_format="pyarrow")
    _DERIVED_CACHE[sf_dir] = ds
    return ds
