"""Paragraph(chunk)-level dedup bench at beyond-sf scale.

Round 5 added the CCNet-style sub-document dedup layer
(``dedup_paragraphs`` / ``clean_corpus_paragraphs``); this bench puts a
measured chunks/s number on it: N 16-word chunks over docs drawn from a
Zipf-skewed chunk pool (boilerplate chunks repeat corpus-wide, the tail
is unique) -- the layout real web corpora show, where headers/footers
dominate the duplicate mass.

    python tools/bench_paragraphs.py [chunks]    # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_CHUNKS_PER_DOC = 50
_WORDS_PER_CHUNK = 16


def make_docs(chunks: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    rng = np.random.default_rng(17)
    n_docs = chunks // _CHUNKS_PER_DOC
    # pool: a Zipf head of shared boilerplate chunks, a tail wide enough
    # to be mostly unique.  Plain str.join here -- np.char concatenation
    # is elementwise-Python under the hood and ~30x slower at this size.
    pool_n = max(1000, chunks // 2)
    wid = rng.integers(0, 50_000, size=(pool_n, _WORDS_PER_CHUNK))
    pool = [" ".join(f"w{x}" for x in row) for row in wid]
    w = 1.0 / np.arange(1, pool_n + 1) ** 1.1
    w /= w.sum()
    ids = rng.choice(pool_n, size=(n_docs, _CHUNKS_PER_DOC), p=w)
    texts = [" ".join(pool[j] for j in row) for row in ids]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }),
        path, row_group_size=1 << 14,
    )
    return out_dir


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sf_dir = make_docs(chunks, f"/tmp/bench_paragraphs_{chunks}")

    from crossai_ts_ray.pipelines.text_pipeline import (
        clean_corpus_paragraphs,
        dedup_paragraphs,
    )

    out: dict = {"chunks": chunks, "sections": {}}
    for name, fn, consume in (
        ("dedup_paragraphs", dedup_paragraphs, "count"),
        ("clean_corpus_paragraphs", clean_corpus_paragraphs, "count"),
    ):
        best = float("inf")
        rows = 0
        for _ in range(2):  # min-of-2: co-tenant noise protocol
            t0 = time.perf_counter()
            ds = fn(sf_dir)
            rows = ds.count()  # streaming consume; output stays distributed
            best = min(best, time.perf_counter() - t0)
        out["sections"][name] = {
            "sec": round(best, 2),
            "out_rows": rows,
            "chunks_per_sec": round(chunks / best, 1),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
