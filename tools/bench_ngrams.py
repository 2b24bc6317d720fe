"""Token-n-gram dedup bench at beyond-sf scale.

Round 5 added the substring-granularity dedup layer (``dup_token_ngrams``
/ ``doc_dup_ngram_rate``); this bench puts a measured tokens/s number on
it: N tokens over docs whose word-length streams are drawn from a small
Markov alphabet -- adjacent-length correlation gives realistic n-gram
repetition (boilerplate runs recur corpus-wide) without degenerating to
one constant key.

    python tools/bench_ngrams.py [tokens]    # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_TOK_PER_DOC = 200


def make_docs(tokens: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    rng = np.random.default_rng(23)
    n_docs = tokens // _TOK_PER_DOC
    # phrase pool: 1k distinct 8-token runs; docs are Zipf draws of 25
    # phrases each -> heavy cross-doc window duplication, like template text
    pool = rng.integers(1, 9, size=(1000, 8))
    w = 1.0 / np.arange(1, 1001) ** 1.2
    w /= w.sum()
    ids = rng.choice(1000, size=(n_docs, _TOK_PER_DOC // 8), p=w)
    lens = pool[ids].reshape(n_docs, _TOK_PER_DOC)
    # words of length L: alphabet letter repeated L times (deterministic)
    words = np.array(["", "a", "bb", "ccc", "dddd", "eeeee", "ffffff",
                      "ggggggg", "hhhhhhhh"])
    texts = [" ".join(row) for row in words[lens]]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(
                [f"s{i % 8}" for i in range(n_docs)], pa.string()),
        }),
        path, row_group_size=1 << 13,
    )
    return out_dir


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
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
    sf_dir = make_docs(tokens, f"/tmp/bench_ngrams_{tokens}")

    from crossai_ts_ray.pipelines.token_ngrams import (
        dedup_ngram_spans,
        doc_dup_ngram_rate,
        dup_token_ngrams,
        rollup_distinct_tokens,
        token_novelty_by_bucket,
    )
    from crossai_ts_ray.sources import readers

    out: dict = {"tokens": tokens, "sections": {}}
    for name, fn in (
        ("dup_token_ngrams", dup_token_ngrams),
        ("doc_dup_ngram_rate", doc_dup_ngram_rate),
        ("dedup_ngram_spans", dedup_ngram_spans),
        ("rollup_distinct_tokens", rollup_distinct_tokens),
        ("token_novelty_by_bucket", token_novelty_by_bucket),
    ):
        best = float("inf")
        rows = 0
        for _ in range(2):  # min-of-2: co-tenant noise protocol
            readers._DERIVED_CACHE.clear()
            t0 = time.perf_counter()
            ds = fn(sf_dir)
            rows = ds.count()  # streaming consume; output stays distributed
            best = min(best, time.perf_counter() - t0)
        out["sections"][name] = {
            "sec": round(best, 2),
            "out_rows": rows,
            "tokens_per_sec": round(tokens / best, 1),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
