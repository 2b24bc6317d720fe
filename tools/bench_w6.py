"""Beyond-sf probes for the round-5 wave-6 operators.

Measures, at 10M-row scale (Theil-Sen at 2M — the estimator is inherently
quadratic per group and guarded):

* ``funnel_stages`` — 3-step funnel over the hot-type events table
* ``user_value_centered_avg`` — centered window frame over the same table
* ``user_value_theilsen`` — median pairwise slope (quadratic per group)
* ``pagerank`` — 10M-edge power-law graph, 1M vertices, 15 iterations
* ``bm25_search`` — 10M-token corpus (index build separately timed)

    python tools/bench_w6.py [rows]    # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_graph(edges: int, nodes: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "edges.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(31)
    # preferential-attachment-ish: dst Zipf-weighted (hub-heavy in-degree),
    # src uniform — the skew shape a near-dup graph shows in practice
    w = 1.0 / np.arange(1, nodes + 1) ** 1.1
    w /= w.sum()
    src = rng.integers(0, nodes, edges).astype(np.int64)
    dst = rng.choice(nodes, size=edges, p=w).astype(np.int64)
    pq.write_table(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)}),
        path, row_group_size=1 << 20,
    )


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
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

    from tools.bench_events import make_events
    from tools.bench_ngrams import make_docs

    ev_dir = make_events(rows, f"/tmp/crossai_bench_events_{rows}")
    res: dict = {}

    from crossai_ts_ray.pipelines.analytics import (
        event_transition_matrix,
        event_type_lift,
        events_hourly_ohlc,
        funnel_stages,
        user_value_centered_avg,
        user_value_theilsen,
        value_drift_psi,
        winsorize_values,
    )
    from crossai_ts_ray.pipelines.semistruct import tdigest_value_quantiles

    for name, fn, sf, n_in in (
        ("funnel_stages",
         lambda d: funnel_stages(d, steps=("type_1", "type_2", "type_3")),
         ev_dir, rows),
        ("user_value_centered_avg", user_value_centered_avg, ev_dir, rows),
        ("events_hourly_ohlc", events_hourly_ohlc, ev_dir, rows),
        ("winsorize_values", winsorize_values, ev_dir, rows),
        ("value_drift_psi", value_drift_psi, ev_dir, rows),
        ("event_type_lift", event_type_lift, ev_dir, rows),
        ("event_transition_matrix", event_transition_matrix, ev_dir, rows),
        ("tdigest_value_quantiles", tdigest_value_quantiles, ev_dir, rows),
    ):
        best = float("inf")
        n_out = 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_out = fn(sf).count()
            best = min(best, time.perf_counter() - t0)
        res[name] = {
            "rows_in": n_in, "rows_out": n_out, "sec": round(best, 2),
            "rows_per_sec": round(n_in / best, 1),
        }

    # Theil-Sen at rows/5: quadratic pairs per group (10M rows -> ~500k
    # pairs/user x 10k users = 5G slopes; 2M keeps the probe honest about
    # the estimator's documented complexity, not the exchange)
    ts_rows = rows // 5
    ts_dir = make_events(ts_rows, f"/tmp/crossai_bench_events_{ts_rows}")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        n_out = user_value_theilsen(ts_dir).count()
        best = min(best, time.perf_counter() - t0)
    res["user_value_theilsen"] = {
        "rows_in": ts_rows, "rows_out": n_out, "sec": round(best, 2),
        "rows_per_sec": round(ts_rows / best, 1),
    }

    # PageRank: 10M edges / 1M nodes / 15 iterations
    from crossai_ts_ray.pipelines.graph import pagerank
    from crossai_ts_ray.sources.readers import read_parquet_sized

    g_dir = f"/tmp/crossai_bench_graph_{rows}"
    make_graph(rows, 1_000_000, g_dir)
    best = float("inf")
    for _ in range(2):
        edges = read_parquet_sized(os.path.join(g_dir, "edges.parquet"))
        nodes_ds = ray.data.range(1_000_000).map_batches(
            lambda b: pa.table({"node": pa.array(b["id"], pa.int64())}),
            batch_format="pyarrow",
        )
        t0 = time.perf_counter()
        n_out = pagerank(edges, nodes_ds, n_iter=15, shards=8).count()
        best = min(best, time.perf_counter() - t0)
    res["pagerank"] = {
        "edges": rows, "nodes": 1_000_000, "iters": 15,
        "rows_out": n_out, "sec": round(best, 2),
        "edge_iters_per_sec": round(rows * 15 / best, 1),
    }

    # BM25 over a 10M-token corpus: index build once, then query latency
    from crossai_ts_ray.pipelines import search as S

    doc_dir = make_docs(rows, f"/tmp/crossai_bench_ngram_{rows}")
    t0 = time.perf_counter()
    S.build_bm25_index(doc_dir)
    build = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n_out = S.bm25_search(doc_dir, terms=("ccc", "dddd"), k=20).count()
        best = min(best, time.perf_counter() - t0)
    res["bm25"] = {
        "tokens": rows, "index_build_sec": round(build, 2),
        "tokens_per_sec_build": round(rows / build, 1),
        "query_sec": round(best, 3), "rows_out": n_out,
    }

    print(json.dumps({"bench": "w6_ops", "rows": rows, "results": res}))
    ray.shutdown()


if __name__ == "__main__":
    main()
