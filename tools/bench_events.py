"""Focused events-family bench at beyond-sf scale with a HOT source.

Round 3's weak set was the events family (per-group Python merge; sliding
window serialized on a hot source).  Both were redesigned in round 4
(vectorized partition merge; chunked sliding scan with carried boundary
buckets); this bench puts a measured number on the fix: 10M events over 50
types where ONE type carries ~50% of rows (the layout that serialized the
old design), through hourly rollup -> linear gap-fill -> 3h sliding window.

    python tools/bench_events.py [rows]    # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_events(rows: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(path):
        return out_dir
    rng = np.random.default_rng(11)
    n_types = 50
    # one hot type with ~half the rows, the rest zipf-ish
    w = 1.0 / np.arange(1, n_types + 1) ** 1.5
    w[0] = w.sum()
    w /= w.sum()
    tid = rng.choice(n_types, size=rows, p=w)
    base = np.datetime64("2025-01-01T00:00:00.000000")
    span_us = 90 * 24 * 3600 * 1_000_000
    ts = base + rng.integers(0, span_us, rows).astype("timedelta64[us]")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(rows, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 10_000, rows).astype(np.int64)),
            "event_type": pa.array(np.char.add("type_", tid.astype(str))),
            "ts": pa.array(ts),
            "value": pa.array(np.round(rng.random(rows) * 100, 3)),
        }
    )
    pq.write_table(t, path, row_group_size=1 << 20)
    return out_dir


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    sf_dir = make_events(rows, f"/tmp/bench_events_{rows}")

    from crossai_ts_ray.pipelines.analytics import (
        cohort_retention,
        cusum_hourly_drift,
        ewma_hourly,
        gini_by_type,
        holt_hourly,
        topk_events_per_user,
        user_breakout_minmax,
        user_event_lag_diff,
        user_value_mad,
        user_value_quantiles,
        value_histogram,
        value_percent_rank,
    )
    from crossai_ts_ray.pipelines.events_pipeline import (
        hourly_anomalies,
        hourly_gapfill,
        hourly_rollup,
        sliding_hourly,
    )
    from crossai_ts_ray.util import dataset_to_table

    out = {"rows": rows, "hot_share": 0.5, "types": 50,
           "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "8")), "stages": {}}
    from crossai_ts_ray.pipelines.analytics import _auto_scale_path

    out["percent_rank_auto_two_pass"] = _auto_scale_path(sf_dir)
    for name, fn in (
        ("hourly_rollup", lambda: hourly_rollup(sf_dir)),
        ("gapfill_linear", lambda: hourly_gapfill(sf_dir, "linear")),
        ("sliding_3h", lambda: sliding_hourly(sf_dir, window_buckets=3)),
        # analytics scans over the same hot-type table: the row-level window
        # scans (lag, breakout) ship raw rows through ONE keyed exchange;
        # the rest are combiner-bounded
        ("lag_diff", lambda: user_event_lag_diff(sf_dir)),
        ("topk_per_user", lambda: topk_events_per_user(sf_dir)),
        ("quantiles", lambda: user_value_quantiles(sf_dir)),
        ("breakout_minmax", lambda: user_breakout_minmax(sf_dir)),
        ("histogram", lambda: value_histogram(sf_dir)),
        ("ewma_hourly", lambda: ewma_hourly(sf_dir)),
        # round-4 late additions: anomaly/drift/forecast scans -- all run
        # on rollup rows (source x hour), never raw events
        ("anomalies_24h", lambda: hourly_anomalies(sf_dir)),
        ("cusum_drift", lambda: cusum_hourly_drift(sf_dir)),
        ("holt_forecast", lambda: holt_hourly(sf_dir)),
        # wave-3 additions: percent_rank is a row-level rank scan with a
        # 50%-hot type partition (the adversarial layout for it); MAD is
        # a double segment-median per user; gini/cohort are
        # combiner/partition-bounded
        # round-5: auto-routing crossover evidence -- the same query
        # forced down each path; percent_rank (unforced) shows what the
        # footer+head estimate picked at this hot share
        ("percent_rank", lambda: value_percent_rank(sf_dir)),
        ("percent_rank_single", lambda: value_percent_rank(
            sf_dir, scale_path=False)),
        ("percent_rank_two_pass", lambda: value_percent_rank(
            sf_dir, scale_path=True)),
        ("mad_per_user", lambda: user_value_mad(sf_dir)),
        ("gini_by_type", lambda: gini_by_type(sf_dir)),
        ("cohort_retention", lambda: cohort_retention(sf_dir)),
    ):
        # row-count-sized outputs (the per-event window scans) are CONSUMED
        # STREAMING (count()) -- materializing 10M rows on the driver would
        # measure the object store, not the operator; small outputs
        # round-trip fully so out_rows is still exact
        streaming = name in ("lag_diff", "breakout_minmax", "percent_rank",
                             "percent_rank_single", "percent_rank_two_pass")
        best = float("inf")
        n_out = 0
        for _ in range(2):
            t0 = time.perf_counter()
            ds = fn()
            n_out = ds.count() if streaming else dataset_to_table(ds).num_rows
            best = min(best, time.perf_counter() - t0)
        out["stages"][name] = {
            "sec": round(best, 3),
            "out_rows": n_out,
            "rows_per_sec": round(rows / best, 1),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
