"""Salting on/off comparison on an UNCLUSTERED (striped) hot-source layout:
the generic shuffle path's skew story (north-rule requirement).

Striped layout: every (source, bucket) fragments across all of the source's
files, so the hot source produces partials for the same key in every batch --
the case the salted two-level combiner exists for.  Prints one JSON line with
both wall times and checks the outputs are identical bitwise.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    import crossai_ts_ray  # malloc tuning  # noqa: F401
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crossai_ts_ray import synth
    from crossai_ts_ray.schema import ROLLUP_SCHEMA, Tier
    from crossai_ts_ray.sources.readers import read_token_table
    from crossai_ts_ray.stages.rollup import finalize, merged_partials
    from crossai_ts_ray.util import dataset_to_table

    rows = int(os.environ.get("GRAFT_SALT_ROWS", "300000"))
    spec = synth.SynthSpec(
        total_rows=rows, num_sources=16, num_shards=8, mean_n_tok=96.0,
        zipf_s=2.0,  # severe skew: hot source ~70% of rows
        stride_layout=True,
    )
    d = synth.generate(spec, synth.default_cache_dir(spec))
    tier = Tier("1m", 60)

    results = {}
    tables = {}
    for salt in (0, 8):
        t0 = time.perf_counter()
        out = finalize(
            merged_partials(read_token_table(d), tier, salt_mod=salt, batch_size=16384)
        )
        tables[salt] = dataset_to_table(out, ROLLUP_SCHEMA).sort_by(
            [("source", "ascending"), ("bucket", "ascending")]
        )
        results[f"salt_{salt}_sec"] = round(time.perf_counter() - t0, 2)

    a, b = tables[0], tables[8]
    identical = a.num_rows == b.num_rows and all(
        (
            a[c].to_numpy(zero_copy_only=False).view(np.uint64)
            == b[c].to_numpy(zero_copy_only=False).view(np.uint64)
        ).all()
        if a[c].to_numpy(zero_copy_only=False).dtype.kind == "f"
        else (
            a[c].to_numpy(zero_copy_only=False)
            == b[c].to_numpy(zero_copy_only=False)
        ).all()
        for c in a.schema.names
    )
    results.update(
        rows=rows, groups=a.num_rows, bitwise_identical=bool(identical),
        speedup=round(results["salt_0_sec"] / results["salt_8_sec"], 2),
    )

    # --- keyed_equijoin on a zipf-hot key: manual salt vs salt="auto" ---
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from crossai_ts_ray.stages.joins import estimate_salt, keyed_equijoin

    rng = np.random.default_rng(23)
    n_left = int(os.environ.get("GRAFT_JOIN_ROWS", "400000"))
    # zipf-ish: hot key 0 carries ~60% of left rows, tail over 10k keys
    hot = np.zeros(int(n_left * 0.6), np.int64)
    tail = rng.integers(1, 10_000, n_left - len(hot)).astype(np.int64)
    lk = np.concatenate([hot, tail])
    rng.shuffle(lk)
    left_t = pa.table(
        {"k": pa.array(lk, pa.int64()),
         "payload": pa.array(rng.integers(0, 1 << 30, n_left), pa.int64())}
    )
    right_t = pa.table(
        {"rk": pa.array(np.arange(10_000, dtype=np.int64), pa.int64()),
         "attr": pa.array(rng.integers(0, 1 << 30, 10_000), pa.int64())}
    )
    schemas = (left_t.schema, right_t.schema)
    t0 = time.perf_counter()
    auto_salt = estimate_salt(rd.from_arrow(left_t), "k", buckets=16)
    results["estimate_salt_sec"] = round(time.perf_counter() - t0, 2)
    join_tables = {}
    # "auto" passes the pre-measured factor so the join wall is comparable
    # to manual; the sampling cost is reported separately (it is a fixed
    # ~sample_rows read, amortized at real scale)
    for name, salt in (("unsalted", 1), ("manual", 8), ("auto", auto_salt)):
        t0 = time.perf_counter()
        out = keyed_equijoin(
            rd.from_arrow(left_t), rd.from_arrow(right_t),
            on=("k", "rk"), buckets=16, schemas=schemas, salt=salt,
        )
        df = out.to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)
        join_tables[name] = df
        results[f"join_{name}_sec"] = round(time.perf_counter() - t0, 2)
    join_identical = all(
        join_tables["unsalted"].equals(join_tables[n]) for n in ("manual", "auto")
    )
    results.update(
        join_rows=n_left,
        auto_salt_chosen=int(auto_salt),
        join_bitwise_identical=bool(join_identical),
        auto_vs_manual=round(
            results["join_auto_sec"] / max(results["join_manual_sec"], 1e-9), 2
        ),
    )

    print(json.dumps(results))
    ray.shutdown()
    sys.exit(0 if (identical and join_identical) else 1)


if __name__ == "__main__":
    main()
