"""Bloom pre-filter bench: how much exchange traffic the semi-join
pre-filter (stages/bloom.py) removes from a large-large join at
beyond-sf scale.

Layout: 10M events over 10k users; ~5% of users are "active" (have a
recent order).  The task: keep only active users' events (semi-join).
Measured both ways -- the plain partitioned equijoin that shuffles all 10M
rows, and the bloom path that builds a 16K-bit filter from the active keys,
drops ~95% of events inside the map tasks, and joins only the survivors.
Results are verified IDENTICAL (the join removes the filter's false
positives, and a Bloom filter never false-negatives).

    python tools/bench_bloom.py [rows]    # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bench_events import make_events


def make_orders(out_dir: str, n_users: int = 10_000, active_frac: float = 0.05):
    path = os.path.join(out_dir, "orders.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(23)
    n_active = int(n_users * active_frac)
    active = rng.choice(n_users, size=n_active, replace=False).astype(np.int64)
    # active users get a recent order; everyone gets old orders too
    old_ck = rng.integers(0, n_users, 50_000).astype(np.int64)
    old_ts = np.datetime64("1999-06-01T00:00:00.000000") + rng.integers(
        0, 300 * 86_400 * 1_000_000, 50_000
    ).astype("timedelta64[us]")
    new_ts = np.datetime64("2001-02-01T00:00:00.000000") + rng.integers(
        0, 100 * 86_400 * 1_000_000, n_active
    ).astype("timedelta64[us]")
    t = pa.table(
        {
            "o_custkey": pa.array(np.concatenate([old_ck, active]), pa.int64()),
            "o_orderdate": pa.array(np.concatenate([old_ts, new_ts])),
        }
    )
    pq.write_table(t, path, row_group_size=1 << 20)


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
    sf_dir = make_events(rows, f"/tmp/bench_bloom_{rows}")
    make_orders(sf_dir)

    from crossai_ts_ray.sources.readers import read_parquet_sized
    from crossai_ts_ray.stages.bloom import (
        pack_bitmap, partial_bits, probe_bitmap,
    )
    from crossai_ts_ray.stages.joins import keyed_equijoin
    from crossai_ts_ray.util import dataset_to_table

    M, K = 16_384, 5
    cutoff = np.datetime64("2001-01-01T00:00:00.000000").astype(np.int64)

    def active_keys_ds():
        orders = read_parquet_sized(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )

        def pick(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            od = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)[od >= cutoff]
            return pa.table({"key": pa.array(np.unique(ck), pa.int64())})

        return orders.map_batches(pick, batch_format="pyarrow")

    def events_ds():
        return read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
        )

    ev_schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64())])
    key_schema = pa.schema([("key", pa.int64())])

    def semijoin_count(ev) -> int:
        j = keyed_equijoin(
            ev, active_keys_ds(), on=("user_id", "key"), buckets=64,
            schemas=(ev_schema, key_schema),
        )
        return j.count()

    out = {"rows": rows, "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "8"))}

    # plain: every event row rides the exchange
    best_plain, n_plain = float("inf"), 0
    for _ in range(2):
        t0 = time.perf_counter()
        n_plain = semijoin_count(events_ds())
        best_plain = min(best_plain, time.perf_counter() - t0)

    # bloom: build once (bounded 16K positions), filter inside map tasks
    best_bloom, n_bloom, survivors = float("inf"), 0, 0
    for _ in range(2):
        t0 = time.perf_counter()
        pos = dataset_to_table(
            active_keys_ds().map_batches(
                lambda t: pa.table(
                    {"p": pa.array(partial_bits(
                        t.combine_chunks()["key"].to_numpy(
                            zero_copy_only=False), M, K), pa.int64())}
                ),
                batch_format="pyarrow",
            ),
            schema=pa.schema([("p", pa.int64())]),
        )
        bm = pack_bitmap(
            np.unique(pos["p"].to_numpy(zero_copy_only=False)), M
        )

        def prefilter(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(probe_bitmap(uid, bm, M, K)))

        filtered = events_ds().map_batches(prefilter, batch_format="pyarrow")
        n_bloom = semijoin_count(filtered)
        best_bloom = min(best_bloom, time.perf_counter() - t0)
        survivors = filtered.count()

    assert n_plain == n_bloom, (n_plain, n_bloom)
    out.update(
        {
            "semijoin_rows": n_plain,
            "rows_shuffled_plain": rows,
            "rows_shuffled_bloom": survivors,
            "shuffle_reduction": round(1.0 - survivors / rows, 4),
            "sec_plain": round(best_plain, 3),
            "sec_bloom": round(best_bloom, 3),
            "speedup": round(best_plain / best_bloom, 2),
        }
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
