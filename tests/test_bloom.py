"""Bloom pre-filter kernels: no false negatives ever, sharding-invariant
build, bounded false-positive rate, and pipeline consistency with the exact
semi-join."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

M, K = 16_384, 5


def test_no_false_negatives_and_shard_invariance():
    from crossai_ts_ray.stages.bloom import (
        pack_bitmap, partial_bits, probe_bitmap,
    )

    rng = np.random.default_rng(11)
    build = rng.integers(0, 2**62, size=1_500, dtype=np.int64)
    single = np.unique(partial_bits(build, M, K))
    for nshards in (3, 17):
        parts = [partial_bits(s, M, K) for s in np.array_split(build, nshards)]
        assert np.array_equal(np.unique(np.concatenate(parts)), single)
    bm = pack_bitmap(single, M)
    # every build key passes -- a Bloom filter never false-negatives
    assert probe_bitmap(build, bm, M, K).all()


def test_false_positive_rate_bounded():
    from crossai_ts_ray.stages.bloom import (
        pack_bitmap, partial_bits, probe_bitmap,
    )

    rng = np.random.default_rng(13)
    build = rng.integers(0, 2**62, size=1_000, dtype=np.int64)
    bm = pack_bitmap(partial_bits(build, M, K), M)
    probe = rng.integers(2**62, 2**63 - 1, size=50_000, dtype=np.int64)
    fp = probe_bitmap(probe, bm, M, K).mean()
    # theory: (1 - e^(-kn/m))^k ~ (0.263)^5 ~ 0.0013; allow 3x slack
    assert fp < 0.004, fp


def test_pipeline_superset_of_exact_semijoin(ray_session):
    import duckdb

    from crossai_ts_ray.pipelines.analytics import (
        bloom_active_purchaser_events,
    )
    from tools.verify_correctness import to_pandas

    sf = "/root/testdata/sf0.001"
    got = to_pandas(bloom_active_purchaser_events(sf)).iloc[0]
    exact = duckdb.sql(
        f"""SELECT count(*) FROM '{sf}/events.parquet' e
            WHERE EXISTS (SELECT 1 FROM '{sf}/orders.parquet' o
                          WHERE o.o_custkey = e.user_id
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01')"""
    ).fetchone()[0]
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    assert got["total_events"] == total
    # the filter passes all true members plus a small FP residue
    assert got["bloom_pass"] >= exact
    assert got["bloom_pass"] <= total
    fp = (got["bloom_pass"] - exact) / max(total - exact, 1)
    assert fp < 0.01, (got["bloom_pass"], exact)


def test_keyed_equijoin_bloom_bitwise_identical(ray_session):
    """The opt-in pre-filter must never change a join's output: false
    positives are removed by the join, false negatives don't exist."""
    import pandas as pd
    import pyarrow as pa

    from crossai_ts_ray.sources.readers import read_parquet_sized
    from crossai_ts_ray.stages.joins import keyed_equijoin
    from tools.verify_correctness import canon, to_pandas

    sf = "/root/testdata/sf0.001"
    schemas = (
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        pa.schema([("c_custkey", pa.int64()), ("c_acctbal", pa.float64())]),
    )

    def run(**kw):
        orders = read_parquet_sized(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        # selective right side: ~half the customers
        cust = read_parquet_sized(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_acctbal"]
        ).filter(lambda r: r["c_custkey"] % 2 == 0)
        return canon(to_pandas(keyed_equijoin(
            orders, cust, on=("o_custkey", "c_custkey"), buckets=7,
            schemas=schemas, **kw,
        )))

    plain = run()
    bloomed = run(bloom_prefilter=16_384)
    pd.testing.assert_frame_equal(plain, bloomed)
    assert len(plain) > 0


def test_keyed_equijoin_bloom_rejects_left_join(ray_session):
    import pytest

    from crossai_ts_ray.sources.readers import read_parquet_sized
    from crossai_ts_ray.stages.joins import keyed_equijoin

    sf = "/root/testdata/sf0.001"
    orders = read_parquet_sized(f"{sf}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = read_parquet_sized(f"{sf}/customer.parquet",
                              columns=["c_custkey"])
    with pytest.raises(ValueError, match="inner"):
        keyed_equijoin(orders, cust, on=("o_custkey", "c_custkey"),
                       how="left", bloom_prefilter=True)
