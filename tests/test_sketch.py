"""HyperLogLog sketch kernels: exact bit-length at power-of-two boundaries
(where float log2 is off by one), merge invariance under any sharding, and
the estimate's error bound vs exact distinct counts."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_bitlen_exact_boundaries():
    from crossai_ts_ray.stages.sketch import _bitlen

    vals, want = [], []
    for k in range(64):
        vals.append(1 << k)
        want.append(k + 1)
        if k > 0:
            vals.append((1 << k) - 1)
            want.append(k)
    vals.append(0)
    want.append(0)
    vals.append((1 << 64) - 1)
    want.append(64)
    got = _bitlen(np.array(vals, dtype=np.uint64))
    assert got.tolist() == want


def test_merge_invariance_any_sharding():
    """Registers from N arbitrary shards merged == single-pass registers,
    bitwise -- the property that makes block layout/retries irrelevant."""
    from crossai_ts_ray.stages.sketch import hll_partial, merge_registers

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
    b1, r1 = hll_partial(keys, p=12)
    for nshards in (2, 7, 64):
        bs, rs = [], []
        for shard in np.array_split(keys, nshards):
            b, r = hll_partial(shard, p=12)
            bs.append(b)
            rs.append(r)
        bm, rm = merge_registers(np.concatenate(bs), np.concatenate(rs))
        assert np.array_equal(bm, b1) and np.array_equal(rm, r1)


def test_estimate_error_bound():
    """m=4096 HLL has ~1.04/sqrt(m) = 1.6% std error; assert 5% over a
    range of true cardinalities spanning the linear-counting crossover."""
    from crossai_ts_ray.stages.sketch import hll_estimate, hll_partial

    rng = np.random.default_rng(3)
    for n in (500, 5_000, 50_000, 500_000):
        keys = rng.choice(np.int64(2) ** 62, size=n, replace=False)
        # duplicate every key 3x -- dups must not move the estimate
        keys = np.repeat(keys, 3)
        b, r = hll_partial(keys.astype(np.int64), p=12)
        est = hll_estimate(b, r, p=12)
        assert abs(est - n) / n < 0.05, (n, est)


def test_pipeline_matches_exact_at_sf(ray_session):
    from crossai_ts_ray.pipelines.analytics import approx_distinct_user_days
    from tools.verify_correctness import to_pandas

    import duckdb

    sf = "/root/testdata/sf0.001"
    est = to_pandas(approx_distinct_user_days(sf))["approx_distinct"].iloc[0]
    exact = duckdb.sql(
        f"""SELECT count(DISTINCT user_id * 100000
                          + epoch_us(ts) // 86400000000)
            FROM '{sf}/events.parquet'"""
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_cms_never_underestimates_and_shard_invariance():
    from crossai_ts_ray.stages.sketch import (
        cms_estimate, cms_partial,
    )

    rng = np.random.default_rng(5)
    # zipf-ish frequencies over 2000 keys, small w to force collisions
    keys = rng.zipf(1.5, size=100_000) % 2_000
    keys = keys.astype(np.int64)
    d, w = 4, 256

    def build(shards):
        counter = np.zeros((d, w), np.int64)
        for s in shards:
            rj, bj, cj = cms_partial(s, d, w)
            np.add.at(counter, (rj, bj), cj)
        return counter

    c1 = build([keys])
    c2 = build(np.array_split(keys, 13))
    assert np.array_equal(c1, c2)  # sum-merge is order/shard-insensitive

    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(c1, uniq)
    assert (est >= true).all()  # CMS never underestimates
    # with 100k rows in 256 buckets collisions are guaranteed, but the
    # min-of-4 keeps the heavy hitters near-exact
    top = np.argsort(true)[-10:]
    assert (est[top] <= true[top] * 1.5).all()


def test_cms_pipeline_exact_when_sparse(ray_session):
    """150 users in 1024 buckets: the estimate is exact for (nearly) all
    users; every estimate is >= the true count regardless."""
    import duckdb

    from crossai_ts_ray.pipelines.analytics import cms_user_event_counts
    from tools.verify_correctness import to_pandas

    sf = "/root/testdata/sf0.001"
    got = to_pandas(cms_user_event_counts(sf)).set_index("user_id")
    true = duckdb.sql(
        f"SELECT user_id, count(*) c FROM '{sf}/events.parquet' GROUP BY 1"
    ).df().set_index("user_id")
    for uid, row in true.iterrows():
        assert got.loc[uid, "est_count"] >= row["c"]
    assert (got["est_count"].sort_index() == true["c"].sort_index()).mean() > 0.9
