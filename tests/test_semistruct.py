"""Semi-structured family: the JSON extraction kernel, the HDR sketch's
integer bucket math (exactness + error bound), and partition/batch
invariance + DuckDB parity for both driver queries."""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def test_extract_int_field_kernel():
    import pytest

    from crossai_ts_ray.pipelines.semistruct import extract_int_field

    col = pa.array(
        [
            '{"k": 42}',
            '{"k":7}',
            '{ "k" : -3 , "z": 1}',
            '{"other": 5}',       # key absent -> null
            "",                    # not json -> null
        ]
    )
    out = extract_int_field(col, "k")
    assert out.to_pylist() == [42, 7, -3, None, None]

    # non-integer values fail LOUDLY (a regex kernel cannot mirror
    # json_extract's cast semantics for them; silence would diverge
    # from the oracle)
    for bad in ('{"k": 12.5}', '{"k": 1e3}', '{"k": "7"}',
                '{"k": "text"}'):
        with pytest.raises(ValueError):
            extract_int_field(pa.array([bad]), "k")


def test_hdr_bucket_exact_and_error_bound():
    from crossai_ts_ray.pipelines.semistruct import hdr_bucket, hdr_estimate

    # small values are exact
    c = np.arange(0, 32, dtype=np.int64)
    bid = hdr_bucket(c)
    assert (bid == c).all()
    est_c = hdr_estimate(bid) * 100.0
    assert np.allclose(est_c, c)

    # wide range incl. powers of two and their neighbours (the frexp
    # rounding edge) up to 2^62
    vals = []
    for e in range(5, 63):
        base = np.int64(1) << e
        vals += [base - 1, base, base + 1]
    c = np.array(vals, np.int64)
    bid = hdr_bucket(c)
    # bucket id monotone non-decreasing in c
    assert (np.diff(bid) >= 0).all()
    # midpoint relative error <= 1/32 (half of the 1/16 bucket width,
    # with slack for the +1 edges)
    est_c = hdr_estimate(bid) * 100.0
    rel = np.abs(est_c - c) / c
    assert rel.max() <= 1.0 / 32.0 + 1e-12

    # bucket boundaries: all values mapping to one bid span < c/16
    rng = np.random.default_rng(7)
    c = rng.integers(1, 1 << 40, size=20000).astype(np.int64)
    bid = hdr_bucket(c)
    order = np.argsort(bid, kind="stable")
    bs, cs = bid[order], c[order]
    starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
    ends = np.append(starts[1:], len(bs))
    for s, e in zip(starts, ends):
        lo, hi = cs[s:e].min(), cs[s:e].max()
        assert hi - lo <= max(lo // 16, 1)

    # negatives refuse loudly (SQL mirror has no sign branch)
    try:
        hdr_bucket(np.array([-1], np.int64))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hdr_quantiles_error_bound_vs_exact(ray_session):
    import duckdb

    from crossai_ts_ray.pipelines.semistruct import hdr_value_quantiles

    a = _canon(hdr_value_quantiles(SF)).set_index("event_type")
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).df()
    # the sketch's contract is the NEAREST-RANK quantile (rank ceil(q*n));
    # at tiny n the interpolated quantile can sit a whole order-statistic
    # gap away, which is a property of the data, not the sketch
    for et, grp in raw.groupby("event_type"):
        v = np.sort(grp["value"].to_numpy())
        n = len(v)
        for q, est_col in ((0.5, "p5_est"), (0.9, "p9_est"),
                           (0.99, "p99_est")):
            ex = float(v[int(np.ceil(q * n)) - 1])
            est = float(a.loc[et, est_col])
            # <= 1/32 bucket midpoint error + centi quantization
            assert abs(est - ex) <= max(ex / 32.0, 0.02), (et, q, est, ex)


def test_semistruct_bucket_and_batch_invariance(ray_session):
    from crossai_ts_ray.pipelines.semistruct import (
        hdr_value_quantiles,
        props_key_stats,
    )

    a = _canon(props_key_stats(SF, buckets=1, combine_batch_rows=64))
    b = _canon(props_key_stats(SF, buckets=19))
    assert a.equals(b)

    a = _canon(hdr_value_quantiles(SF, buckets=1, combine_batch_rows=64))
    b = _canon(hdr_value_quantiles(SF, buckets=19))
    assert a.equals(b)


def test_semistruct_duckdb_gate(ray_session):
    import duckdb

    import __ray_entry__ as E

    qs = E.queries()
    sql = E.oracle_sql()
    con = duckdb.connect()
    for t in (
        "events region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    for name in ("props_key_stats", "hdr_value_quantiles"):
        mine = _canon(qs[name](SF))
        oracle = _canon(con.execute(sql[name]).df())
        assert mine.shape == oracle.shape, name
        import pandas.testing as pdt

        pdt.assert_frame_equal(mine, oracle, check_dtype=False)
