"""Partitioning/batching invariance for the analytics family: the keyed
exchange's bucket count and the combiner's batch boundaries must never
change an output bit (same guarantee the rollup and dedup families carry).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def test_quantiles_bucket_invariance(ray_session):
    from crossai_ts_ray.pipelines.analytics import user_value_quantiles

    a = _canon(user_value_quantiles(SF, buckets=1))
    b = _canon(user_value_quantiles(SF, buckets=17))
    assert a.equals(b)


def test_topk_bucket_invariance(ray_session):
    from crossai_ts_ray.pipelines.analytics import topk_events_per_user

    a = _canon(topk_events_per_user(SF, buckets=2))
    b = _canon(topk_events_per_user(SF, buckets=13))
    assert a.equals(b)
    # k rows per user, rank dense from 1
    assert set(a["rnk"].unique()) <= {1, 2, 3}
    assert (a.groupby("user_id")["rnk"].max() <= 3).all()


def test_pivot_bucket_invariance_and_totals(ray_session):
    import duckdb

    from crossai_ts_ray.pipelines.analytics import events_type_pivot

    a = _canon(events_type_pivot(SF, buckets=3))
    b = _canon(events_type_pivot(SF, buckets=29))
    assert a.equals(b)
    # row count == distinct users; n_events sums to the table size
    con = duckdb.connect()
    n_users, n_rows = con.execute(
        f"SELECT count(DISTINCT user_id), count(*) FROM '{SF}/events.parquet'"
    ).fetchone()
    assert len(a) == n_users
    assert int(a["n_events"].sum()) == n_rows


def test_distinct_matches_pandas(ray_session):
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import type_user_distinct

    got = _canon(type_user_distinct(SF, buckets=5))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    want = (
        ev.groupby("event_type")["user_id"]
        .nunique()
        .reset_index()
        .rename(columns={"user_id": "distinct_users"})
    )
    want["distinct_users"] = want["distinct_users"].astype("int64")
    from tools.verify_correctness import canon

    assert canon(want).equals(got)


def test_breakout_bucket_invariance_and_pandas(ray_session):
    import numpy as np
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import user_breakout_minmax

    a = _canon(user_breakout_minmax(SF, buckets=2))
    b = _canon(user_breakout_minmax(SF, buckets=19))
    assert a.equals(b)
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    prev = ev.groupby("user_id")["value"].shift(1)
    want_max = prev.groupby(ev["user_id"]).cummax().to_numpy()
    got = a.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    gm = got["run_max"].to_numpy()
    assert ((gm == want_max) | (np.isnan(gm) & np.isnan(want_max))).all()


def test_ewma_matches_sequential_reference(ray_session):
    import numpy as np
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import ewma_hourly

    got = _canon(ewma_hourly(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["bucket"] = (ev["ts"].astype("int64") // 1_000_000) // 3600
    ev["vu"] = np.rint(ev["value"].to_numpy() * 1e6).astype("int64")
    agg = ev.groupby(["event_type", "bucket"]).agg(
        sum_u=("vu", "sum"), n=("vu", "size")
    ).reset_index()
    rows = []
    for ty, g in agg.groupby("event_type"):
        g = g.sort_values("bucket")
        x = (g["sum_u"].to_numpy() / 1_000_000.0) / g["n"].to_numpy()
        s = np.empty_like(x)
        s[0] = x[0]
        for i in range(1, len(x)):
            s[i] = 0.3 * x[i] + 0.7 * s[i - 1]
        rows.append(pd.DataFrame(
            {"event_type": ty, "bucket": g["bucket"].to_numpy(),
             "hourly_mean": x, "ewma": s}
        ))
    from tools.verify_correctness import canon

    want = canon(pd.concat(rows, ignore_index=True))
    assert (got["ewma"].to_numpy() == want["ewma"].to_numpy()).all()


def test_histogram_batch_invariance(ray_session):
    # regression: the partition hash must be batch-INDEPENDENT -- per-batch
    # dictionary codes once split the same (type, bin) across partitions,
    # emitting duplicate keys with partial counts when the combiner saw
    # more than one batch
    from crossai_ts_ray.pipelines.analytics import value_histogram

    a = _canon(value_histogram(SF))
    b = _canon(value_histogram(SF, combine_batch_rows=64, buckets=13))
    assert a.equals(b)
    assert not b.duplicated(subset=["event_type", "bin"]).any()


def test_conversion_bucket_invariance_and_semantics(ray_session):
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import user_conversion

    a = _canon(user_conversion(SF, buckets=1))
    b = _canon(user_conversion(SF, buckets=23))
    assert a.equals(b)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    signup_users = set(ev.loc[ev["event_type"] == "signup", "user_id"])
    assert set(a["user_id"]) == signup_users
    conv = a.dropna(subset=["purchase_ts"])
    assert (conv["purchase_ts"] > conv["signup_ts"]).all()
    assert (conv["convert_us"] > 0).all()


def test_unpivot_inverts_pivot(ray_session):
    from crossai_ts_ray.pipelines.analytics import (
        _TYPES,
        events_type_pivot,
        events_type_unpivot,
    )

    wide = _canon(events_type_pivot(SF))
    long = _canon(events_type_unpivot(SF))
    assert len(long) == len(wide) * len(_TYPES)
    back = long.pivot(index="user_id", columns="event_type", values="type_sum")
    for ty in _TYPES:
        assert (
            back[ty].sort_index().to_numpy()
            == wide.sort_values("user_id")[f"{ty}_sum"].to_numpy()
        ).all()


def test_lag_diff_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import user_event_lag_diff

    got = _canon(user_event_lag_diff(SF, buckets=4))
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    prev = ev.groupby("user_id")["value"].shift(1)
    want = pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "event_id": ev["event_id"].astype("int64"),
            "ts": ev["ts"],
            "value": ev["value"],
            "prev_value": prev,
            "value_diff": ev["value"] - prev,
        }
    )
    from tools.verify_correctness import canon

    want = canon(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
        else:
            assert (a == b).all(), c


def test_trend_degenerate_and_reference(ray_session, tmp_path):
    """Single-event and single-day users get NULL slope/intercept; a clean
    two-point user matches the closed-form line; full-SF output matches a
    NumPy polyfit reference within float tolerance."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import user_value_trend

    d = str(tmp_path / "trend")
    os.makedirs(d, exist_ok=True)
    day0 = np.datetime64("2000-01-01T12:00:00", "us").astype(np.int64)
    DAY = 86_400 * 1_000_000
    ts = np.array(
        [day0, day0 + DAY,          # user 1: two points, slope 2/day
         day0,                       # user 2: single point -> NULL
         day0, day0 + 3600 * 1_000_000],  # user 3: same DAY bin -> NULL
        dtype=np.int64,
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array([1.0, 3.0, 5.0, 1.0, 9.0], pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = _canon(user_value_trend(d, buckets=3)).set_index("user_id")
    assert abs(got.loc[1, "slope_per_day"] - 2.0) < 1e-9
    # x(2000-01-01) = 3652 days since 1990 (floor-quantized to days)
    assert abs(got.loc[1, "intercept"] - (1.0 - 2.0 * 3652)) < 1e-6
    assert np.isnan(got.loc[2, "slope_per_day"])
    assert np.isnan(got.loc[3, "slope_per_day"])

    # full SF vs NumPy polyfit on day-quantized x / centi-quantized y
    full = _canon(user_value_trend(SF, buckets=7))
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    e1990 = np.datetime64("1990-01-01T00:00:00", "us").astype(np.int64)
    x = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64) - e1990) // DAY
    y = np.rint(ev["value"].to_numpy() * 100.0) / 100.0
    for uid in full["user_id"].head(5):
        m = ev["user_id"].to_numpy() == uid
        ref = np.polyfit(x[m].astype(float), y[m], 1)
        row = full.set_index("user_id").loc[uid]
        assert abs(row["slope_per_day"] - ref[0]) < 1e-6
        assert abs(row["intercept"] - ref[1]) < 1e-3


def test_cusum_planted_drift(ray_session, tmp_path):
    """A sustained +2 level shift after hour 60 must raise CUSUM alerts in
    the shifted region and none before it."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import cusum_hourly_drift

    d = str(tmp_path / "cusum")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n = 120
    ts = base + np.arange(n, dtype=np.int64) * HOUR_US
    vals = 10.0 + 0.5 * np.sin(np.arange(n))  # bounded noise
    vals[60:] += 2.0                           # sustained drift
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.ones(n, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = _canon(cusum_hourly_drift(d))
    base_bucket = (base // 1_000_000) // 3600
    assert len(got) > 0
    # every alert is in the shifted region
    assert (got["bucket"] >= base_bucket + 60).all()
    # and the drift IS eventually caught
    assert got["bucket"].min() <= base_bucket + 90


def test_holt_tracks_linear_trend(ray_session, tmp_path):
    """On a perfectly linear series Holt's trend converges to the true
    slope and the one-step forecast tracks the next value."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import holt_hourly

    d = str(tmp_path / "holt")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n = 100
    ts = base + np.arange(n, dtype=np.int64) * HOUR_US
    vals = 5.0 + 2.0 * np.arange(n)  # exact slope 2/hour
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.ones(n, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = _canon(holt_hourly(d)).sort_values("bucket")
    assert abs(got["trend"].iloc[-1] - 2.0) < 1e-6
    # forecast at i predicts x_{i+1}
    fc = got["forecast"].to_numpy()[:-1]
    nxt = got["hourly_mean"].to_numpy()[1:]
    assert np.abs(fc[-20:] - nxt[-20:]).max() < 1e-4


def test_session_ids_consistent_with_session_counts(ray_session):
    """Row-level assignment must agree with the session-count scan: per
    user, max(session_id) + 1 == sessions."""
    from crossai_ts_ray.pipelines.analytics import user_session_ids
    from crossai_ts_ray.pipelines.events_pipeline import user_sessions

    ids = _canon(user_session_ids(SF, buckets=5))
    counts = _canon(user_sessions(SF, buckets=3)).set_index("user_id")
    per_user = ids.groupby("user_id")["session_id"].max() + 1
    for uid, n in per_user.items():
        assert counts.loc[uid, "sessions"] == n
    # session ids are dense 0..max within each user
    for uid, g in ids.groupby("user_id"):
        s = sorted(g["session_id"].unique())
        assert s == list(range(len(s)))


def test_seasonal_residuals_remove_planted_cycle(ray_session, tmp_path):
    """A pure 24h sinusoid decomposes into (profile == signal, residual ~0);
    a spike shows up in the residual, not the profile."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import seasonal_residuals_hourly

    d = str(tmp_path / "seas")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n = 24 * 20  # 20 full days
    ts = base + np.arange(n, dtype=np.int64) * HOUR_US
    hod = np.arange(n) % 24
    vals = 50.0 + 10.0 * np.sin(2 * np.pi * hod / 24)
    vals = np.round(vals, 2)
    vals[100] += 30.0  # spike
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.ones(n, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = _canon(seasonal_residuals_hourly(d)).sort_values("bucket")
    res = got["residual"].to_numpy()
    # all non-spike residuals are tiny (the spike leaks 30/20 = 1.5 into
    # its own hod's profile)
    spike_idx = 100
    others = np.delete(res, spike_idx)
    assert np.abs(others).max() < 2.0
    assert res[spike_idx] > 25.0


def test_acf_detects_planted_period(ray_session, tmp_path):
    """A 24h sinusoid has ACF ~ +1 at lag 24 and ~ -1 at lag 12."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import acf_hourly

    d = str(tmp_path / "acf")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n = 24 * 15
    ts = base + np.arange(n, dtype=np.int64) * HOUR_US
    vals = np.round(50.0 + 10.0 * np.sin(2 * np.pi * np.arange(n) / 24), 2)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.ones(n, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = _canon(acf_hourly(d)).set_index("lag")
    assert got.loc[24, "acf"] > 0.99
    assert got.loc[12, "acf"] < -0.99
    assert abs(got.loc[6, "acf"]) < 0.05  # quarter period ~ uncorrelated


def test_lttb_invariants_and_peak_preservation(ray_session, tmp_path):
    """LTTB output is a subsequence with endpoints kept, size min(n, n_out),
    and the global max/min of a spiky series survive downsampling (uniform
    striding would alias them away)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import lttb_hourly

    d = str(tmp_path / "lttb")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n = 2000
    ts = base + np.arange(n, dtype=np.int64) * HOUR_US
    vals = 50.0 + 5.0 * np.sin(np.arange(n) / 30.0)
    vals[777] = 500.0   # narrow peak
    vals[1333] = -400.0  # narrow trough
    vals = np.round(vals, 2)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.ones(n, np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = _canon(lttb_hourly(d, n_out=100)).sort_values("bucket")
    assert len(got) == 100
    base_bucket = (base // 1_000_000) // 3600
    bk = got["bucket"].to_numpy()
    assert bk[0] == base_bucket and bk[-1] == base_bucket + n - 1
    # subsequence of the original grid, strictly increasing
    assert (np.diff(bk) > 0).all()
    # the narrow peak and trough survive
    assert got["hourly_mean"].max() == 500.0
    assert got["hourly_mean"].min() == -400.0
    # short series pass through unchanged
    full = _canon(lttb_hourly(d, n_out=5000))
    assert len(full) == n


def test_lead_bounds_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import user_event_lead_bounds

    got = _canon(user_event_lead_bounds(SF, buckets=4))
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    g = ev.groupby("user_id")["value"]
    want = pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "event_id": ev["event_id"].astype("int64"),
            "ts": ev["ts"],
            "value": ev["value"],
            "next_value": g.shift(-1),
            "first_value": g.transform("first"),
            "last_value": g.transform("last"),
        }
    )
    from tools.verify_correctness import canon

    want = canon(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
        else:
            assert (a == b).all(), c


def test_xcorr_lag1_detects_planted_lead(ray_session, tmp_path):
    """Type b is type a shifted forward one hour: corr(a at t, b at t+1)
    is ~1, while the reverse direction (b leads a) is far from 1."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.analytics import type_hourly_xcorr_lag1

    d = str(tmp_path / "xc")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n = 24 * 10
    rng = np.random.default_rng(3)
    sig = np.round(np.cumsum(rng.normal(0, 1, n)) + 100, 2)  # wandering series
    ts = base + np.arange(n, dtype=np.int64) * HOUR_US
    rows = {
        "user_id": pa.array(np.ones(2 * n, np.int64)),
        "event_id": pa.array(np.arange(2 * n, dtype=np.int64)),
        "event_type": pa.array(["a"] * n + ["b"] * n),
        # b at hour t+1 equals a at hour t
        "ts": pa.array(np.concatenate([ts, ts + HOUR_US]).view("datetime64[us]")),
        "value": pa.array(np.concatenate([sig, sig]), pa.float64()),
    }
    pq.write_table(pa.table(rows), f"{d}/events.parquet")
    got = type_hourly_xcorr_lag1(d).to_pandas().set_index(["type_a", "type_b"])
    assert got.loc[("a", "b"), "corr_ab"] == 1.0
    assert got.loc[("b", "a"), "corr_ab"] < 0.99


def test_stratified_sample_docs_cap_and_determinism(ray_session):
    import pandas as pd

    from crossai_ts_ray.pipelines.analytics import stratified_sample_docs

    out = stratified_sample_docs(SF, n=3).to_pandas()
    per = out.groupby("source").size()
    assert (per == 3).all()
    assert set(out["rn"]) == {1, 2, 3}
    out2 = stratified_sample_docs(SF, n=3).to_pandas()
    a = out.sort_values(["source", "rn"]).reset_index(drop=True)
    b = out2.sort_values(["source", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
