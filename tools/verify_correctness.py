"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry through Ray and its ``oracle_sql()`` through
DuckDB on the same parquet tables, then compares row count, schema (sorted
column names) and exact values (rows sorted, columns sorted by name, floats
compared for exact equality with NaN==NaN).

Usage: python tools/verify_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import warnings

warnings.filterwarnings("ignore")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            from crossai_ts_ray.util import dataset_to_table

            return dataset_to_table(res).to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, ray_df, sql_df) -> list[str]:
    import numpy as np

    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: {sorted(ray_df.columns)} != {sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: {len(ray_df)} != {len(sql_df)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            ok = ((av == bv) | (np.isnan(av) & np.isnan(bv))).all()
            if not ok:
                bad = np.flatnonzero(~((av == bv) | (np.isnan(av) & np.isnan(bv))))
                problems.append(
                    f"col {c}: {len(bad)} diffs, first: {av[bad[0]]!r} != {bv[bad[0]]!r} @row{bad[0]}"
                )
        else:
            ok = (av.astype(object) == bv.astype(object)).all()
            if not ok:
                bad = np.flatnonzero(av.astype(object) != bv.astype(object))
                problems.append(
                    f"col {c}: {len(bad)} diffs, first: {av[bad[0]]!r} != {bv[bad[0]]!r} @row{bad[0]}"
                )
    if not problems:
        # dtype parity matters for the driver's schema check
        for c in a.columns:
            if str(a[c].dtype) != str(b[c].dtype):
                problems.append(f"dtype {c}: {a[c].dtype} != {b[c].dtype} (warning)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb
    import ray
    from ray.data import DataContext

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: ray raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(ray_df)} rows ({list(ray_df.columns)})")
            continue
        try:
            sql_df = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: sql raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = compare(name, ray_df, sql_df)
        hard = [p for p in problems if "warning" not in p]
        if hard:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            tag = " (" + "; ".join(problems) + ")" if problems else ""
            print(f"[OK]   {name}: {len(ray_df)} rows{tag}")
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
