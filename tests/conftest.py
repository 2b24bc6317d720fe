"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pytest

warnings.filterwarnings("ignore")


@pytest.fixture(autouse=True)
def _collect_dangling_executors():
    """Partially-consumed Dataset executions (limit(), early exits) keep
    their streaming executor + resource reservations alive until GC'd; on a
    small test cluster a leaked reservation deadlocks the next execution."""
    yield
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


def assert_tables_bitwise_equal(gold: pa.Table, got: pa.Table, label: str = ""):
    """Exact equality: ints compared as ints, floats compared on bit patterns
    (NaN == NaN; -0.0 != 0.0), rows matched on sorted (source, bucket)."""
    keys = [(n, "ascending") for n in ("source", "bucket") if n in gold.schema.names]
    g = gold.sort_by(keys) if keys else gold
    f = got.cast(gold.schema).sort_by(keys) if keys else got.cast(gold.schema)
    assert g.num_rows == f.num_rows, f"{label}: rows {g.num_rows} != {f.num_rows}"
    for col in g.schema.names:
        a = g[col].to_numpy(zero_copy_only=False)
        b = f[col].to_numpy(zero_copy_only=False)
        if a.dtype.kind == "f":
            ok = (a.view(np.uint64) == b.view(np.uint64)).all()
        else:
            ok = (a == b).all()
        assert ok, f"{label}: column {col} differs"
