"""Small driver-side helpers (results are small; the engine itself streams)."""

from __future__ import annotations

import pyarrow as pa
import ray


def dataset_to_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small, final) Dataset to one Arrow table, skipping the
    empty zero-column blocks Ray's sort/groupby can emit."""
    # materialize() first: it runs the execution to completion AND shuts the
    # streaming executor down; calling to_arrow_refs() on a live lazy plan
    # can leave a zombie scheduling loop holding resource reservations that
    # starves the next execution on a small cluster
    ds = ds.materialize()
    all_tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in all_tables if t.num_rows > 0]
    if not tables:
        if schema is None:
            # keep a real schema if any empty block carries one
            for t in all_tables:
                if t.num_columns:
                    return t.schema.empty_table()
            return pa.table({})
        return pa.Table.from_pylist([], schema=schema)
    tables = [t.cast(tables[0].schema) for t in tables]
    out = pa.concat_tables(tables).combine_chunks()
    return out.cast(schema) if schema is not None else out
