"""Dataset-level operations: the reference's CoreDataset op contract
(SURVEY.md §2.8) on Ray Datasets.

| reference (caits/dataset/...)                  | here                       |
|------------------------------------------------|----------------------------|
| shuffle(seed)  (_list.py:439)                  | shuffle()                  |
| train_test_split stratified (_array.py:283)    | train_test_split()         |
| batch(batch_size) (_list.py:117)               | ds.iter_batches            |
| concat axis=0 (_convert.py:42)                 | ds.union                   |
| unique classes (_encoder.py:19)                | ds.unique(col)             |
| to_numpy/df/dict (_dataset.py)                 | to_pandas / iter_batches   |

Note: ``DatasetArray.shuffle`` in the reference drops its seed (bug,
/root/reference/caits/dataset/_dataset/_array.py:455-457); here the seed is
always honored.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def shuffle(ds, seed: int = 0):
    """Seeded global shuffle (an all-to-all exchange -- use only when row
    order randomization is actually required)."""
    return ds.random_shuffle(seed=seed)


def train_test_split(
    ds, test_size: float = 0.2, stratify_col: str | None = None, seed: int = 42
):
    """Stratified split: per-class proportional sampling without replacement
    via seeded per-group choice (the reference's RandomState.choice rule,
    /root/reference/caits/dataset/_dataset/_list.py:288-336).  Returns
    (train_ds, test_ds).  Deterministic per (seed, class, class size)."""
    if stratify_col is None:
        tagged = ds.map_batches(
            lambda t, *, _s=seed: _tag_random(t, test_size, _s),
            batch_format="pyarrow",
        )
    else:
        tagged = ds.groupby(stratify_col).map_groups(
            lambda t: _tag_group(t, test_size, seed, stratify_col),
            batch_format="pyarrow",
        )
    train = tagged.filter(expr="_is_test == False").drop_columns(["_is_test"])
    test = tagged.filter(expr="_is_test == True").drop_columns(["_is_test"])
    return train, test


def _tag_group(t: pa.Table, test_size: float, seed: int, stratify_col: str) -> pa.Table:
    t = t.combine_chunks()
    n = t.num_rows
    cls = t[stratify_col][0].as_py() if n else ""
    rng = np.random.RandomState(seed + (hash_str(cls) % 10000))
    n_test = int(round(n * test_size))
    test_idx = rng.choice(n, size=n_test, replace=False) if n_test else np.array([], int)
    mask = np.zeros(n, dtype=bool)
    mask[test_idx] = True
    return t.append_column("_is_test", pa.array(mask))


def _tag_random(t: pa.Table, test_size: float, seed: int) -> pa.Table:
    t = t.combine_chunks()
    rng = np.random.RandomState(seed)
    mask = rng.random_sample(t.num_rows) < test_size
    return t.append_column("_is_test", pa.array(mask))


def hash_str(s: str) -> int:
    import zlib

    return zlib.crc32(str(s).encode())


def concat(*datasets):
    """Row-union (axis=0 concat, /root/reference/caits/dataset/_convert.py:42)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out
