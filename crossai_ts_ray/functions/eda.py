"""EDA kernels: grouped outlier filtering and feature correlation.

Reference: ``caits/eda/outliers_removal.py`` (z-score / IQR row filters per
class -- the one true grouped aggregate+filter in the reference, SURVEY.md
§2.7) and ``caits/eda/correlation.py`` (pairwise feature correlation)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def zscore_outlier_mask(x: np.ndarray, threshold: float = 3.0) -> np.ndarray:
    """True = keep (caits/eda/outliers_removal.py:8)."""
    x = np.asarray(x, dtype=np.float64)
    sd = x.std()
    if sd == 0:
        return np.ones(len(x), dtype=bool)
    return np.abs((x - x.mean()) / sd) <= threshold


def iqr_outlier_mask(x: np.ndarray, k: float = 1.5) -> np.ndarray:
    """True = keep (caits/eda/outliers_removal.py:29)."""
    x = np.asarray(x, dtype=np.float64)
    q1, q3 = np.percentile(x, [25, 75])
    iqr = q3 - q1
    return (x >= q1 - k * iqr) & (x <= q3 + k * iqr)


def filter_outliers_grouped(
    ds, group_col: str, value_col: str, method: str = "zscore", **kw
):
    """groupby(class) -> per-group stats -> row filter
    (caits/eda/outliers_removal.py:58 ``filter_outliers``): the grouped
    aggregate+filter expressed as ``groupby().map_groups``."""
    mask_fn = {"zscore": zscore_outlier_mask, "iqr": iqr_outlier_mask}[method]

    def per_group(g: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        g = g.combine_chunks()
        vals = g[value_col].to_numpy(zero_copy_only=False)
        return g.filter(pa.array(mask_fn(vals, **kw)))

    return ds.groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def corr_matrix(df: pd.DataFrame, method: str = "pearson") -> pd.DataFrame:
    """Pairwise feature correlation (caits/eda/correlation.py:35).  Spearman
    implemented via rank transform + Pearson (SciPy-free)."""
    x = df.select_dtypes(include=[np.number])
    if method == "pearson":
        return x.corr(method="pearson")
    if method == "spearman":
        return x.rank().corr(method="pearson")
    raise ValueError(method)


def get_high_corr_features(df: pd.DataFrame, threshold: float = 0.9) -> list[str]:
    """Columns to drop so no remaining pair exceeds ``threshold``
    (caits/eda/correlation.py:68)."""
    c = corr_matrix(df).abs()
    upper = c.where(np.triu(np.ones(c.shape, dtype=bool), k=1))
    return [col for col in upper.columns if (upper[col] > threshold).any()]
