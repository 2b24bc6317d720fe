"""User-extension surface: composable pipeline of engine stages -- the
Ray-Data-native equivalent of the reference's sklearn ``Pipeline`` of
``BaseEstimator+TransformerMixin`` steps over ``CoreDataset``
(SURVEY.md §2.10; /root/reference/caits/transformers/*).

A pipeline is an ordered list of named stages compiled onto a
``ray.data.Dataset``: each stage is a batch transform, a keyed shuffle, or an
actor-pool map.  UDF hook = any ``pa.Table -> pa.Table`` callable (stateless)
or callable class (actor pool), mirroring ``FunctionTransformer``
(/root/reference/caits/transformers/_function_transformers/_func_transformer.py:7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa


class Stage:
    """Base stage: implements ``apply(ds) -> ds``."""

    def apply(self, ds):  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class BatchStage(Stage):
    """Wrap any pa.Table -> pa.Table function (stateless tasks) or callable
    class (actor pool when ``concurrency`` is set)."""

    fn: Any
    batch_size: int | None = None
    concurrency: int | None = None
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        kw: dict[str, Any] = {"batch_format": "pyarrow"}
        if self.batch_size:
            kw["batch_size"] = self.batch_size
        if self.concurrency:
            kw["concurrency"] = self.concurrency
        if self.fn_kwargs:
            kw["fn_kwargs"] = self.fn_kwargs
        return ds.map_batches(self.fn, **kw)


@dataclass
class TokenSignalStage(Stage):
    """Apply a 1-D NumPy signal function to every row's token array --
    the ``FunctionTransformer`` / ``DatasetList.apply`` equivalent
    (/root/reference/caits/dataset/_dataset/_list.py:339-367).

    ``elementwise=True`` marks functions where f(concat(xs)) == concat(f(xs))
    (gain, polarity, quantize, ...): those run ONCE on the flattened values
    buffer -- fully vectorized, no per-row Python.  Order-dependent functions
    (filters, resample) run per row within the batch.
    """

    fn: Callable[[np.ndarray], np.ndarray]
    elementwise: bool = False
    out_col: str = "tokens"
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        fn, kwargs, elementwise, out_col = (
            self.fn, self.fn_kwargs, self.elementwise, self.out_col,
        )

        def run(batch: pa.Table) -> pa.Table:
            t = batch.combine_chunks()
            col = t["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = (offs - offs[0]).astype(np.int64)
            if elementwise:
                new_flat = np.asarray(fn(flat, **kwargs))
                new_offs = offs
            else:
                pieces = [
                    np.asarray(fn(flat[offs[i] : offs[i + 1]], **kwargs))
                    for i in range(t.num_rows)
                ]
                new_offs = np.zeros(t.num_rows + 1, dtype=np.int64)
                np.cumsum([len(p) for p in pieces], out=new_offs[1:])
                new_flat = (
                    np.concatenate(pieces) if pieces else np.zeros(0, np.float64)
                )
            vtype = pa.from_numpy_dtype(new_flat.dtype)
            arr = pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int64()).cast(pa.int32())
                if new_offs[-1] < 2**31
                else pa.array(new_offs, pa.int64()),
                pa.array(new_flat, vtype),
            )
            if out_col in t.schema.names:
                return t.set_column(t.schema.get_field_index(out_col), out_col, arr)
            return t.append_column(out_col, arr)

        return ds.map_batches(run, batch_format="pyarrow")


@dataclass
class WindowStage(Stage):
    """Sliding-window segmentation (the ``SlidingWindow`` transformer,
    /root/reference/caits/transformers/_sliding_window.py:6)."""

    window: int
    overlap: int = 0

    def apply(self, ds):
        from ..stages.windows import expand_windows

        w, o = self.window, self.overlap
        return ds.map_batches(
            lambda b: expand_windows(b, w, o), batch_format="pyarrow"
        )


@dataclass
class RollupStage(Stage):
    """Tier rollup (groupby-aggregate shuffle) producing the stats bundle."""

    width: int
    salt_mod: int = 0

    def apply(self, ds):
        from ..schema import Tier
        from ..stages.rollup import finalize, merged_partials

        return finalize(
            merged_partials(ds, Tier(f"w{self.width}", self.width), self.salt_mod)
        )


@dataclass
class GapfillStage(Stage):
    value_cols: list
    mode: str = "locf"
    grid_mode: str = "zero"

    def apply(self, ds):
        from ..stages.gapfill import gapfill

        return gapfill(ds, self.value_cols, self.mode, self.grid_mode)


@dataclass
class LabelEncodeStage(Stage):
    """Label encoding: distinct-agg on the driver, dict broadcast into the
    map (the ``LE`` transformer, /root/reference/caits/transformers/_encoder.py:5-24)."""

    col: str = "source"
    out_col: str = "label"

    def apply(self, ds):
        import ray

        classes = sorted(ds.unique(self.col))
        mapping_ref = ray.put({c: i for i, c in enumerate(classes)})
        col, out_col = self.col, self.out_col

        def encode(t: pa.Table) -> pa.Table:
            mapping = ray.get(mapping_ref)
            vals = [mapping[v] for v in t[col].to_pylist()]
            return t.append_column(out_col, pa.array(vals, pa.int32()))

        return ds.map_batches(encode, batch_format="pyarrow")


@dataclass
class FeatureExtractStage(Stage):
    """Scalar feature extraction: a list of ``(name, fn, params)`` applied to
    every row's token array, one output column per feature -- the
    ``FeatureExtractorScalar`` contract
    (/root/reference/caits/transformers/_feature_extractors/_scalar.py:8),
    where the reference loops funcs x instances in Python; here the instance
    loop is per-batch and each fn is a NumPy kernel."""

    features: list  # [(out_col, fn, kwargs)]
    keep_cols: tuple = ("doc_id", "source")

    def apply(self, ds):
        feats, keep = self.features, self.keep_cols

        def run(batch: pa.Table) -> pa.Table:
            t = batch.combine_chunks()
            col = t["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = (offs - offs[0]).astype(np.int64)
            out = {c: t[c] for c in keep if c in t.schema.names}
            for name, fn, kw in feats:
                vals = np.array(
                    [
                        fn(flat[offs[i] : offs[i + 1]], **kw)
                        for i in range(t.num_rows)
                    ],
                    dtype=np.float64,
                )
                out[name] = pa.array(vals, pa.float64())
            return pa.table(out)

        return ds.map_batches(run, batch_format="pyarrow")


@dataclass
class ColumnRouteStage(Stage):
    """Route a subset of columns through a transform and replace them (or
    append renamed outputs) -- the ``ColumnTransformer`` / ``replace``
    contract (/root/reference/caits/transformers/_column_transformer.py:8-83,
    /root/reference/caits/dataset/_dataset/_array.py:164-189).  Row order is
    preserved within the batch, so this is a pure per-batch projection (no
    shuffle)."""

    columns: list
    fn: Callable[[np.ndarray], np.ndarray]  # applied per column (vectorized)
    rename: dict | None = None  # in_col -> out_col; None = replace in place

    def apply(self, ds):
        cols, fn, rename = self.columns, self.fn, self.rename

        def run(batch: pa.Table) -> pa.Table:
            t = batch.combine_chunks()
            for c in cols:
                v = t[c].to_numpy(zero_copy_only=False)
                new = np.asarray(fn(v))
                out_name = (rename or {}).get(c, c)
                arr = pa.array(new)
                if out_name in t.schema.names:
                    t = t.set_column(t.schema.get_field_index(out_name), out_name, arr)
                else:
                    t = t.append_column(out_name, arr)
            return t

        return ds.map_batches(run, batch_format="pyarrow")


class SpectralFeatureStage(Stage):
    """Actor-pool spectral feature extraction with the mel filterbank / DCT
    basis computed ONCE per actor (the reference recomputes them per call --
    /root/reference/caits/fe/core_spectrum/_utils.py:160; SURVEY.md §2.5
    flags them as per-worker cacheable state)."""

    def __init__(self, sr: float = 16000, n_fft: int = 512, hop: int = 128,
                 n_mels: int = 40, n_mfcc: int = 13, concurrency: int = 2):
        self.kw = dict(sr=sr, n_fft=n_fft, hop=hop, n_mels=n_mels, n_mfcc=n_mfcc)
        self.concurrency = concurrency

    def apply(self, ds):
        kw = self.kw

        class MfccActor:
            def __init__(self):
                from ..functions.spectral import _dct_ii_ortho, mel_filter

                self.mel = mel_filter(kw["sr"], kw["n_fft"], kw["n_mels"])
                self.dct = _dct_ii_ortho(kw["n_mfcc"], kw["n_mels"])

            def __call__(self, batch: pa.Table) -> pa.Table:
                from ..functions.spectral import power_to_db, spectrogram

                t = batch.combine_chunks()
                col = t["tokens"]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
                offs = col.offsets.to_numpy(zero_copy_only=False)
                offs = (offs - offs[0]).astype(np.int64)
                rows = []
                for i in range(t.num_rows):
                    x = flat[offs[i] : offs[i + 1]]
                    if len(x) < kw["n_fft"]:
                        x = np.pad(x, (0, kw["n_fft"] - len(x)))
                    S = spectrogram(x, n_fft=kw["n_fft"], hop_length=kw["hop"])
                    C = self.dct @ power_to_db(self.mel @ S)
                    rows.append(C.mean(axis=1))
                m = np.stack(rows) if rows else np.zeros((0, kw["n_mfcc"]))
                out = {"doc_id": t["doc_id"]}
                for j in range(kw["n_mfcc"]):
                    out[f"mfcc_{j}"] = pa.array(m[:, j], pa.float64())
                return pa.table(out)

        return ds.map_batches(
            MfccActor, batch_format="pyarrow", batch_size=256,
            concurrency=self.concurrency,
        )


@dataclass
class Matrix2DStage(Stage):
    """``FunctionTransformer2D`` equivalent (/root/reference/caits/
    transformers/_function_transformers/_func_transformer_2d.py:8): apply a
    matrix-valued transform to each row's signal (e.g. a spectrogram) and
    store the result as a flattened list column plus (rows, cols) shape
    columns -- the Arrow-friendly 2-D layout."""

    fn: Callable[[np.ndarray], np.ndarray]
    out_col: str = "matrix"
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds):
        fn, kwargs, out_col = self.fn, self.fn_kwargs, self.out_col

        def run(batch: pa.Table) -> pa.Table:
            t = batch.combine_chunks()
            col = t["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = (offs - offs[0]).astype(np.int64)
            mats = [
                np.atleast_2d(np.asarray(fn(flat[offs[i] : offs[i + 1]], **kwargs)))
                for i in range(t.num_rows)
            ]
            new_offs = np.zeros(t.num_rows + 1, dtype=np.int64)
            np.cumsum([m.size for m in mats], out=new_offs[1:])
            values = (
                np.concatenate([m.reshape(-1) for m in mats])
                if mats
                else np.zeros(0, np.float64)
            )
            arr = pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int64()).cast(pa.int32()),
                pa.array(values, pa.float64()),
            )
            return (
                t.append_column(out_col, arr)
                .append_column(
                    out_col + "_rows",
                    pa.array([m.shape[0] for m in mats], pa.int64()),
                )
                .append_column(
                    out_col + "_cols",
                    pa.array([m.shape[1] for m in mats], pa.int64()),
                )
            )

        return ds.map_batches(run, batch_format="pyarrow")


@dataclass
class SignalFeatureStage(Stage):
    """``FeatureExtractorSignal`` equivalent (/root/reference/caits/
    transformers/_feature_extractors/_signal.py:8): apply a list of
    signal-valued extractors (``{"func": fn, "params": {...}}``, each 1-D ->
    1-D, e.g. rolling_rms) per row; each extractor lands in a list column
    named after the function."""

    feature_extractors: list[dict]

    def apply(self, ds):
        extractors = self.feature_extractors

        def run(batch: pa.Table) -> pa.Table:
            t = batch.combine_chunks()
            col = t["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = (offs - offs[0]).astype(np.int64)
            out = t
            for ex in extractors:
                fn, params = ex["func"], ex.get("params", {})
                pieces = [
                    np.asarray(fn(flat[offs[i] : offs[i + 1]], **params), dtype=np.float64)
                    for i in range(t.num_rows)
                ]
                new_offs = np.zeros(t.num_rows + 1, dtype=np.int64)
                np.cumsum([len(p) for p in pieces], out=new_offs[1:])
                values = (
                    np.concatenate(pieces) if pieces else np.zeros(0, np.float64)
                )
                arr = pa.ListArray.from_arrays(
                    pa.array(new_offs, pa.int64()).cast(pa.int32()),
                    pa.array(values, pa.float64()),
                )
                out = out.append_column(fn.__name__, arr)
            return out

        return ds.map_batches(run, batch_format="pyarrow")


@dataclass
class StandardScalerStage(Stage):
    """Fitted transformer: global mean/std of the token values learned in ONE
    streaming aggregate pass (per-batch partial sums -> driver-side tiny
    combine -> ray.put broadcast), then applied vectorized per batch -- the
    fit-as-aggregate + broadcast pattern the reference reaches through
    ``SklearnWrapper(StandardScaler)`` (/root/reference/caits/transformers/
    _sklearn_wrapper.py:11).  Driver state is 3 floats."""

    ddof: int = 0

    def apply(self, ds):
        import ray

        def partial(t: pa.Table) -> pa.Table:
            col = t["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {
                    "n": pa.array([len(v)], pa.int64()),
                    "s": pa.array([v.sum()], pa.float64()),
                    "ss": pa.array([(v * v).sum()], pa.float64()),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow").sum(["n", "s", "ss"])
        n, s, ss = agg["sum(n)"], agg["sum(s)"], agg["sum(ss)"]
        mean = s / n
        var = ss / n - mean * mean
        if self.ddof:
            var *= n / (n - self.ddof)
        std = float(np.sqrt(max(var, 0.0)))
        params_ref = ray.put((float(mean), std if std > 0 else 1.0))

        def scale(t: pa.Table) -> pa.Table:
            m, sd = ray.get(params_ref)
            tt = t.combine_chunks()
            col = tt["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            arr = pa.ListArray.from_arrays(col.offsets, pa.array((v - m) / sd, pa.float64()))
            return tt.set_column(tt.schema.get_field_index("tokens"), "tokens", arr)

        return ds.map_batches(scale, batch_format="pyarrow")


@dataclass
class AugmentSignalStage(Stage):
    """Apply a list of augmentations (each ``{"func": callable, "params":
    dict}``) to every row's token signal, ``repeats`` times, and UNION the
    augmented copies with the originals -- the reference ``AugmentSignal``
    transformer semantic (/root/reference/caits/transformers/
    _augment_signal.py:16): each repeat composes ALL augmentation functions
    over the ORIGINAL signal, and the output keeps originals first.

    Ray shape: one map_batches; each task emits (repeats + 1) x batch rows
    (original rows tagged ``aug_id = 0``, repeat r tagged r) -- no dataset
    union, no second read of the input.  Per-repeat determinism with random
    augmentations comes from the functions' explicit seeds; pass a different
    ``seed`` param per repeat via ``params_per_repeat`` if desired."""

    augmentations: list[dict]
    repeats: int = 1
    params_per_repeat: list[dict] | None = None

    def apply(self, ds):
        augs, repeats, ppr = self.augmentations, self.repeats, self.params_per_repeat

        def run(batch: pa.Table) -> pa.Table:
            t = batch.combine_chunks()
            col = t["tokens"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = (offs - offs[0]).astype(np.int64)
            out_tables = [
                t.append_column(
                    "aug_id", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
                )
            ]
            for r in range(1, repeats + 1):
                pieces = []
                for i in range(t.num_rows):
                    x = flat[offs[i] : offs[i + 1]]
                    for a in augs:
                        params = dict(a.get("params", {}))
                        if ppr is not None:
                            params.update(ppr[r - 1])
                        x = np.asarray(a["func"](x, **params), dtype=np.float64)
                    pieces.append(x)
                new_offs = np.zeros(t.num_rows + 1, dtype=np.int64)
                np.cumsum([len(p) for p in pieces], out=new_offs[1:])
                new_flat = (
                    np.concatenate(pieces) if pieces else np.zeros(0, np.float64)
                )
                arr = pa.ListArray.from_arrays(
                    pa.array(new_offs, pa.int64()).cast(pa.int32()),
                    pa.array(new_flat, pa.float64()),
                )
                aug_t = t.set_column(
                    t.schema.get_field_index("tokens"), "tokens", arr
                ).append_column(
                    "aug_id", pa.array(np.full(t.num_rows, r, np.int64), pa.int64())
                )
                out_tables.append(aug_t)
            # originals keep int tokens; augmented are float -- unify to float
            unified = []
            for tab in out_tables:
                c = tab["tokens"]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                if c.type != pa.list_(pa.float64()):
                    c = c.cast(pa.list_(pa.float64()))
                unified.append(
                    tab.set_column(tab.schema.get_field_index("tokens"), "tokens", c)
                )
            return pa.concat_tables(unified)

        return ds.map_batches(run, batch_format="pyarrow")


class EnginePipeline:
    """Ordered named stages compiled onto a Dataset -- the sklearn-Pipeline
    shape (list of (name, stage)) without fit state; fitted stages are
    aggregate-pass + broadcast by construction."""

    def __init__(self, steps: list[tuple[str, Stage]]):
        names = [n for n, _ in steps]
        if len(set(names)) != len(names):
            raise ValueError("duplicate stage names")
        self.steps = steps

    def transform(self, ds):
        for _, stage in self.steps:
            ds = stage.apply(ds)
        return ds

    def __repr__(self):
        return "EnginePipeline(" + " -> ".join(n for n, _ in self.steps) + ")"


# ---------------------------------------------------------------------------
# declarative pipelines: YAML/dict config -> EnginePipeline
# ---------------------------------------------------------------------------

# stage-type registry for config-driven construction; params map 1:1 onto
# the dataclass fields above
STAGE_TYPES = {
    "window": WindowStage,
    "rollup": RollupStage,
    "gapfill": GapfillStage,
    "label_encode": LabelEncodeStage,
    "standard_scaler": StandardScalerStage,
    "token_signal": TokenSignalStage,
    "feature_extract": FeatureExtractStage,
    "augment": AugmentSignalStage,
}


def _function_registry() -> dict:
    """Whitelisted kernel names resolvable from config files — an explicit
    allowlist, never getattr on arbitrary module paths (a config is data,
    not code)."""
    from ..functions import preprocess, properties, stats

    names = {}
    for mod in (stats, preprocess, properties):
        for n in dir(mod):
            if n.startswith("_"):
                continue
            fn = getattr(mod, n)
            if callable(fn):
                names[n] = fn
    return names


def pipeline_from_config(cfg: dict) -> EnginePipeline:
    """Build an ``EnginePipeline`` from a config dict (typically loaded by
    ``sources.loaders.load_yaml_config`` — the reference drives its
    experiments from the same YAML shape,
    /root/reference/caits/loading/_utils.py:10):

        pipeline:
          - {name: win,    type: window, params: {window: 16, overlap: 8}}
          - {name: rollup, type: rollup, params: {width: 16}}

    Function-valued params (``token_signal.fn``, ``feature_extract``
    feature entries ``[out_col, fn_name, kwargs]``) are resolved from the
    kernel whitelist; unknown stage types or function names raise with the
    available options listed."""
    steps_cfg = cfg.get("pipeline")
    if not isinstance(steps_cfg, list) or not steps_cfg:
        raise ValueError("config needs a non-empty 'pipeline' list")
    funcs = _function_registry()

    def resolve_fn(name: str):
        if name not in funcs:
            raise ValueError(
                f"unknown kernel {name!r}; available: "
                + ", ".join(sorted(funcs))
            )
        return funcs[name]

    steps = []
    for i, sc in enumerate(steps_cfg):
        st_type = sc.get("type")
        if st_type not in STAGE_TYPES:
            raise ValueError(
                f"unknown stage type {st_type!r}; available: "
                + ", ".join(sorted(STAGE_TYPES))
            )
        name = sc.get("name", f"stage_{i}")
        params = dict(sc.get("params", {}))
        if st_type == "token_signal":
            params["fn"] = resolve_fn(params["fn"])
        elif st_type == "feature_extract":
            params["features"] = [
                (out_col, resolve_fn(fn_name), dict(kw or {}))
                for out_col, fn_name, kw in (
                    (f[0], f[1], f[2] if len(f) > 2 else {})
                    for f in params["features"]
                )
            ]
            if "keep_cols" in params:
                params["keep_cols"] = tuple(params["keep_cols"])
        elif st_type == "augment":
            from ..functions import augment as _aug

            def resolve_aug(n: str):
                fn = getattr(_aug, n, None)
                if fn is None or n.startswith("_"):
                    raise ValueError(f"unknown augmentation {n!r}")
                return fn

            params["augmentations"] = [
                {"func": resolve_aug(a["func"]),
                 "params": dict(a.get("params", {}))}
                for a in params["augmentations"]
            ]
        elif st_type == "gapfill" and "value_cols" in params:
            params["value_cols"] = list(params["value_cols"])
        steps.append((name, STAGE_TYPES[st_type](**params)))
    return EnginePipeline(steps)


def pipeline_from_yaml(path: str) -> EnginePipeline:
    """``pipeline_from_config`` over a YAML file on disk."""
    from ..sources.loaders import load_yaml_config

    return pipeline_from_config(load_yaml_config(path))
