"""Pipeline API, multimodal plumbing, and corpus loaders."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray.util import dataset_to_table


def test_engine_pipeline_compose(ray_session):
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.pipelines.api import (
        EnginePipeline,
        LabelEncodeStage,
        RollupStage,
        TokenSignalStage,
    )

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    ds = rd.read_parquet(d)
    pipe = EnginePipeline(
        [
            ("gain", TokenSignalStage(lambda v: v * 2, elementwise=True)),
            ("label", LabelEncodeStage("source")),
        ]
    )
    out = dataset_to_table(pipe.transform(ds))
    assert "label" in out.schema.names
    orig = dataset_to_table(ds.limit(5)).to_pylist()
    got = {r["doc_id"]: r for r in out.to_pylist()}
    for r in orig:
        assert got[r["doc_id"]]["tokens"] == [v * 2 for v in r["tokens"]]
    # label encoding is the sorted-distinct mapping
    srcs = sorted({r["source"] for r in out.to_pylist()})
    for r in out.to_pylist()[:50]:
        assert r["label"] == srcs.index(r["source"])


def test_pipeline_rollup_stage_matches_direct(ray_session):
    import ray.data as rd

    from crossai_ts_ray import oracle, synth
    from crossai_ts_ray.pipelines.api import EnginePipeline, RollupStage
    from crossai_ts_ray.schema import Tier

    from .conftest import assert_tables_bitwise_equal

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    pipe = EnginePipeline([("rollup", RollupStage(width=60))])
    got = dataset_to_table(pipe.transform(rd.read_parquet(d)))
    gold = oracle.rollup(synth.read_all(d), Tier("w60", 60))
    assert_tables_bitwise_equal(gold, got, "pipeline-rollup")


def test_per_row_token_function_stage(ray_session):
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.functions.preprocess import fix_length
    from crossai_ts_ray.pipelines.api import EnginePipeline, TokenSignalStage

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    pipe = EnginePipeline(
        [("fix", TokenSignalStage(lambda v: fix_length(v, 32), elementwise=False))]
    )
    out = dataset_to_table(pipe.transform(rd.read_parquet(d).limit(64)))
    toks = out["tokens"].combine_chunks()
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    assert (lens == 32).all()


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from crossai_ts_ray.pipelines.multimodal import (
        ImageDecodeResize,
        media_pipeline,
        synth_media_table,
    )

    t = synth_media_table(60)
    ds = rd.from_arrow(t)
    img, aud, vid = media_pipeline(ds, out_size=8)
    it = dataset_to_table(img)
    at = dataset_to_table(aud)
    vt = dataset_to_table(vid)
    assert it.num_rows == 20 and at.num_rows == 20 and vt.num_rows == 20
    px = it["pixels"].combine_chunks()
    assert (np.diff(px.offsets.to_numpy(zero_copy_only=False)) == 64).all()
    # deterministic fake decode: same input -> same features
    it2 = dataset_to_table(media_pipeline(ds, out_size=8)[0])
    a = it.sort_by("media_id")
    b = it2.sort_by("media_id")
    assert a.equals(b)
    # real decode now parses PNG/BMP/PNM for real (tests/test_imagecodec.py);
    # the synthetic random payloads here are not a recognized format, and
    # the failure is a loud ValueError, never a silent wrong decode
    stage = ImageDecodeResize(decode="real")
    with pytest.raises(ValueError, match="unrecognized image payload"):
        stage(t.slice(0, 3))


def test_csv_corpus_loader(ray_session, tmp_path):
    import pandas as pd

    from crossai_ts_ray.sources.loaders import load_csv_corpus, load_dir

    for label in ("walk", "run"):
        os.makedirs(tmp_path / label, exist_ok=True)
        for i in range(2):
            pd.DataFrame({"ch_1": np.arange(5) + i, "ch_2": np.arange(5) * 2}).to_csv(
                tmp_path / label / f"rec{i}.csv", index=False
            )
    ds = load_csv_corpus(str(tmp_path))
    t = dataset_to_table(ds)
    assert t.num_rows == 20
    assert set(t["source"].to_pylist()) == {"walk", "run"}
    assert {"ch_1", "ch_2", "source"} <= set(t.schema.names)
    # dispatch picks csv
    t2 = dataset_to_table(load_dir(str(tmp_path)))
    assert t2.num_rows == 20


def test_window_and_gapfill_stages(ray_session):
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.pipelines.api import (
        EnginePipeline,
        GapfillStage,
        RollupStage,
        WindowStage,
    )

    d = synth.generate(
        synth.TINY_GAPPED, synth.default_cache_dir(synth.TINY_GAPPED)
    )
    # windows
    w = EnginePipeline([("win", WindowStage(window=16, overlap=8))])
    wt = dataset_to_table(w.transform(rd.read_parquet(d).limit(50)))
    assert {"doc_id", "win_id", "wtokens"} <= set(wt.schema.names)
    # rollup -> gapfill chain
    p = EnginePipeline(
        [
            ("rollup", RollupStage(width=60)),
            ("fill", GapfillStage(["mean", "p50"], mode="locf")),
        ]
    )
    out = dataset_to_table(p.transform(rd.read_parquet(d)))
    assert out["filled"].to_numpy(zero_copy_only=False).any()


def test_spectral_feature_stage(ray_session):
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.pipelines.api import EnginePipeline, SpectralFeatureStage

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    pipe = EnginePipeline([("mfcc", SpectralFeatureStage(n_mfcc=5))])
    out = dataset_to_table(pipe.transform(rd.read_parquet(d).limit(32)))
    assert out.num_rows == 32
    assert {"mfcc_0", "mfcc_4"} <= set(out.schema.names)
    vals = out["mfcc_0"].to_numpy(zero_copy_only=False)
    assert np.isfinite(vals).all()


def test_feature_extract_stage(ray_session):
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.functions import stats
    from crossai_ts_ray.pipelines.api import EnginePipeline, FeatureExtractStage

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    pipe = EnginePipeline(
        [
            (
                "features",
                FeatureExtractStage(
                    [
                        ("rms", stats.rms_value, {}),
                        ("zcr", stats.zcr_value, {}),
                        ("energy", stats.energy, {}),
                    ]
                ),
            )
        ]
    )
    out = dataset_to_table(pipe.transform(rd.read_parquet(d).limit(40)))
    assert {"doc_id", "source", "rms", "zcr", "energy"} <= set(out.schema.names)
    # cross-check one row against the kernel directly -- pick a doc_id that
    # is actually IN the limited output (limit(40) takes whichever blocks
    # finish first, so a separate limit(1) read may land on a different row)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    row = next(
        r
        for r in dataset_to_table(rd.read_parquet(d)).to_pylist()
        if r["doc_id"] in rows
    )
    got = rows[row["doc_id"]]
    x = np.array(row["tokens"], dtype=np.float64)
    from crossai_ts_ray.functions.stats import rms_value

    assert got["rms"] == float(rms_value(x))


def test_column_route_stage(ray_session):
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.pipelines.api import ColumnRouteStage, EnginePipeline

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    pipe = EnginePipeline(
        [
            ("scale", ColumnRouteStage(["n_tok"], lambda v: v * 10, rename={"n_tok": "n_tok_x10"})),
            ("replace", ColumnRouteStage(["seq"], lambda v: v + 1)),
        ]
    )
    out = dataset_to_table(pipe.transform(rd.read_parquet(d).limit(20)))
    rows = out.to_pylist()
    for r in rows:
        assert r["n_tok_x10"] == r["n_tok"] * 10
    orig = {x["doc_id"]: x for x in dataset_to_table(rd.read_parquet(d).limit(20)).to_pylist()}
    for r in rows:
        if r["doc_id"] in orig:
            assert r["seq"] == orig[r["doc_id"]]["seq"] + 1


def test_loaders_accept_non_local_filesystem(ray_session, tmp_path):
    """The S3-loader claim, exercised against a mocked non-local filesystem:
    an fsspec DirFileSystem (picklable, visible from Ray read tasks) stands
    in for S3 -- proving load_csv_corpus and read_token_table route listing
    AND reads through the passed filesystem, never os-specific code."""
    import fsspec
    import pyarrow.parquet as pq

    from crossai_ts_ray.sources.loaders import load_csv_corpus
    from crossai_ts_ray.sources.readers import read_token_table

    # corpus layout under the mocked root
    os.makedirs(tmp_path / "corpus" / "labelA")
    os.makedirs(tmp_path / "corpus" / "labelB")
    (tmp_path / "corpus" / "labelA" / "a.csv").write_text("x,y\n1,2\n3,4\n")
    (tmp_path / "corpus" / "labelB" / "b.csv").write_text("x,y\n5,6\n")
    fs = fsspec.filesystem("dir", path=str(tmp_path))

    ds = load_csv_corpus("corpus", filesystem=fs)
    t = dataset_to_table(ds)
    assert t.num_rows == 3
    assert sorted(set(t["source"].to_pylist())) == ["labelA", "labelB"]

    # token table through the same seam
    tok = pa.table(
        {
            "doc_id": pa.array(["d0", "d1"], pa.string()),
            "tokens": pa.array([[1, 2], [3]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1], pa.int32()),
            "source": pa.array(["s0", "s0"], pa.string()),
            "seq": pa.array([0, 1], pa.int64()),
        }
    )
    os.makedirs(tmp_path / "tokens")
    pq.write_table(tok, tmp_path / "tokens" / "part-0.parquet")
    got = dataset_to_table(read_token_table("tokens", filesystem=fs))
    assert got.num_rows == 2
    assert got.column_names == ["doc_id", "tokens", "n_tok", "source", "seq"]


def test_loaders_reject_missing_uri_scheme_gracefully():
    """URI roots resolve through pyarrow FileSystem.from_uri; a bogus scheme
    raises at resolution time, not deep inside a read task."""
    from crossai_ts_ray.sources.loaders import resolve_filesystem

    with pytest.raises(Exception):
        resolve_filesystem("notascheme://bucket/x")
