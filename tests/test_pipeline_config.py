"""Declarative YAML/dict pipeline construction: config-built pipelines are
bitwise-identical to hand-built ones, function names resolve from the
whitelist only, and errors are loud."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

YAML_TEXT = """
pipeline:
  - name: norm
    type: token_signal
    params: {fn: normalize_signal}
  - name: tier
    type: rollup
    params: {width: 16}
"""


def _token_ds(sf_dir):
    from crossai_ts_ray.sources.readers import tokens_from_documents

    return tokens_from_documents(sf_dir)


@pytest.fixture()
def token_ds(ray_session):
    return _token_ds(SF)


class TestPipelineConfig:
    def test_yaml_matches_hand_built(self, ray_session, tmp_path, token_ds):
        from crossai_ts_ray.functions.preprocess import normalize_signal
        from crossai_ts_ray.pipelines.api import (
            EnginePipeline,
            RollupStage,
            TokenSignalStage,
            pipeline_from_yaml,
        )

        p = tmp_path / "p.yaml"
        p.write_text(YAML_TEXT)
        from_cfg = pipeline_from_yaml(str(p))
        hand = EnginePipeline(
            [("norm", TokenSignalStage(fn=normalize_signal)),
             ("tier", RollupStage(width=16))]
        )
        a = pd.DataFrame(from_cfg.transform(token_ds).take_all())
        b = pd.DataFrame(hand.transform(_token_ds(SF)).take_all())
        key = [c for c in ("source", "bucket") if c in a.columns]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_function_resolution_and_whitelist(self, ray_session):
        from crossai_ts_ray.pipelines.api import pipeline_from_config

        cfg = {
            "pipeline": [
                {"name": "norm", "type": "token_signal",
                 "params": {"fn": "normalize_signal"}},
                {"name": "feats", "type": "feature_extract",
                 "params": {"features": [["rms", "rms_value", {}],
                                         ["zc", "zcr_value"]]}},
            ]
        }
        pl = pipeline_from_config(cfg)
        assert [n for n, _ in pl.steps] == ["norm", "feats"]
        with pytest.raises(ValueError) as ei:
            pipeline_from_config(
                {"pipeline": [{"type": "token_signal",
                               "params": {"fn": "os.system"}}]}
            )
        assert "unknown kernel" in str(ei.value)

    def test_unknown_stage_type_raises(self, ray_session):
        from crossai_ts_ray.pipelines.api import pipeline_from_config

        with pytest.raises(ValueError) as ei:
            pipeline_from_config({"pipeline": [{"type": "nope"}]})
        assert "unknown stage type" in str(ei.value)
        with pytest.raises(ValueError):
            pipeline_from_config({"pipeline": []})

    def test_feature_pipeline_runs(self, ray_session, token_ds):
        from crossai_ts_ray.pipelines.api import pipeline_from_config

        cfg = {
            "pipeline": [
                {"name": "feats", "type": "feature_extract",
                 "params": {"features": [["rms", "rms_value", {}],
                                         ["mu", "mean_value", {}]]}},
            ]
        }
        df = pd.DataFrame(
            pipeline_from_config(cfg).transform(token_ds).take_all()
        )
        assert {"rms", "mu"} <= set(df.columns)
        assert len(df) > 0
