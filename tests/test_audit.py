"""Cross-tier consistency audit: a clean store verifies, injected
corruption is flagged field-precisely, retention-aged buckets are
skipped rather than misreported."""

from __future__ import annotations

import glob
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from crossai_ts_ray import synth  # noqa: E402
from crossai_ts_ray.schema import Tier  # noqa: E402

TIERS = (Tier("t60", 60), Tier("t240", 240))


@pytest.fixture()
def store(ray_session, tmp_path):
    from crossai_ts_ray.state.checkpoint import run_rollup_job

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "job")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    return out


class TestAudit:
    def test_clean_store_verifies(self, store):
        from crossai_ts_ray.state.audit import verify_tier_consistency

        rep = verify_tier_consistency(store, TIERS[0], TIERS[1])
        assert rep["checked"] > 0
        assert rep["mismatches"] == []

    def test_corruption_is_flagged(self, store):
        from crossai_ts_ray.state.audit import verify_tier_consistency

        f = sorted(glob.glob(f"{store}/tier=t240/part=*/*.parquet"))[0]
        t = pq.read_table(f)
        s = t["sum"].to_pylist()
        s[0] += 7  # silent corruption in one coarse row
        t = t.set_column(
            t.schema.get_field_index("sum"), "sum",
            pa.array(s, t.schema.field("sum").type),
        )
        pq.write_table(t, f)
        rep = verify_tier_consistency(store, TIERS[0], TIERS[1])
        assert len(rep["mismatches"]) == 1
        m = rep["mismatches"][0]
        assert m["field"] == "sum"
        assert m["stored"] == m["recombined"] + 7

    def test_aged_fine_buckets_skip_not_flag(self, store):
        from crossai_ts_ray.state.audit import verify_tier_consistency
        from crossai_ts_ray.state.retention import apply_retention

        base = verify_tier_consistency(store, TIERS[0], TIERS[1])
        apply_retention(store, {"t60": 3})
        rep = verify_tier_consistency(store, TIERS[0], TIERS[1])
        assert rep["mismatches"] == []
        assert rep["checked"] < base["checked"]
        assert rep["skipped_aged"] > 0

    def test_misaligned_tiers_raise(self, store):
        from crossai_ts_ray.state.audit import verify_tier_consistency

        with pytest.raises(ValueError):
            verify_tier_consistency(store, Tier("a", 60), Tier("b", 90))
