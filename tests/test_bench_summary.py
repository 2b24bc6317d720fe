"""bench.py's compact summary line: always parseable, bounded in size,
and faithful to the full record (BENCH_r04.json's `parsed: null` came
from the full line outgrowing the driver's tail capture)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _fake_full(n_sections: int) -> dict:
    qs = {f"family{i % 12}_section{i}": 0.1 + i * 0.01
          for i in range(n_sections)}
    qs["q1_pricing_summary"] = 0.4
    return {
        "metric": "rollup+query wall time",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": "/root/testdata/sf0.1",
        "num_cpus": 32,
        "extra": {"points_per_sec": 1.0, "tokens_per_sec": 2.0,
                  "rows_per_sec": 3.0, "codec_ratio": 2.2,
                  "input_rows": 600000,
                  "giant_sidecar": "x" * 5000},
    }


def test_compact_summary_bounded_and_parseable():
    full = _fake_full(150)
    line = json.dumps(bench._compact_summary(full))
    assert len(line) < 2000, len(line)  # driver tail-capture bound
    back = json.loads(line)
    assert back["value"] == full["value"]
    assert back["num_cpus"] == 32
    assert back["extra"]["sections"] == 151
    assert "giant_sidecar" not in json.dumps(back["extra"])
    # q-numbered sections fold into one tpch family
    assert "tpch" in back["queries"]
    # family subtotals cover the full total (within rounding)
    assert abs(sum(back["queries"].values()) - full["value"]) < 1.0


def test_compact_summary_empty_queries():
    full = {"metric": "m", "value": 0.0, "unit": "sec", "queries": {},
            "sf": "x", "num_cpus": 8, "extra": {}}
    back = json.loads(json.dumps(bench._compact_summary(full)))
    assert back["queries"] == {} and back["extra"]["sections"] == 0
