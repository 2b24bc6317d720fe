"""Per-stage execution profile for any exported query: run it, then parse
``Dataset.stats()`` into a compact stage table (wall time, rows out, tasks,
peak memory) so "where does the time go" is measured, not guessed.

    python tools/explain.py <query_name> [sf_dir] [--cpus N]

Prints one human table plus one JSON line (machine-recordable).  Queries
returning pandas/Arrow (driver-reduced results) have no Dataset plan; the
tool reports wall time only and says so.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def parse_stats(stats: str) -> list[dict]:
    """Extract per-operator summaries from Dataset.stats() text.  The format
    is versioned by Ray; this parses the 2.4x layout (``Operator N <name>:
    ... blocks executed in Ns``, then per-metric lines) and degrades to an
    empty list on anything unrecognized rather than failing the run."""
    ops: list[dict] = []
    cur: dict | None = None
    for line in stats.splitlines():
        m = re.match(
            r"Operator (\d+) (.+?): (\d+) tasks executed, "
            r"\d+ blocks produced in ([0-9.]+)s", line
        )
        if m:
            cur = {
                "op": m.group(2).strip(),
                "tasks": int(m.group(3)),
                "wall_s": float(m.group(4)),
            }
            ops.append(cur)
            continue
        # all-to-all operators print without a task count
        m = re.match(r"Operator (\d+) (.+?): .*? in ([0-9.]+)s", line)
        if m:
            cur = {"op": m.group(2).strip(), "wall_s": float(m.group(3))}
            ops.append(cur)
            continue
        if cur is None:
            continue
        m = re.search(r"Output num rows per block: .*?(\d+) total", line)
        if m:
            cur["rows_out"] = int(m.group(1))
        m = re.search(r"Output size bytes per block: .*?(\d+) total", line)
        if m:
            cur["bytes_out"] = int(m.group(1))
        m = re.search(
            r"Peak heap memory usage \(MiB\): [0-9.]+ min, ([0-9.]+) max",
            line,
        )
        if m:
            cur["peak_heap_mib"] = int(float(m.group(1)))
        m = re.search(r"Remote wall time: .*?([0-9.]+)(m?s) total", line)
        if m:
            cur["task_wall_total_s"] = round(
                float(m.group(1)) / (1000.0 if m.group(2) == "ms" else 1.0),
                3,
            )
    return ops


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    cpus = 8
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            cpus = int(a.split("=", 1)[1]) if "=" in a else int(
                sys.argv[sys.argv.index(a) + 1]
            )

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __ray_entry__ as E

    q = E.queries()
    if name not in q:
        sys.exit(f"unknown query {name!r}; known: {sorted(q)[:10]}...")

    t0 = time.perf_counter()
    res = q[name](sf_dir)
    stages: list[dict] = []
    if hasattr(res, "materialize"):  # ray.data.Dataset
        res = res.materialize()
        rows = res.count()
        stages = parse_stats(res.stats())
    else:
        rows = len(res)
    wall = time.perf_counter() - t0

    print(f"query={name} sf_dir={sf_dir} cpus={cpus} "
          f"wall={wall:.3f}s rows={rows}")
    if stages:
        total = sum(s["wall_s"] for s in stages) or 1.0
        print(f"{'stage':<72}{'wall_s':>8}{'%':>6}{'rows_out':>12}"
              f"{'peak_MiB':>9}")
        for s in stages:
            print(f"{s['op'][:71]:<72}{s['wall_s']:>8.2f}"
                  f"{100 * s['wall_s'] / total:>5.0f}%"
                  f"{s.get('rows_out', -1):>12}"
                  f"{s.get('peak_heap_mib', -1):>9}")
    else:
        print("(driver-reduced result -- no Dataset plan to profile)")
    print(json.dumps({"query": name, "sf_dir": sf_dir, "cpus": cpus,
                      "wall_s": round(wall, 3), "rows": rows,
                      "stages": stages}))
    ray.shutdown()


if __name__ == "__main__":
    main()
