"""``ray job submit`` entrypoint for the checkpointed rollup job.

    ray job submit --working-dir . -- \
        python -m crossai_ts_ray.job --input /data/tokens --out /data/rollups \
            --tiers 60,3600,86400 [--salt 8] [--no-aligned] [--compress]

Resumable: re-submitting after a kill skips every partition with a committed
lineage row (state/checkpoint.py).  Prints one JSON line with the JobReport.
On a cluster the driver connects via RAY_ADDRESS; standalone it starts a
local session (guarded -- the module never re-inits an existing session).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="token table root (shard=* dirs)")
    ap.add_argument("--out", required=True, help="output root (tiers + _lineage)")
    ap.add_argument("--tiers", default="60,3600,86400", help="comma-separated bucket widths")
    ap.add_argument("--salt", type=int, default=0, help="salt modulus for the generic path")
    ap.add_argument("--no-aligned", action="store_true", help="force the generic shuffle path")
    ap.add_argument("--compress", action="store_true", help="also write Gorilla/DoD segments")
    ap.add_argument("--shards-per-commit", type=int, default=1)
    ap.add_argument("--fail-after", type=int, default=None, help="kill simulation (tests)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .schema import Tier
    from .state.checkpoint import run_rollup_job

    widths = [int(w) for w in args.tiers.split(",")]
    tiers = tuple(Tier(f"w{w}", w) for w in widths)
    t0 = time.perf_counter()
    rep = run_rollup_job(
        args.input,
        args.out,
        tiers,
        salt_mod=args.salt,
        aligned=not args.no_aligned,
        compress_finest=args.compress,
        shards_per_commit=args.shards_per_commit,
        fail_after=args.fail_after,
    )
    print(
        json.dumps(
            {
                "computed": rep.computed,
                "skipped": rep.skipped,
                "rows_per_tier": rep.rows_per_tier,
                "wall_s": round(time.perf_counter() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
