"""`ray job submit` entrypoint for the checkpointed tier-cascade rollup.

On a cluster:

    ray job submit --working-dir . -- python jobs/run_rollup.py \
        --token-dir /data/tokens --out-dir /data/rollups \
        --tiers 1m:60,1h:3600,1d:86400 --shards-per-commit 4

Locally (standalone) the same command works without the driver: the script
initialises a local Ray session only if `ray job submit` / the test harness
has not already provided one.  Re-running with the same --out-dir RESUMES:
partitions that committed are skipped via their lineage rows, so a killed
job never recomputes finished work.  Prints the JobReport as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running as `python jobs/run_rollup.py` puts jobs/ (not the repo root) on
# sys.path; `ray job submit --working-dir .` ships the root the same way
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_tiers(spec: str):
    from crossai_ts_ray.schema import Tier

    tiers = []
    for part in spec.split(","):
        name, width = part.split(":")
        tiers.append(Tier(name, int(width)))
    return tuple(tiers)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--token-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--tiers", default="1m:60,1h:3600,1d:86400",
                   help="comma list of name:width_buckets")
    p.add_argument("--salt-mod", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=65536)
    p.add_argument("--shards-per-commit", type=int, default=4)
    p.add_argument("--max-concurrent", type=int, default=None)
    p.add_argument("--late-policy", default="recompute",
                   choices=("recompute", "drop"))
    p.add_argument("--allowed-lateness", type=int, default=0)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only used when this script owns the Ray session")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():  # under `ray job submit` the driver inits
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)

    from crossai_ts_ray.state.checkpoint import run_rollup_job

    rep = run_rollup_job(
        args.token_dir,
        args.out_dir,
        parse_tiers(args.tiers),
        salt_mod=args.salt_mod,
        batch_size=args.batch_size,
        shards_per_commit=args.shards_per_commit,
        max_concurrent=args.max_concurrent,
        late_policy=args.late_policy,
        allowed_lateness=args.allowed_lateness,
    )
    print(json.dumps({
        "partitions_computed": len(rep.computed),
        "partitions_skipped": len(rep.skipped),
        "partitions_recomputed": len(rep.recomputed),
        "rows_per_tier": rep.rows_per_tier,
        "out_dir": args.out_dir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
