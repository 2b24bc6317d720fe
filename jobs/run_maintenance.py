"""`ray job submit` entrypoint for store maintenance over a committed
rollup output: small-file compaction and/or retention pruning.

    ray job submit --working-dir . -- python jobs/run_maintenance.py \
        --out-dir /data/rollups --compact-tier 1m --target-mb 128 \
        --retention 1m:1440,1h:720

Both operations are crash-safe and idempotent (manifest two-phase commit /
policy markers), so re-submitting a killed maintenance job is always safe.
Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--compact-tier", action="append", default=[],
                   help="tier name to compact (repeatable)")
    p.add_argument("--target-mb", type=int, default=128)
    p.add_argument("--min-files", type=int, default=2)
    p.add_argument("--retention", default="",
                   help="comma list of tier:keep_last_buckets")
    p.add_argument("--audit", default="",
                   help="cross-tier consistency audit, comma list of "
                        "fine_name:fine_width:coarse_name:coarse_width "
                        "pairs; nonzero exit on any mismatch")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)

    from crossai_ts_ray.state.compact import compact_partitions
    from crossai_ts_ray.state.retention import apply_retention

    out: dict = {"out_dir": args.out_dir, "compaction": {}, "retention": {}}
    for tier in args.compact_tier:
        out["compaction"][tier] = compact_partitions(
            args.out_dir, tier, target_bytes=args.target_mb << 20,
            min_files=args.min_files,
        )
    if args.retention:
        policies = {}
        for part in args.retention.split(","):
            name, keep = part.split(":")
            policies[name] = int(keep)
        out["retention"] = apply_retention(args.out_dir, policies)
    bad = 0
    if args.audit:
        from crossai_ts_ray.schema import Tier
        from crossai_ts_ray.state.audit import verify_tier_consistency

        out["audit"] = {}
        for part in args.audit.split(","):
            fn, fw, cn, cw = part.split(":")
            rep = verify_tier_consistency(
                args.out_dir, Tier(fn, int(fw)), Tier(cn, int(cw))
            )
            out["audit"][f"{fn}->{cn}"] = rep
            bad += len(rep["mismatches"])
    print(json.dumps(out, default=str))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
