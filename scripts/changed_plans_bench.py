#!/usr/bin/env python
"""Changed-plans bench: cold-plan medians for just the queries that
changed this round.

The headline bench set (bench.py) is frozen for cross-round
comparability, which means BENCH_rN cannot see a regression in the
plans that actually changed in round N (round-10 verdict, "What's
missing" item 2). This closes that gap as standing protocol: after a
round's mints/rewrites land, run

    python scripts/changed_plans_bench.py q9y_sharded_lsh_dedup q9z_...

in the same session as the headline bench and record the table in
BENCH.md's round section. Each sample is a COLD plan (the prepared-
plan LRU is evicted per sample — iterative queries do real work at
plan-build time, see scale_probe._clear_plan_cache) followed by a
full noop-sink execution; median of 3 after one untimed warmup.

Absolute numbers are same-session-only evidence (the box drifts
across days — BENCH.md round 10); the point is a per-round floor so
the NEXT session has a same-tree reference for exactly these plans.

Usage: python scripts/changed_plans_bench.py [--sf-dir D] [--runs N] q...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcs_etl_reactor_spark.queries import QUERIES, _PLAN_CACHE_ATTR
from fcs_etl_reactor_spark.session import get_spark, tune_for_input


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="+", help="changed query names")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="changed-plans-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, args.sf_dir)

    results = {}
    for name in args.queries:
        fn = QUERIES[name]
        spark.__dict__.pop(_PLAN_CACHE_ATTR, None)
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.runs):
            spark.__dict__.pop(_PLAN_CACHE_ATTR, None)
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(samples), 4)
        print(f"{name:<28}{results[name]:>8.3f} s  (cold-plan median of {args.runs})")

    print(
        json.dumps(
            {
                "metric": "changed_plans_cold_median",
                "sf_dir": args.sf_dir,
                "runs": args.runs,
                "queries": results,
                "total": round(sum(results.values()), 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
