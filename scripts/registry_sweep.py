#!/usr/bin/env python
"""Full-registry timing sweep: cold-plan noop-sink wall-clock for EVERY
registered query, ranked slowest-first.

The headline bench (bench.py) covers 13 frozen queries and the scale
probe ~100; this sweep is the optimization-round tool that ranks all
of them so attention goes where the time is. Each sample evicts the
prepared-plan LRU first (iterative queries do real work at plan-build
time) and times plan construction + a full noop-sink execution —
i.e. what the driver pays for a cold query.

Usage: python scripts/registry_sweep.py [--sf-dir D] [--runs N]
       [--out results.json] [--warm] [query ...]
Default: every registered query, 1 warmup-free sample + median of N=2.

--warm (round-12 compile-cost analysis): additionally time each query
WITHOUT evicting the prepared-plan LRU after the cold samples, so the
extra samples reuse the built plan AND the JVM's codegen cache — the
cold-minus-warm delta is the per-query plan-construction +
whole-stage-codegen compile cost (guide §1: measure before shrinking
expression trees). Output gains a "warm" map and a "compile_delta"
ranking.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcs_etl_reactor_spark.queries import QUERIES, _PLAN_CACHE_ATTR
from fcs_etl_reactor_spark.session import get_spark, tune_for_input


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="*", help="subset (default: all)")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--warm", action="store_true")
    args = ap.parse_args()

    names = args.queries or list(QUERIES)
    spark = tune_for_input(get_spark(app_name="registry-sweep"), args.sf_dir)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = QUERIES[name]
        samples = []
        try:
            for _ in range(args.runs):
                spark.__dict__.pop(_PLAN_CACHE_ATTR, None)
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            results[name] = round(statistics.median(samples), 4)
            if args.warm:
                # plan LRU kept: re-serves the built DataFrame, and the
                # JVM codegen cache is hot from the cold samples above
                wsamples = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, args.sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    wsamples.append(time.perf_counter() - t0)
                warm[name] = round(min(wsamples), 4)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            spark.sparkContext.setJobDescription(None)
    ranked = dict(sorted(results.items(), key=lambda kv: -kv[1]))
    for name, sec in ranked.items():
        if args.warm and name in warm:
            print(f"{sec:8.3f}  warm {warm[name]:8.3f}  delta "
                  f"{sec - warm[name]:7.3f}  {name}")
        else:
            print(f"{sec:8.3f}  {name}")
    total = round(sum(results.values()), 2)
    print(f"total {total} s over {len(results)} queries; {len(errors)} errors")
    for name, err in errors.items():
        print(f"  [ERR] {name}: {err}")
    out_obj = {"sf_dir": args.sf_dir, "runs": args.runs,
               "total": total, "queries": ranked, "errors": errors}
    if args.warm:
        out_obj["warm"] = warm
        out_obj["compile_delta"] = dict(
            sorted(
                ((n, round(results[n] - warm[n], 4)) for n in warm),
                key=lambda kv: -kv[1],
            )
        )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out_obj, fh, indent=1)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
