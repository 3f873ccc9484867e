#!/usr/bin/env python
"""Concurrent-throughput bench: the headline queries submitted from 4
threads into one SparkSession (FAIR pool) vs the sequential run.

Why this matters: bench.py measures single-stream latency, where
Spark's per-job scheduling floor (~0.1 s) is a fixed tax DuckDB
doesn't pay. A 100 TB deployment runs many queries concurrently — the
floor amortizes across in-flight jobs. This script quantifies that:
speedup = sequential_total / concurrent_wall.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from fcs_etl_reactor_spark.queries import QUERIES
from fcs_etl_reactor_spark.session import get_spark, tune_for_input
from scripts.cliutil import sf_arg


def main() -> int:
    sf_dir = sf_arg("/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # scheduler.mode is a static conf — set it at session build time
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("concurrency-bench")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark = tune_for_input(spark, sf_dir)
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in HEADLINE:  # warm: plan cache + scan relayout
        run(name)

    t0 = time.perf_counter()
    for name in HEADLINE:
        run(name)
    seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(run, HEADLINE))
    conc = time.perf_counter() - t0

    print(
        f"sequential {seq:.3f} s, concurrent(4 threads) {conc:.3f} s, "
        f"speedup {seq / conc:.2f}x over {len(HEADLINE)} queries"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
