#!/usr/bin/env python
"""Count the Spark jobs a query costs end-to-end (construction +
noop-sink execution) — the round-12 evidence tool for the iterative
tier, whose cost is per-round FIXED overhead (checkpoint jobs,
convergence collects, broadcast rebuilds) rather than plan shape, so
`.explain` dumps cannot show the change; the job count can.

Usage: python scripts/job_count_probe.py q5b_dedup_clusters ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcs_etl_reactor_spark.queries import QUERIES
from fcs_etl_reactor_spark.session import get_spark, tune_for_input


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = tune_for_input(get_spark(app_name="job-count-probe"), sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    for name in sys.argv[1:]:
        group = f"probe-{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        n_jobs = len(tracker.getJobIdsForGroup(group))
        print(f"{name}: {n_jobs} jobs, {dt:.3f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
