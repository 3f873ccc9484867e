#!/usr/bin/env python
"""Sharded near-dup dedup at the 100x replica rung — the q5f disk
ceiling answered with a RUN, not prose.

Round-10 finding: monolithic q5f (band self-join -> verify -> CC) at
the 100x replica fills the box's ~77 GB of disk with shuffle, because
replicating a fixed vocabulary multiplies candidate PAIRS ~x10^4 and
the one job carries the whole corpus's band rows plus the whole pair
output at once. The documented deployment answer was "shard the
corpus" — this probe executes that shape end to end:

  stage band   one corpus scan -> minhash band rows, written to
               parquet PARTITIONED BY shard (pmod(xxhash64(id), K));
  stage run    one shard-pair job (i, j) per SUBPROCESS-OWN Spark
               session: reads exactly two shard partitions
               (partition-pruned), band-bucket join -> candidates ->
               exact-Jaccard verify (candidates only), writes the
               verified pairs; its shuffle files die with its JVM, so
               peak disk is ONE run's footprint, ~2/K^2 of the
               monolithic job's — the K(K+1)/2 runs are the separate
               cluster jobs of the real deployment;
  stage cc     union of every run's verified pairs -> large-star/
               small-star connected components -> cluster counts;
  stage base   the UNSHARDED pipeline at 1x (it completes there) ->
               ground-truth component structure.

Correctness is checked structurally, not by re-running the infeasible
monolithic 100x job: replication changes only doc ids, so J(replica a,
replica b) = J(a, b) and every doc's 100 replicas are pairwise
identical (J = 1). Hence the exact 100x component structure is derived
from the 1x graph: every 1x component of size m becomes one 100m
cluster, every 1x isolated doc becomes its own 100-replica cluster:

  expected nodes    = 100 * n_docs(1x)
  expected clusters = n_components(1x) + (n_docs(1x) - n_nodes(1x))

The probe FAILS (exit 1) if the sharded run's CC does not match those
numbers exactly, or if any stage dies. Shard-union losslessness of the
candidate stage itself is driver-oracle-checked at sf0.01 by
q9y_sharded_lsh_dedup and property-tested in tests/test_operators.py.

Usage: python scripts/sharded_dedup_probe.py [base_sf_dir] [--k K]
       [--factor N]   (defaults: sf0.1, K=4, factor=100)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEARDUP_J = 0.8
LSH = dict(n=3, num_perm=64, bands=16)


class _DiskSampler:
    """Min free /tmp bytes observed while a stage runs (1 s cadence)."""

    def __init__(self):
        self.start_free = shutil.disk_usage("/tmp").free
        self.min_free = self.start_free
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while not self._stop.wait(1.0):
            self.min_free = min(self.min_free, shutil.disk_usage("/tmp").free)

    def peak_used_gb(self) -> float:
        self._stop.set()
        self.min_free = min(self.min_free, shutil.disk_usage("/tmp").free)
        return (self.start_free - self.min_free) / 2**30


def _spark(name: str):
    from fcs_etl_reactor_spark.session import get_spark

    spark = get_spark(app_name=name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _emit(payload: dict) -> int:
    print("PROBE_RESULT " + json.dumps(payload))
    return 0


def stage_band(sf_dir: str, workdir: str, k: int) -> int:
    from pyspark.sql import functions as F

    from fcs_etl_reactor_spark.io import load
    from fcs_etl_reactor_spark.operators.dedup import minhash_band_rows

    sampler, t0 = _DiskSampler(), time.perf_counter()
    spark = _spark("sharded-dedup-band")
    d = load(spark, sf_dir, "documents")
    rows = minhash_band_rows(d, "doc_id", "text", **LSH).withColumn(
        "shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(k)).cast("int")
    )
    out = os.path.join(workdir, "band_rows")
    rows.write.mode("overwrite").partitionBy("shard").parquet(out)
    n = spark.read.parquet(out).count()
    return _emit(
        {
            "stage": "band",
            "wall_s": round(time.perf_counter() - t0, 1),
            "band_rows": n,
            "peak_disk_gb": round(sampler.peak_used_gb(), 2),
        }
    )


def stage_run(sf_dir: str, workdir: str, i: int, j: int) -> int:
    from pyspark.sql import functions as F

    from fcs_etl_reactor_spark.io import load
    from fcs_etl_reactor_spark.operators.dedup import (
        jaccard_verify_pairs,
        lsh_pairs_from_band_rows,
    )

    sampler, t0 = _DiskSampler(), time.perf_counter()
    spark = _spark(f"sharded-dedup-run-{i}-{j}")
    band = spark.read.parquet(os.path.join(workdir, "band_rows"))
    rows_i = band.filter(F.col("shard") == i).drop("shard")
    if i == j:
        cands = lsh_pairs_from_band_rows(rows_i, None, "doc_id")
    else:
        rows_j = band.filter(F.col("shard") == j).drop("shard")
        cands = lsh_pairs_from_band_rows(rows_i, rows_j, "doc_id")
    d = load(spark, sf_dir, "documents")
    verified = jaccard_verify_pairs(
        d, cands, "doc_id", "text", n=LSH["n"], threshold=NEARDUP_J
    )
    out = os.path.join(workdir, "pairs", f"run_{i}_{j}")
    verified.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    return _emit(
        {
            "stage": "run",
            "i": i,
            "j": j,
            "wall_s": round(time.perf_counter() - t0, 1),
            "verified_pairs": n,
            "peak_disk_gb": round(sampler.peak_used_gb(), 2),
        }
    )


def stage_cc(workdir: str) -> int:
    from pyspark.sql import functions as F

    from fcs_etl_reactor_spark.operators.dedup import dedup_clusters_star

    sampler, t0 = _DiskSampler(), time.perf_counter()
    spark = _spark("sharded-dedup-cc")
    pairs = spark.read.parquet(os.path.join(workdir, "pairs", "run_*"))
    cc = dedup_clusters_star(pairs)
    agg = cc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    ).collect()[0]
    return _emit(
        {
            "stage": "cc",
            "wall_s": round(time.perf_counter() - t0, 1),
            "n_nodes": agg["n_nodes"],
            "n_clusters": agg["n_clusters"],
            "peak_disk_gb": round(sampler.peak_used_gb(), 2),
        }
    )


def stage_base(sf_dir: str) -> int:
    """Unsharded 1x ground truth: verified-pair graph components."""
    from pyspark.sql import functions as F

    from fcs_etl_reactor_spark.io import load
    from fcs_etl_reactor_spark.operators.dedup import (
        dedup_clusters_star,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )

    t0 = time.perf_counter()
    spark = _spark("sharded-dedup-base")
    d = load(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs(d, "doc_id", "text", **LSH)
    verified = jaccard_verify_pairs(
        d, cands, "doc_id", "text", n=LSH["n"], threshold=NEARDUP_J
    ).localCheckpoint()
    cc = dedup_clusters_star(verified)
    agg = cc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("cluster_id").alias("n_components"),
    ).collect()[0]
    return _emit(
        {
            "stage": "base",
            "wall_s": round(time.perf_counter() - t0, 1),
            "n_docs": d.count(),
            "n_nodes": agg["n_nodes"],
            "n_components": agg["n_components"],
            "verified_pairs": verified.count(),
        }
    )


def _child(args: list[str]) -> dict:
    """Run a stage in its own process (own Spark session — its shuffle
    dirs are deleted when the JVM exits, which IS the probe's point:
    peak disk = one run's footprint, like separate cluster jobs)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True,
        text=True,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT ") :])
    raise SystemExit(
        f"stage {args} failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("base", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--stage", default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--i", type=int, default=0)
    ap.add_argument("--j", type=int, default=0)
    ap.add_argument("--sf-dir", default=None)
    args = ap.parse_args()

    if args.stage == "band":
        return stage_band(args.sf_dir, args.workdir, args.k)
    if args.stage == "run":
        return stage_run(args.sf_dir, args.workdir, args.i, args.j)
    if args.stage == "cc":
        return stage_cc(args.workdir)
    if args.stage == "base":
        return stage_base(args.sf_dir)

    # ---- orchestrator ----
    scaled = f"/tmp/spark_graft_scale_probe_{args.factor}x"
    if not os.path.exists(os.path.join(scaled, "_DONE")):
        from scripts.scale_probe import build_scaled_dir

        spark = _spark("sharded-dedup-replicate")
        build_scaled_dir(spark, args.base, scaled, factor=args.factor)
        spark.stop()
    workdir = f"/tmp/spark_graft_sharded_dedup_{args.factor}x"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

    t_all = time.perf_counter()
    base = _child(["--stage", "base", "--sf-dir", args.base])
    print(
        f"[base 1x] docs={base['n_docs']} pairs={base['verified_pairs']} "
        f"nodes={base['n_nodes']} components={base['n_components']} "
        f"({base['wall_s']}s)"
    )
    expected_nodes = args.factor * base["n_docs"]
    expected_clusters = base["n_components"] + (
        base["n_docs"] - base["n_nodes"]
    )

    band = _child(
        ["--stage", "band", "--sf-dir", scaled, "--workdir", workdir,
         "--k", str(args.k)]
    )
    print(
        f"[band {args.factor}x] rows={band['band_rows']} "
        f"({band['wall_s']}s, peak {band['peak_disk_gb']} GB)"
    )

    runs = []
    for i in range(args.k):
        for j in range(i, args.k):
            r = _child(
                ["--stage", "run", "--sf-dir", scaled, "--workdir", workdir,
                 "--i", str(i), "--j", str(j)]
            )
            runs.append(r)
            print(
                f"[run {i},{j}] pairs={r['verified_pairs']:>9} "
                f"wall={r['wall_s']:>7.1f}s peak_disk={r['peak_disk_gb']:>6.2f} GB"
            )

    cc = _child(["--stage", "cc", "--workdir", workdir])
    print(
        f"[cc] nodes={cc['n_nodes']} clusters={cc['n_clusters']} "
        f"({cc['wall_s']}s, peak {cc['peak_disk_gb']} GB)"
    )

    total_pairs = sum(r["verified_pairs"] for r in runs)
    peak = max(
        [band["peak_disk_gb"], cc["peak_disk_gb"]]
        + [r["peak_disk_gb"] for r in runs]
    )
    ok = (
        cc["n_nodes"] == expected_nodes
        and cc["n_clusters"] == expected_clusters
    )
    result = {
        "metric": "sharded_dedup_100x",
        "factor": args.factor,
        "k": args.k,
        "n_runs": len(runs),
        "total_verified_pairs": total_pairs,
        "n_nodes": cc["n_nodes"],
        "expected_nodes": expected_nodes,
        "n_clusters": cc["n_clusters"],
        "expected_clusters": expected_clusters,
        "structural_match": ok,
        "max_stage_peak_disk_gb": peak,
        "total_wall_s": round(time.perf_counter() - t_all, 1),
    }
    print(json.dumps(result))
    shutil.rmtree(workdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
