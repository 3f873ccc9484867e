"""Exact distributed k-means (Lloyd's algorithm) over embedding
columns.

Why integer quantization: float centroid updates are reduction-order
dependent, so a float k-means can NEVER pass a cross-engine
value-hash (assignments near a Voronoi boundary flip in the last
ulp). This implementation quantizes each component to a positive
BIGINT once up front — q = floor((x + shift) * scale + 0.5), pure
IEEE ops, bit-identical in every engine — and then runs ENTIRELY in
integer arithmetic: squared distances are BIGINT sums, centroid
updates are floor divisions of BIGINT sums, and ties break on the
smallest centroid id. Every iteration is therefore exactly
reproducible in any engine (the registry oracle replays it in DuckDB
as an unrolled CTE chain) and at any partition count.

Topology (the same one MLlib's KMeans uses, minus its float drift):
- points are exploded dimension-major ONCE (vec_id, pos, qv);
- the k·d centroid table is broadcast every iteration (k=4, d=64 →
  256 rows, ~KBs at any corpus size);
- assignment is a broadcast join + partial-aggregated groupBy on
  (vec_id, cid) — the only shuffle, keyed by the point id;
- the update aggregates (cid, pos) cells: k·d output rows via
  map-side combine, a ~KB shuffle regardless of corpus size.
Iteration count is a fixed small constant (deterministic plans, no
driver-side convergence loop that could spin).

Deterministic init: the k points with the lexicographically smallest
md5(vec_id) become centroids 0..k-1 — engine-independent, seedless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Quantization: embeddings are unit-norm (components in [-1, 1]);
#: shift +2 keeps every quantized value strictly positive so integer
#: floor-division below is floor in BOTH engines (Spark `div`
#: truncates toward zero, DuckDB `//` floors — they agree only on
#: non-negatives).
SHIFT = 2.0
SCALE = 1000.0


def quantize_long(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Dimension-major quantized points: (id, pos, qv BIGINT)."""
    return df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos", "_x"),
    ).select(
        id_col,
        "pos",
        F.floor(
            (F.col("_x").cast("double") + F.lit(SHIFT)) * F.lit(SCALE) + F.lit(0.5)
        )
        .cast("long")
        .alias("qv"),
    )


def seed_centroids(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, cid) for the k seed points, cid 0..k-1 in md5(id) order.
    The top-k runs as TakeOrderedAndProject (per-partition heaps, no
    global sort); the row_number window then orders only k rows."""
    small = (
        df.select(id_col, F.md5(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h", id_col)
        .limit(k)
    )
    w = Window.orderBy("_h", F.col(id_col))
    return small.withColumn("cid", F.row_number().over(w) - 1).drop("_h")


def kmeans_exact(
    points: DataFrame, id_col: str, k: int, iters: int
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` exact Lloyd rounds over dimension-major quantized
    points (id, pos, qv). Returns (assign, centroids):
    assign = (id, cid, d) using the LAST round's input centroids;
    centroids = (cid, pos, qv) updated from that final assignment.
    A centroid that loses every point drops out (inner joins) — the
    oracle replay drops it identically."""
    seeds = seed_centroids(points.select(id_col).distinct(), id_col, k)
    cent = (
        points.join(F.broadcast(seeds), id_col)
        .select("cid", "pos", "qv")
    )
    assign = None
    for _ in range(iters):
        cpos = cent.select(
            F.col("cid").alias("c_cid"),
            F.col("pos").alias("c_pos"),
            F.col("qv").alias("c_qv"),
        )
        diff = F.col("qv") - F.col("c_qv")
        dist = (
            points.join(F.broadcast(cpos), F.col("pos") == F.col("c_pos"))
            .groupBy(id_col, "c_cid")
            .agg(F.sum(diff * diff).alias("d"))
        )
        # argmin with deterministic tie-break: lexicographic min over
        # (d, cid) structs — identical to the oracle's two-step
        # MIN(d) → MIN(cid among minima).
        assign = (
            dist.groupBy(id_col)
            .agg(F.min(F.struct("d", "c_cid")).alias("m"))
            .select(id_col, F.col("m.c_cid").alias("cid"), F.col("m.d").alias("d"))
        )
        cent = (
            points.join(assign.select(id_col, "cid"), id_col)
            .groupBy("cid", "pos")
            .agg(
                F.expr("sum(qv) div count(*)").cast("long").alias("qv")
            )
        )
    return assign, cent
