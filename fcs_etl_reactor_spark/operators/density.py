"""Density / second-moment primitives over point and vector columns.

Two operators with the same design rule — integer-quantize first, so
no float reduction order can perturb a count or a sum:

- ``eps_neighbor_counts``: grid-bucketed eps-neighborhood counting
  (the DBSCAN core-point primitive). Cell side = eps guarantees any
  two points within eps differ by at most one cell per axis, so the
  3x3 neighbor-cell equi-join is a complete candidate set; the exact
  squared-distance test is pure int64 arithmetic. Shuffle volume is
  (9 x local density) per point — never the all-pairs product.

- ``gram_upper``: per-partition integer X^T X via one NumPy matmul
  inside mapInPandas, summed cell-wise across partitions. The only
  shuffled rows are (#partitions x D(D+1)/2) partials — dimension-
  bound, not corpus-bound — and every value is an exact integer
  (partials are int64, the cross-partition sum is DECIMAL(38,0)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eps_neighbor_counts(
    pts: DataFrame, id_col: str, x_col: str, y_col: str, eps_q: int
) -> DataFrame:
    """Per-point count of eps-neighbors (self included) over quantized
    integer coordinates. Returns (id_col, n_neighbors)."""
    cell = pts.select(
        F.col(id_col),
        F.col(x_col).alias("qx"),
        F.col(y_col).alias("qy"),
        F.floor(F.col(x_col) / eps_q).alias("cx"),
        F.floor(F.col(y_col) / eps_q).alias("cy"),
    )
    probe = cell.select(
        F.col(id_col).alias("_a_id"),
        F.col("qx").alias("ax"),
        F.col("qy").alias("ay"),
        F.explode(F.expr("array(cx - 1, cx, cx + 1)")).alias("ncx"),
        F.col("cy"),
    ).select(
        "_a_id",
        "ax",
        "ay",
        "ncx",
        F.explode(F.expr("array(cy - 1, cy, cy + 1)")).alias("ncy"),
    )
    build = cell.select(
        F.col("cx").alias("ncx"),
        F.col("cy").alias("ncy"),
        F.col("qx").alias("bx"),
        F.col("qy").alias("by"),
    )
    pairs = probe.join(build, ["ncx", "ncy"]).filter(
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
        <= F.lit(eps_q * eps_q)
    )
    return pairs.groupBy(F.col("_a_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_neighbors")
    )


def gram_upper(vecs: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle Gram matrix of an integer-vector column.

    ``vec_col`` must be array<bigint> of length ``dim`` (quantize
    floats BEFORE calling). Returns (i, j, gram) with 0-based i <= j.
    Per-partition int64 partials are exact while |component|^2 x
    partition_rows < 2^63 (~9e10 rows at |q| <= 1e4); the cross-
    partition sum is widened to DECIMAL(38,0) so no total row count
    can wrap it.
    """
    q = vecs.select(F.col(vec_col).alias("v"))

    def _partial(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf):
                m = np.asarray(pdf["v"].tolist(), dtype=np.int64)
                acc += m.T @ m
                seen = True
        if seen:
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "partial": acc[iu],
                }
            )

    partials = q.mapInPandas(_partial, "i int, j int, partial long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("g"))
        .select("i", "j", F.col("g").cast("bigint").alias("gram"))
    )
