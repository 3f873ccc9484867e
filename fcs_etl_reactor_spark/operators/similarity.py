"""Embedding similarity search (SURVEY.md §2.11 L3/L7).

Two paths:
- ``cosine_topk_exact``: brute-force cosine top-k via positional
  explode + exact decimal dot products. Oracle-checkable (bit-identical
  to DuckDB) — the correctness baseline.
- ``cosine_topk_fast``: zip_with/aggregate JVM fold over the arrays —
  no explode/shuffle for the dot product, one crossJoin with the
  (broadcast) query side. The bench path.
- ``lsh_topk``: random-hyperplane LSH bucketing so only same-bucket
  pairs are compared — the 100 TB path (candidate volume ∝ Σ bucket²,
  tunable by the number of hyperplanes). Seeded & deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1e12


def _dot_scaled(a, b) -> F.Column:
    """Deterministic dot product: per-element FLOOR((x*y)*1e12) → long,
    sequential integer fold (order-free because integers are exact),
    back to double. Bit-identical to an unnest+HUGEINT-sum oracle, but
    runs as a single whole-stage-codegen array fold — no explode, no
    shuffle.
    """
    scaled = F.zip_with(
        a,
        b,
        lambda x, y: F.floor((x.cast("double") * y.cast("double")) * F.lit(_SCALE)).cast(
            "long"
        ),
    )
    total = F.aggregate(scaled, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return total.cast("double") / F.lit(_SCALE)


def cosine_topk_exact(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, match_id, cosine, rn) with rn ≤ k.

    Plan: broadcast the (smaller) query side, crossJoin against the
    corpus so each corpus partition scans independently — the only
    shuffle is the final per-query top-k window over |Q|·k-bounded
    data. Deterministic scaled-integer dot products keep parity with
    the SQL oracle at any partitioning.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot_scaled(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot_scaled(F.col(vec_col), F.col(vec_col))).alias("cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = (_dot_scaled(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))).alias(
        "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def _dot_fold(a, b):
    """JVM-side dot product: zip_with multiply + left-fold sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k with array folds (no positional
    explode): broadcast the query side, fold dot/norms per pair in
    whole-stage codegen. O(|Q|·|C|·d) flops, zero shuffle until the
    final per-query top-k."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot_fold(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot_fold(F.col(vec_col), F.col(vec_col))).alias("cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = (_dot_fold(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))).alias(
        "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG-based so
    no numpy dependency in the plan; quality is fine for bucketing)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    out_col: str = "bucket",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane (sign) LSH: bucket = bits of sign(v·h_i).

    Expression-generated per-plane dot products (constant-folded plane
    weights) — like compensation, a pure codegen projection.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = None
        for j, wgt in enumerate(plane):
            term = F.element_at(F.col(vec_col), j + 1).cast("double") * F.lit(wgt)
            dot = term if dot is None else dot + term
        bit = F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn(out_col, bucket)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: compare only same-bucket pairs.

    At 100 TB the bucket equi-join replaces the crossJoin: candidate
    volume drops by ~2^n_planes (recall traded via n_planes; for higher
    recall union several plane seeds)."""
    q = lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv", n_planes, seed, dim=dim,
    )
    c = lsh_bucket(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")),
        "cv", n_planes, seed, dim=dim,
    )
    pairs = q.join(c, "bucket")
    qnorm = F.sqrt(_dot_fold(F.col("qv"), F.col("qv")))
    cnorm = F.sqrt(_dot_fold(F.col("cv"), F.col("cv")))
    cos = (_dot_fold(F.col("qv"), F.col("cv")) / (qnorm * cnorm)).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
