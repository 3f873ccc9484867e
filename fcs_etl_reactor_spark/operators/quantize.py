"""Int8 scalar quantization for embedding columns (SURVEY.md §2.11 L3
scale path — compressed-domain similarity).

Symmetric per-vector int8 quantization is the standard first
compression rung for billion-vector ANN: 4× smaller than float32,
integer dot products (SIMD-friendly on the JVM), and a deterministic
round rule (FLOOR(x·scale + 0.5), i.e. round-half-up) so the SAME
bytes come out of any engine — which is what lets the driver's DuckDB
oracle replay the whole pipeline exactly, unlike float cosine whose
reduction order drifts.

Everything here is pure built-in expressions (transform/zip_with/
aggregate): no UDF, no explode, no shuffle for the quantization
itself. At 100 TB the quantize step is a map-only pass fused into the
scan; the top-k join below broadcasts the bounded query batch so the
corpus is scanned exactly once with no corpus-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INT8_MAX = 127


def int8_quantize(vec) -> F.Column:
    """array<numeric> -> array<long> in [-127, 127].

    scale = 127 / max|v|; q_i = FLOOR(v_i·scale + 0.5) clamped. Both
    the division and the per-element multiply are single IEEE-754
    ops, so any engine reproduces the exact same integers (the clamp
    guards the ±1-ulp case where v_i = max|v| lands on 127.0000…1).
    Zero vectors quantize to all-zero (scale 0) instead of NaN.
    """
    vec = F.transform(vec, lambda x: x.cast("double"))
    m = F.array_max(F.transform(vec, F.abs))
    scale = F.when(m > 0, F.lit(float(INT8_MAX)) / m).otherwise(F.lit(0.0))
    lo, hi = F.lit(-INT8_MAX).cast("long"), F.lit(INT8_MAX).cast("long")
    return F.transform(
        vec,
        lambda x: F.greatest(lo, F.least(hi, F.floor(x * scale + F.lit(0.5)))),
    )


def _int_dot(a, b) -> F.Column:
    """Exact integer dot product of two quantized vectors — a single
    zip_with/aggregate fold, order-free because integer addition is
    associative (no float drift to canonicalize away)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k by quantized cosine: (query_id, match_id, q_dot, cos_q, rn).

    cos_q = q_dot / sqrt(|qa|²·|qb|²) over the INT8 codes — integer
    numerator and norms (exact), one double sqrt+divide at the end
    (deterministic IEEE), so ranking and values hash-match a SQL
    replay bit-for-bit.

    Plan shape (same contract as cosine_topk_exact): the query batch
    is broadcast — ANN query batches are bounded by design — and the
    corpus partitions scan independently; the only shuffle is the
    per-query top-k window over |Q|·|C|→|Q|·k rows, which Spark
    executes as WindowGroupLimit (partial top-k before the exchange).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        int8_quantize(F.col(vec_col)).alias("qa"),
    ).withColumn("na2", _int_dot(F.col("qa"), F.col("qa")))
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        int8_quantize(F.col(vec_col)).alias("qb"),
    ).withColumn("nb2", _int_dot(F.col("qb"), F.col("qb")))

    pairs = c.crossJoin(F.broadcast(q))
    cos_q = (
        _int_dot(F.col("qa"), F.col("qb")).cast("double")
        / F.sqrt((F.col("na2") * F.col("nb2")).cast("double"))
    ).alias("cos_q")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_q").desc(), "match_id")
    return (
        pairs.select(
            "query_id",
            "match_id",
            _int_dot(F.col("qa"), F.col("qb")).alias("q_dot"),
            cos_q,
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
