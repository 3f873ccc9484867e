"""Exact (order-independent) float aggregation for oracle parity.

Problem: SUM over doubles is order-dependent; Spark's partial/final
aggregation over N partitions associates differently than DuckDB's
scan order, so raw double sums drift in the last ulps and break the
driver's value-hash comparison (__spark_entry__.py:3-7).

Fix: cast each addend to DECIMAL(prec, scale) first. The double→decimal
cast rounds half-up identically in Spark and DuckDB (exact ties cannot
occur: a binary double can never equal an odd multiple of 10^-scale/2),
and decimal summation is exact integer arithmetic — order-independent.
Casting the exact decimal total back to double is then deterministic
and identical across engines.

This costs one cast per row — negligible against the shuffle — and is
scale-safe: DECIMAL(27,6) holds sums to 10^21.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits covers the fixtures (prices have 2, discounts 2,
# event values 2); 18 integer digits is plenty for per-row magnitudes.
DEC = "decimal(18,6)"


def dsum(expr: Column | str, alias: str) -> Column:
    """Order-independent SUM(double) → double, exact to 1e-6 per addend."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(expr: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count.

    (Plain AVG would divide per-engine intermediate sums — same drift.)
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def fsum(expr: Column, alias: str, scale: float = 1e12) -> Column:
    """Order-independent sum for FULL-PRECISION doubles (e.g. float32
    embeddings), where the decimal-cast trick can hit engine-dependent
    rounding at the scale boundary. FLOOR(x*scale) is a pure IEEE
    multiply+floor (bit-identical in every engine); the integer sum is
    exact (decimal(38,0) accumulator — no overflow at any row count).
    """
    scaled = F.floor(expr * F.lit(scale)).cast("decimal(38,0)")
    return (F.sum(scaled).cast("double") / F.lit(scale)).alias(alias)


def o_fsum(expr: str, alias: str, scale: str = "1000000000000.0") -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {scale}) AS HUGEINT)) AS DOUBLE)"
        f" / {scale} AS {alias}"
    )


# ---- oracle-side (DuckDB SQL) twins — textual templates ----------------


def o_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def o_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
