"""Exact (order-independent) float aggregation for oracle parity.

Problem: SUM over doubles is order-dependent; Spark's partial/final
aggregation over N partitions associates differently than DuckDB's
scan order, so raw double sums drift in the last ulps and break the
driver's value-hash comparison (__spark_entry__.py:3-7).

Fix: scale each addend to an integer with pure IEEE ops that are
bit-identical in every engine — ROUND(x*scale) (or FLOOR for
full-precision floats) — and sum integers exactly. The scaled total
cast back to double is then deterministic and identical across
engines AND across partition counts.

Performance: the long-backed sum stays in whole-stage codegen
(measured 4x faster than a DECIMAL(18,6) sum, whose 28-digit
accumulator falls off Spark's long-backed decimal fast path).

Overflow envelope (ANSI mode raises rather than corrupting): with the
default scale=1e6 and per-row magnitudes ~1e5, the long accumulator
holds ~1e8 rows per GROUP; pass a smaller scale (1e2/1e4) for bigger
groups — monetary data has ≤2 true decimals, so scale=100 is exact
and holds ~1e12 rows per group. fsum (full-precision path) uses a
decimal(38,0) accumulator: slower, overflow-free at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scaled_long(col: Column, scale: float) -> Column:
    # FLOOR(x*s + 0.5), not ROUND: Spark's ROUND on doubles routes
    # through BigDecimal per row (slow); floor+0.5 is a pure IEEE
    # op pair, bit-identical in both engines (half-toward-+inf).
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def dsum(expr: Column | str, alias: str, scale: float = 1e6) -> Column:
    """Order-independent SUM(double) → double, exact to 1/scale per addend."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return (F.sum(_scaled_long(col, scale)).cast("double") / F.lit(scale)).alias(alias)


def davg(expr: Column | str, alias: str, scale: float = 1e6) -> Column:
    """Order-independent AVG: exact scaled sum / non-null count."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return (
        F.sum(_scaled_long(col, scale)).cast("double") / F.lit(scale) / F.count(col)
    ).alias(alias)


def fsum(expr: Column, alias: str, scale: float = 1e12) -> Column:
    """Order-independent sum for FULL-PRECISION doubles (e.g. float32
    embeddings). FLOOR(x*scale) avoids the round-tie subtleties of
    shortest-repr decimal casts; the decimal(38,0) ACCUMULATOR never
    overflows, but the per-addend FLOOR returns a long, so each addend
    must satisfy |x|·scale < 2^63 (|x| < ~9.2e6 at the default scale —
    Spark's FLOOR saturates at Long.MAX silently, it does not raise;
    verified in tests/test_operators.py). Pass a smaller scale for
    large-magnitude data.
    """
    scaled = F.floor(expr * F.lit(scale)).cast("decimal(38,0)")
    return (F.sum(scaled).cast("double") / F.lit(scale)).alias(alias)


# ---- oracle-side (DuckDB SQL) twins — textual templates ----------------
# DuckDB SUM(BIGINT) returns HUGEINT (exact); casting the identical
# integer total to DOUBLE yields the identical double.


def o_dsum(expr: str, alias: str, scale: str = "1000000.0") -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {scale} AS {alias}"
    )


def o_davg(expr: str, alias: str, scale: str = "1000000.0") -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {scale} / COUNT({expr}) AS {alias}"
    )


def o_fsum(expr: str, alias: str, scale: str = "1000000000000.0") -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {scale}) AS HUGEINT)) AS DOUBLE)"
        f" / {scale} AS {alias}"
    )
