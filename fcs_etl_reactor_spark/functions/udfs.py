"""Scalar Python UDFs (SURVEY.md §2.12 U1) — the LAST-resort surface.

Everything in this engine that can be an expression IS one (see
COVERAGE.md); this module exists to prove the escape hatch works and
to document its cost honestly: a row-at-a-time Python UDF pays
serialize→Python→deserialize per row (~10-100× slower than codegen
expressions, BatchEvalPython breaks whole-stage fusion). Use a
pandas_udf (Arrow-batched) when Python is genuinely needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udf
from pyspark.sql.types import StringType


# NB: a DataType instance, not a DDL string — string return types are
# parsed eagerly at decoration time and need an active SparkSession,
# which an importable module must not assume.
@udf(returnType=StringType())
def decade_label(x: float) -> str | None:
    """Log-decade bucket label for an FCS channel value — the kind of
    row function users reach for; the expression twin in
    tests/test_udfs.py computes it ~100× cheaper."""
    if x is None or x <= 0:
        return "neg"
    import math

    return f"1e{int(math.floor(math.log10(x)))}"


def decade_label_expr(col):
    """The expression twin: identical output, stays in codegen."""
    return (
        F.when(F.col(col).isNull() | (F.col(col) <= 0), "neg")
        .otherwise(F.concat(F.lit("1e"), F.floor(F.log10(col)).cast("int").cast("string")))
    )


def trimmed_mean_udaf():
    """U4: a TRUE vectorized UDAF (pandas GROUPED_AGG) — 10%-trimmed
    mean over a 2-decimal price column, exact via scaled-int sums.

    Arrow ships each group's column to Python once (not per-row);
    arithmetic is int64 so the result is partition-order independent
    and hash-matches the SQL window twin bit-for-bit. Scale honesty:
    GROUPED_AGG materializes one group per Python batch, so it needs
    bounded per-group size OR pre-aggregation; the rank-window SQL
    twin (the q4c oracle) is the unbounded-group scale path.

    Built lazily (a factory, not module-level) because pandas_udf
    resolves its Arrow schema at decoration time.
    """
    import math

    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import DoubleType, LongType

    # functionType passed explicitly: `from __future__ import
    # annotations` stringifies the hints, so inference can't see them.
    # Spark disallows mixing GROUPED_AGG with built-in aggregates in
    # one agg() call, so the kept-row count is a second pandas UDAF
    # rather than a plain count() expression.
    @pandas_udf(DoubleType(), functionType=PandasUDFType.GROUPED_AGG)
    def trimmed_mean_price(v):
        scaled = (v.astype("float64") * 100.0).round().astype("int64").sort_values()
        n = len(scaled)
        k = int(math.floor(n * 0.1))  # same IEEE double FLOOR(n*0.1) as the SQL twin
        kept = scaled.iloc[k : n - k]
        return (float(kept.sum()) / 100.0) / len(kept)

    @pandas_udf(LongType(), functionType=PandasUDFType.GROUPED_AGG)
    def trimmed_count(v):
        n = len(v)
        return n - 2 * int(math.floor(n * 0.1))

    return trimmed_mean_price, trimmed_count
