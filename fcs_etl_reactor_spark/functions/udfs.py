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
