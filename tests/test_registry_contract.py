"""Registry-wide driver-contract guards (round-1 verdict class fixes).

The real driver's canonicalizer pandas-sorts every output column and
crashes on ARRAY/STRUCT/MAP cells, and it records oracle-less entries
as err "no_oracle" — so the contract for every registered query is:
atomic top-level output types only, and (eventually) an oracle. These
tests assert the schema half for ALL entries without executing the
queries (schemas are analysis-time), which is what makes a 100-query
sweep affordable in CI.
"""

from pyspark.sql.types import ArrayType, MapType, StructType

from fcs_etl_reactor_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_SMALL

# Queries whose driver-window slot is deliberately deferred may lack an
# oracle only with a written justification here.
ROWS_ONLY_JUSTIFIED: dict[str, str] = {}


def test_no_complex_toplevel_output_types(spark):
    bad = {}
    for name, fn in QUERIES.items():
        schema = fn(spark, SF_SMALL).schema
        complex_fields = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_fields:
            bad[name] = complex_fields
    assert not bad, (
        "top-level ARRAY/STRUCT/MAP columns crash the driver's "
        f"canonicalizer: {bad}"
    )


def test_output_types_in_driver_safe_envelope(spark):
    """Round-5 class fix (q7a): the driver's order-insensitive value
    hash canonicalizes >64-bit integers differently per engine —
    DuckDB HUGEINT stringified as "65745.0" vs Spark BIGINT "65745"
    (q75, r02), and a DECIMAL(38,0) cell at ~2.9e21 hash-failed with
    byte-identical values on both sides (q7a, r05). Enforce
    mechanically that every registered query's output schema stays
    inside the proven-safe envelope: atomic types whose values are
    exactly representable in int64 or double on BOTH engines.
    DecimalType is allowed only when precision <= 18 (unscaled value
    provably < 10^18 < 2^63). Analysis-time only — no execution."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    safe_atomic = (
        StringType,
        BooleanType,
        ByteType,
        ShortType,
        IntegerType,
        LongType,
        FloatType,
        DoubleType,
        DateType,
        TimestampType,
        TimestampNTZType,
    )
    bad = {}
    for name, fn in QUERIES.items():
        schema = fn(spark, SF_SMALL).schema
        for f in schema.fields:
            dt = f.dataType
            if isinstance(dt, DecimalType):
                if dt.precision > 18:
                    bad.setdefault(name, []).append(
                        f"{f.name}: {dt.simpleString()} (precision>18 "
                        "can exceed int64 — fold to BIGINT, e.g. modular "
                        "sum, or cast to double)"
                    )
            elif not isinstance(dt, safe_atomic):
                bad.setdefault(name, []).append(
                    f"{f.name}: {dt.simpleString()}"
                )
    assert not bad, (
        "output columns outside the driver-safe type envelope "
        f"(the q75/q7a hash-canonicalization class): {bad}"
    )


def test_oracle_types_congruent_with_spark_schema(spark):
    """Round-2 class fix: the driver compares DuckDB↔Spark dtypes
    (TIMESTAMPTZ≠TIMESTAMP, HUGEINT≠BIGINT, DECIMAL≠DOUBLE). Prepare
    every oracle in DuckDB (no execution — relation .types is
    analysis-time) and assert exact congruence with the Spark schema
    via the testkit mapping. Catches the q95/q75 class before the
    driver does."""
    import pytest

    from fcs_etl_reactor_spark.testkit import duck_connection, schema_diff

    con = duck_connection(SF_SMALL)
    bad = {}
    try:
        for name in sorted(ORACLE):
            try:
                sdf = QUERIES[name](spark, SF_SMALL)
            except Exception as exc:  # spark-side breakage owned by parity tests
                bad[name] = f"spark build failed: {type(exc).__name__}: {exc}"
                continue
            diff = schema_diff(sdf, con.sql(ORACLE[name]))
            if diff:
                bad[name] = diff
    finally:
        con.close()
    if bad:
        pytest.fail(
            "oracle↔spark type incongruence (driver schema check would fail):\n"
            + "\n".join(f"  {k}: {v}" for k, v in bad.items())
        )


def test_rows_only_entries_are_justified():
    missing = set(QUERIES) - set(ORACLE)
    unjustified = missing - set(ROWS_ONLY_JUSTIFIED)
    assert not unjustified, (
        "registered queries without an oracle score as err 'no_oracle' "
        f"at the driver; give them an oracle or justify here: {sorted(unjustified)}"
    )
