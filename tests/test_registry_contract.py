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
