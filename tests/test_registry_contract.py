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


def test_rows_only_entries_are_justified():
    missing = set(QUERIES) - set(ORACLE)
    unjustified = missing - set(ROWS_ONLY_JUSTIFIED)
    assert not unjustified, (
        "registered queries without an oracle score as err 'no_oracle' "
        f"at the driver; give them an oracle or justify here: {sorted(unjustified)}"
    )
