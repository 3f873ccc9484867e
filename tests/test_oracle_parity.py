"""Oracle differential tests (SURVEY.md §5.2-1): every registered
(queries, oracle_sql) pair must match DuckDB exactly at sf0.001.

This is the same check the driver runs at sf0.01; run_differ.py /
driver_sim.py cover that scale pre-commit.
"""

import pytest

from fcs_etl_reactor_spark.queries import ORACLE, QUERIES
from fcs_etl_reactor_spark.testkit import compare
from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, name):
    res = compare(name, QUERIES[name](spark, SF_SMALL), ORACLE[name], SF_SMALL)
    assert res.ok, str(res) + "".join(
        f"\n  spark={s}\n  oracle={o}" for s, o in res.mismatches
    )


def test_all_queries_have_callables(spark):
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_rows_only_queries_run(spark):
    for name in set(QUERIES) - set(ORACLE):
        df = QUERIES[name](spark, SF_SMALL)
        assert df.count() >= 0, name
