"""Public query registry — the driver-facing capability surface.

Every operator in SURVEY.md §2 marked "Oracle: yes" registers here as a
(Spark callable, DuckDB SQL) pair via @query; non-SQL-expressible ops
register with oracle=None and get the driver's rows-only check.

Import side effects populate QUERIES/ORACLE; __spark_entry__.py simply
re-exports them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, with optional
    DuckDB oracle SQL (ANSI; fixture tables pre-registered as views)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Module imports populate the registry (order = SURVEY §2 section order).
from fcs_etl_reactor_spark.queries import relational  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import joins  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import aggregates  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import windows  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import setops  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import scalar  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import domain  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import text  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import vectors  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import events_windows  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import dedup_extra  # noqa: E402,F401
