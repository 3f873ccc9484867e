"""Declarative data-quality expectations (Deequ/Great-Expectations
style) evaluated in ONE aggregation pass.

Each Expectation contributes an aggregate metric expression and a
pass-predicate over that metric. `run_expectations` computes every
metric in a single `df.agg(...)` — one scan, partial-aggregated
map-side, a 1-row shuffle — then unpivots the row with `stack` into
the report shape (expectation, metric, passed). At 100 TB this is
the only sane topology: N constraints cost one pass, not N.

Metrics are restricted to exactly-reproducible aggregates (counts,
count-distincts, min/max, violation counts) so the report — including
every boolean verdict — hash-matches a SQL replay in any engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One constraint: `metric` is an aggregate Column (must resolve
    to DOUBLE); the pass-predicate is supplied per-spec as a SQL
    fragment over the `{m}` placeholder (see run_expectations)."""

    name: str
    metric: Column


def completeness(col: str) -> Expectation:
    return Expectation(
        f"completeness_{col}",
        (F.count(col).cast("double") / F.count(F.lit(1))),
    )


def uniqueness(*cols: str) -> Expectation:
    return Expectation(
        "uniqueness_" + "_".join(cols),
        (F.count_distinct(*[F.col(c) for c in cols]).cast("double") / F.count(F.lit(1))),
    )


def violations(name: str, bad: Column) -> Expectation:
    """Count of rows violating a row-level predicate (0 = pass)."""
    return Expectation(
        name, F.sum(F.when(bad, 1).otherwise(0)).cast("double")
    )


def run_expectations(
    df: DataFrame, specs: list[tuple[Expectation, str]]
) -> DataFrame:
    """specs: [(expectation, pass_condition_sql_over_metric)] where the
    condition references the metric via the `{m}` placeholder (e.g.
    "{m} >= 1.0"). Returns (expectation STRING, metric DOUBLE,
    passed BOOLEAN), one row per spec, computed in one pass."""
    aggs = [e.metric.alias(f"_m{i}") for i, (e, _) in enumerate(specs)]
    row = df.agg(*aggs)
    legs = ", ".join(
        f"'{e.name}', _m{i}, ({cond.format(m=f'_m{i}')})"
        for i, (e, cond) in enumerate(specs)
    )
    return row.select(
        F.expr(
            f"stack({len(specs)}, {legs}) AS (expectation, metric, passed)"
        )
    )
