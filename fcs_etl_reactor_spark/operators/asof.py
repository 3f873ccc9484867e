"""As-of (point-in-time) join — SURVEY.md §2.3 J7.

Spark has no native as-of join; a naive range self-join is O(n·m) per
key. This is the union+window rewrite: tag both sides, union, sort each
key's rows by time, and carry the last-seen right-side values forward
with last(ignorenulls) over an unbounded-preceding frame.

Cost model: ONE shuffle (hash partition on the key) + per-key sort.
State while scanning is a single row of right-side values per key, so
the operator scales to arbitrarily many rows per key — exactly the plan
you want at 100 TB, and the same shape Structured Streaming uses for
stream-stream point-in-time enrichment.

Semantics: backward as-of, inclusive (right.ts <= left.ts), matching
DuckDB's ``ASOF LEFT JOIN`` (the oracle for q16_asof_join). Rows on the
right with equal timestamps for the same key are resolved by input
order (ambiguous in DuckDB too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    aliases: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (left join:
    unmatched left rows keep nulls)."""
    keys = [on] if isinstance(on, str) else list(on)
    aliases = aliases or right_values
    val_types = {f.name: f.dataType for f in right.select(*right_values).schema.fields}

    lhs = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    for src, dst in zip(right_values, aliases):
        lhs = lhs.withColumn(f"__asof_{dst}", F.lit(None).cast(val_types[src]))

    rhs_cols = [F.col(k) for k in keys] + [
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
    ] + [F.col(src).alias(f"__asof_{dst}") for src, dst in zip(right_values, aliases)]
    rhs = right.select(*rhs_cols)

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows (side 0) sort before left rows at equal timestamps →
    # inclusive (<=) semantics.
    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for dst in aliases:
        unioned = unioned.withColumn(
            dst, F.last(f"__asof_{dst}", ignorenulls=True).over(w)
        )

    drop = [_TS, _SIDE] + [f"__asof_{dst}" for dst in aliases]
    return unioned.filter(F.col(_SIDE) == 1).drop(*drop)
