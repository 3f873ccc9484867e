"""Clamped (floor-at-zero) running balance — the inventory/account
semantics `bal_i = max(0, bal_{i-1} + delta_i)`.

This recurrence is NON-LINEAR in the prefix sums, so no window
function can express it (a running SUM can go negative and recover;
the clamp makes history matter). It is the canonical case for the
documented U3 escape hatch: a per-key sequential scan via
applyInPandas — Arrow-batched, one group per key, deterministic
given a total order within the key.

Exactness: deltas are pre-scaled to BIGINT (2-decimal money), the
scan is pure integer arithmetic, and the (ts, event_id) sort key is
total — so the result is bit-identical at any partitioning and
engine, and the registry oracle can replay it as a DuckDB recursive
CTE over the same row numbering.

Scale: one shuffle on the key (the grouping), then O(rows) per key
sequentially — a key's history is the unit of sequential work, the
same contract as any stateful stream processor. Group size is
bounded by per-key activity, not corpus size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def clamped_balance(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_col: str,
) -> DataFrame:
    """Per-key clamped scan. `delta_col` must be an integer column
    (pre-scaled). Returns one row per key:
    (key, final_scaled, max_scaled, n_clamps)."""

    # key field type derived from the input schema — a bigint/string/
    # date key must survive the applyInPandas boundary unchanged, not
    # be coerced through a hardcoded int
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, True),
            T.StructField("final_scaled", T.LongType(), True),
            T.StructField("max_scaled", T.LongType(), True),
            T.StructField("n_clamps", T.LongType(), True),
        ]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        bal = 0
        mx = 0
        clamps = 0
        for d in pdf[delta_col].astype("int64"):
            nb = bal + int(d)
            if nb < 0:
                nb = 0
                clamps += 1
            bal = nb
            if bal > mx:
                mx = bal
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "final_scaled": [bal],
                "max_scaled": [mx],
                "n_clamps": [clamps],
            }
        )

    cols = [key_col, *order_cols, delta_col]
    return (
        df.select(*cols)
        .groupBy(key_col)
        .applyInPandas(scan, schema=out_schema)
        .withColumn("final_scaled", F.col("final_scaled").cast("long"))
        .withColumn("max_scaled", F.col("max_scaled").cast("long"))
        .withColumn("n_clamps", F.col("n_clamps").cast("long"))
    )
