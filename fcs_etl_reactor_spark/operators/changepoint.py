"""Change-point LOCATION estimation (CUSUM argmax — Page 1954 /
Pettitt's statistic numerator) over grouped integer series.

The statistic for a series c_1..c_n with prefix sums S_t and total
S_n is D_t = n·S_t − t·S_n: the (scaled) deviation of the prefix sum
from the no-change straight line. For a clean single level shift at
position k, |D_t| rises linearly to its peak exactly at t = k and
falls linearly to 0 at t = n, so argmax_t |D_t| IS the change point —
property-tested against the pure-Python twin below. Inputs are exact
integers (counts), so D_t is pure BIGINT: no scaling, no float drift,
bit-identical across engines and partitionings.

Scale shape: prefix sums and the argmax are windows PARTITIONED BY
the group column (series length = rows per group, never a global
window); per-group totals come from one map-side-combinable groupBy
joined back on the group key. One output row per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as WindowSpec
from pyspark.sql import functions as F


def cusum_location(
    series: DataFrame, group_col: str, order_col: str, value_col: str
) -> DataFrame:
    """Per-group change-point location over an integer-valued series:
    returns one row (group_col, cp_<order_col>, d_abs, n_points) per
    group — the order value AFTER WHICH the level shifts, ties broken
    by the earliest order value. The boundary split t = n is excluded
    (D_n = 0 identically; splitting after the last point is not a
    split).

    Contract: (group_col, order_col) must be UNIQUE — with duplicate
    order values the series itself is ill-defined (which duplicate
    comes first?); pre-aggregate duplicates (e.g. sum per day) before
    calling. Groups with a single row produce NO output row: a
    1-point series admits no split (mirrors the n >= 2 ValueError in
    ``cusum_location_reference``)."""
    wseq = WindowSpec.partitionBy(group_col).orderBy(order_col)
    # ROWS frame, not the default RANGE: RANGE would give peer rows
    # (duplicate order values) one shared prefix sum while row_number
    # still hands them distinct t, yielding wrong and nondeterministic
    # D_t. With the uniqueness contract the two frames agree, but ROWS
    # makes the prefix sum match the reference twin even if a caller
    # violates the contract.
    wrows = wseq.rowsBetween(WindowSpec.unboundedPreceding, WindowSpec.currentRow)
    seq = series.select(
        group_col,
        order_col,
        F.row_number().over(wseq).alias("_t"),
        F.sum(value_col).over(wrows).alias("_s"),
    )
    tot = series.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_tot")
    )
    d = (
        seq.join(tot, group_col)
        .filter(F.col("_t") < F.col("_n"))
        .select(
            group_col,
            F.col(order_col).alias(f"cp_{order_col}"),
            F.abs(
                F.col("_n") * F.col("_s") - F.col("_t") * F.col("_tot")
            ).alias("d_abs"),
            F.col("_n").alias("n_points"),
        )
    )
    warg = WindowSpec.partitionBy(group_col).orderBy(
        F.col("d_abs").desc(), F.col(f"cp_{order_col}").asc()
    )
    return (
        d.withColumn("_rn", F.row_number().over(warg))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cusum_location_reference(values: list[int]) -> tuple[int, int]:
    """Pure-Python twin of ``cusum_location`` for property tests:
    returns (t, |D_t|) with t the 1-based position of the argmax over
    t in [1, n-1], ties broken by the smallest t. Requires n >= 2 (a
    single point admits no split)."""
    n = len(values)
    if n < 2:
        raise ValueError(f"cusum_location_reference requires n >= 2, got {n}")
    total = sum(values)
    best_t, best_d, s = 1, -1, 0
    for t in range(1, n):
        s += values[t - 1]
        d = abs(n * s - t * total)
        if d > best_d:
            best_t, best_d = t, d
    return best_t, best_d
