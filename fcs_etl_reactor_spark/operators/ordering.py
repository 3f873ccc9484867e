"""Distributed total ordering (SURVEY.md §2.11 L10 scale path).

A global `row_number() OVER (ORDER BY ...)` funnels every row through
ONE reducer — fine for a demo, fatal at 100 TB. The distributed form
is the classic two-pass zipWithIndex:

1. range-partition by the sort key (each partition holds a contiguous
   key range) and sort within partitions — a single shuffle;
2. count rows per partition (a cheap scan), prefix-sum the counts on
   the driver (≤ #partitions integers — never row data);
3. rank = partition offset + local position, assigned by an
   Arrow-batched cumulative counter per partition.

The assigned ranks are a pure function of the TOTAL order (key,
tiebreak), not of where the sampled range boundaries happen to fall —
so the output is deterministic even though RangePartitioner picks
boundaries from a sample.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense global rank by ``order_by`` without a
    single-reducer window. One shuffle (range repartition) + one
    count-only job; ranks are exact and gap-free."""
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    # include every sort column in the range partitioning so equal
    # prefixes cannot straddle a boundary out of order
    ordered = df.repartitionByRange(int(n_parts), *cols).sortWithinPartitions(*cols)

    with_pid = ordered.withColumn("_pid", F.spark_partition_id())
    # pass 1: per-partition counts -> prefix offsets (driver holds
    # #partitions integers, never rows)
    counts = dict(
        with_pid.groupBy("_pid").count().collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = with_pid.drop("_pid").schema.add(rank_col, "long", False)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batches arrive in partition order; the closure's counter is
        # per-task state, carrying the local position across batches
        local_pos = 0
        for pdf in batches:
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + local_pos
            local_pos += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out[rank_col] = range(start + 1, start + 1 + len(pdf))
            yield out

    return with_pid.mapInPandas(_assign, out_schema)


def global_cumsum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
    exclusive: bool = False,
) -> DataFrame:
    """Append the running total of integer ``value_col`` over the
    global ``order_by`` order — the distributed prefix sum (same
    two-pass shape as :func:`global_rank`; a `SUM() OVER (ORDER BY
    ...)` with no PARTITION BY funnels every row through one reducer).

    pass 1: per-partition value sums → prefix offsets on the driver
    (≤ #partitions integers); pass 2: Arrow per-partition cumsum +
    offset. ``exclusive=True`` yields the sum of STRICTLY PRECEDING
    rows (the ROWS UNBOUNDED PRECEDING AND 1 PRECEDING frame used by
    greedy packing). Values must be integral — exact at any partition
    count; float prefix sums would be order-of-association dependent.
    """
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ordered = df.repartitionByRange(int(n_parts), *cols).sortWithinPartitions(*cols)

    with_pid = ordered.withColumn("_pid", F.spark_partition_id())
    sums = dict(
        with_pid.groupBy("_pid").agg(F.sum(value_col)).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)

    out_schema = with_pid.drop("_pid").schema.add(out_col, "long", False)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None  # per-task state across batches of one partition
        for pdf in batches:
            pid = int(pdf["_pid"].iloc[0])
            if running is None:
                running = offsets[pid]
            v = pdf[value_col].fillna(0).astype("int64")
            cs = v.cumsum() + running
            running = int(cs.iloc[-1]) if len(cs) else running
            out = pdf.drop(columns=["_pid"])
            out[out_col] = (cs - v) if exclusive else cs
            yield out

    return with_pid.mapInPandas(_assign, out_schema)
