"""Distributed total ordering (SURVEY.md §2.11 L10 scale path).

A global `row_number() OVER (ORDER BY ...)` funnels every row through
ONE reducer — fine for a demo, fatal at 100 TB. The distributed form
is the classic two-pass zipWithIndex: partition the key space into
contiguous ranges, count (or sum) per range, prefix the range totals
on the driver (≤ #buckets integers — never row data), then assign
rank = bucket offset + local position inside the sorted bucket.

DESIGN NOTE — why buckets, not `repartitionByRange` partition ids.
The obvious implementation range-partitions once and keys the driver
offsets by `spark_partition_id()`. That is WRONG under re-execution:
the offsets job and the assignment job are separate actions, each
re-plans the exchange, and RangePartitioner draws its boundary sample
with an RDD-id-dependent seed — so whenever upstream partitions are
larger than the reservoir (observed at sf0.1: 13k grouped rows in 32
partitions), the two passes can pick DIFFERENT boundaries and the
pid-keyed offsets silently misalign (caught by the q4v/q4w oracle
differ as a constant cumulative shift mid-keyspace).

Here the bucket id is a PURE EXPRESSION of the row: boundaries are
computed once (driver-side, approxQuantile over a monotone numeric
surrogate of the first sort key) and embedded as literals. Both
passes therefore agree on every row's bucket by construction, no
matter how the physical partitioning falls. Hash-partitioning on the
bucket id co-locates each bucket in one task; a task may hold several
buckets, walked in (bucket, key) sort order. The assigned ranks are a
pure function of the TOTAL order (key, tiebreak), so the output is
deterministic — and partition-count invariant — even though boundary
QUALITY (balance) depends on the quantile sketch.

NaN sorts last and NULL sorts first, matching Spark's ordering;
equal first-keys always share a bucket, so multi-column tiebreaks
never straddle a boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: buckets per shuffle partition: >1 so hash placement of whole
#: buckets still balances tasks when one bucket lands with another.
_BUCKETS_PER_PART = 2

#: logical-plan node names whose presence makes the upstream worth
#: materializing before a multi-pass ordering: anything that shuffles,
#: aggregates, or crosses the Python boundary is more expensive to
#: re-execute (3x here) than to store once. A plan WITHOUT any of
#: these is a scan/filter/project chain — re-scanning pruned parquet
#: twice is cheaper than writing the whole input to executor storage
#: (and at 100 TB, enormously so), so those callers now skip the
#: checkpoint (round 12; VERDICT r11 "What's wrong" #2).
_EXPENSIVE_NODES = (
    "Join", "Aggregate", "Window", "Generate", "Sort", "Expand",
    "EvalPython", "InPandas", "InArrow", "MapGroups", "Distinct",
    "Deduplicate", "Union", "CoGroup",
)

#: NON-DETERMINISTIC across re-executions: the multi-pass boundary/
#: offsets/assignment jobs must agree on the exact row set, which only
#: a LINEAGE-TRUNCATING materialization guarantees (a lineage-retaining
#: persist can recompute a lost block to a DIFFERENT row set) — these
#: always localCheckpoint regardless of the configured mode. Substring
#: match over the optimized-plan string; a match triggered by a data
#: literal (a filter on the text "rand(") only costs an unnecessary
#: materialization, never a missed one, so false positives are safe.
_NONDETERMINISTIC_MARKS = (
    "Limit", "Sample", "Offset", "Tail",
    "rand(", "randn(", "uuid(", "monotonically_increasing_id",
    "shuffle(", "spark_partition_id", "input_file",
)


def _materialize_multipass_input(df: DataFrame) -> DataFrame:
    """Materialize the caller's upstream before an inherently
    multi-pass ordering (approxQuantile boundary job + per-bucket
    offsets job + the ranked execution), CONDITIONALLY:

    - a bare scan/filter/project upstream is returned as-is — cheaper
      to re-scan than to store (column pruning / predicate pushdown
      still reach the scan on every pass);
    - an upstream that is already a materialized RDD (LogicalRDD from
      an earlier checkpoint) is returned as-is;
    - anything with a shuffle/aggregate/Python stage is stored once.

    Storage mode is selected by the session conf
    ``spark.fcs_etl.materialize.mode``:

    - ``local`` (default): ``localCheckpoint`` — fastest, but blocks
      live unreplicated on executors, so an executor loss kills the
      job. The right default for this repo's single-process bench.
    - ``persist_disk``: ``persist(StorageLevel.DISK_ONLY_2)`` — blocks
      on disk with a second replica, so the multi-pass plan survives a
      lost executor (recompute falls back to lineage, which persist —
      unlike checkpoint — retains). The cluster/fault-tolerant mode
      for DETERMINISTIC upstreams; a plan containing a
      non-deterministic node (limit/sample/rand/...) still gets
      localCheckpoint even in this mode, because a lineage recompute
      of a twice-lost block could rebuild a DIFFERENT row set and
      silently misalign the passes — fail-stop beats silent
      corruption there.
    - ``none``: never materialize (the pre-r11 behavior; every pass
      re-executes the upstream).
    """
    mode = "local"
    try:
        mode = df.sparkSession.conf.get("spark.fcs_etl.materialize.mode", "local")
    except Exception:
        pass
    if mode == "none":
        return df
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        plan = None
    nondet = plan is None or any(n in plan for n in _NONDETERMINISTIC_MARKS)
    if (
        plan is not None
        and not nondet
        and not any(n in plan for n in _EXPENSIVE_NODES)
    ):
        return df
    try:
        if mode == "persist_disk" and not nondet:
            from pyspark import StorageLevel

            return df.persist(StorageLevel.DISK_ONLY_2)
        return df.localCheckpoint(eager=True)
    except Exception:
        return df  # materialization is an optimization, not a need


def _numeric_surrogate(df: DataFrame, key: Column) -> Column:
    """A double-valued expression MONOTONE (non-strictly) in ``key``'s
    sort order, used only to place bucket boundaries — collisions just
    coarsen buckets, they never reorder rows. Strings ride their first
    7 UTF-8 bytes (zero-padded so prefixes stay below extensions —
    byte order == Spark's UTF8String comparison); temporals ride the
    epoch; numerics cast (double rounding of wide BIGINTs is monotone
    non-strict)."""
    dtype = df.select(key.alias("_k")).schema[0].dataType
    if isinstance(dtype, T.StringType):
        padded = F.rpad(F.encode(key, "utf-8"), 7, F.lit(bytearray(b"\x00")))
        return F.conv(F.hex(padded), 16, 10).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(key).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(key, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, T.BooleanType):
        return key.cast("int").cast("double")
    return key.cast("double")



def _normalize(order_by) -> list[tuple[Column, bool]]:
    """Normalize order keys to (expression Column, is_desc). Descending
    order is requested with a ("name"|Column, "desc") tuple — a raw
    Column.desc() is a SortOrder, which cannot be re-wrapped into the
    bucket expression, so it is rejected with a pointer to the tuple
    form."""
    out: list[tuple[Column, bool]] = []
    for entry in order_by:
        desc = False
        if isinstance(entry, tuple):
            entry, direction = entry
            desc = str(direction).lower() == "desc"
        col = F.col(entry) if isinstance(entry, str) else entry
        rep = str(col)
        if rep.endswith("NULLS FIRST'>") or rep.endswith("NULLS LAST'>"):
            raise TypeError(
                "pass (column, 'desc') instead of Column.desc() — a "
                "SortOrder cannot be composed into the bucket expression"
            )
        out.append((col, desc))
    return out


def _bucket_expr(
    df: DataFrame, key: Column, n_buckets: int, desc: bool = False
) -> Column:
    """0-based contiguous bucket id as a pure row expression: boundary
    literals from one approxQuantile pass over the surrogate. NULL
    surrogate → bucket 0 for ascending (nulls-first) and the top bucket
    for descending (nulls-last), matching Spark's sort placement. NaN
    lands in the top bucket (NaN-last) for ascending; descending float
    keys containing NaN are not supported (NaN negates to itself)."""
    skey = _numeric_surrogate(df, key)
    if desc:
        skey = -skey
    probed = df.select(skey.alias("_bkey"))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = probed.stat.approxQuantile("_bkey", probs, 1.0 / (4 * n_buckets))
    # de-dup (sketch may repeat) and drop non-finite sentinels
    uniq: list[float] = []
    for b in bounds:
        if b == b and b not in uniq:  # b==b filters NaN
            uniq.append(b)
    expr = F.lit(0)
    for b in uniq:
        expr = expr + F.when(skey > F.lit(b), 1).otherwise(0)
    # NaN > literal is true in Spark SQL (NaN sorts/compares largest),
    # so NaN rows already land in the top bucket; NULL comparisons take
    # the otherwise(0) branch — bucket 0, nulls-first, for ascending.
    # Descending keys sort nulls LAST, so override them to the top.
    if desc:
        expr = F.when(key.isNull(), F.lit(len(uniq))).otherwise(expr)
    return expr.cast("int")


def _prefix_offsets(totals: dict[int, int]) -> dict[int, int]:
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    return offsets


def global_rank(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense global rank by ``order_by`` without a
    single-reducer window. One hash shuffle on the bucket id + one
    count-only job; ranks are exact and gap-free.

    The input is localCheckpoint-materialized first: this operator is
    inherently multi-pass (approxQuantile boundary job + per-bucket
    count job + the ranked execution itself), so without it the
    caller's upstream plan executes 3× PER RANK — and chained rank
    calls (q3f's three NTILE axes, q1o's two rank passes) re-execute
    every earlier rank's shuffle+assignment inside every later rank's
    build jobs, a quadratic recompute stack (measured: q3f 8.0 →
    2.6 s cold at sf0.1). Round 12 made the materialization CONDITIONAL
    (bare-scan upstreams re-scan instead — cheaper than storing them,
    at any scale) and mode-selectable (persist_disk for cluster fault
    tolerance); see _materialize_multipass_input."""
    df = _materialize_multipass_input(df)
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    keys = _normalize(order_by)
    bucket = _bucket_expr(
        df, keys[0][0], n_parts * _BUCKETS_PER_PART, desc=keys[0][1]
    )
    with_b = df.withColumn("_bucket", bucket)
    sort_cols = [c.desc() if d else c for c, d in keys]

    # pass 1: exact per-bucket counts -> prefix offsets (driver holds
    # ≤ #buckets integers, never rows). Bucket membership is a pure
    # expression, so this count and the assignment pass below agree on
    # every row no matter how either job is physically partitioned.
    counts = {
        r["_bucket"]: r["cnt"]
        for r in with_b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = _prefix_offsets(counts)

    ordered = with_b.repartition(n_parts, "_bucket").sortWithinPartitions(
        "_bucket", *sort_cols
    )
    # copy the fields: StructType.add mutates, and df._schema is cached
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(rank_col, T.LongType(), False)]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive sorted by (bucket, key); a task may hold several
        # whole buckets, each contiguous — vectorized arange per bucket
        # run, with (cur, pos) carrying a bucket split across batches
        cur, pos = None, 0
        for pdf in batches:
            ranks = np.empty(len(pdf), dtype="int64")
            i = 0
            for b, m in zip(*np.unique(pdf["_bucket"].to_numpy(), return_counts=True)):
                if b != cur:
                    cur, pos = b, offsets[int(b)]
                ranks[i : i + m] = np.arange(pos + 1, pos + m + 1)
                pos += int(m)
                i += int(m)
            out = pdf.drop(columns=["_bucket"])
            out[rank_col] = ranks
            yield out

    return ordered.mapInPandas(_assign, out_schema)


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
    bucket-keyed two-pass shape as :func:`global_rank`; a `SUM() OVER
    (ORDER BY ...)` with no PARTITION BY funnels every row through one
    reducer).

    pass 1: exact per-bucket value sums → prefix offsets on the driver
    (≤ #buckets integers); pass 2: per-bucket pandas cumsum + offset.
    ``exclusive=True`` yields the sum of STRICTLY PRECEDING rows (the
    ROWS UNBOUNDED PRECEDING AND 1 PRECEDING frame used by greedy
    packing). Values must be integral — exact at any partition count;
    float prefix sums would be order-of-association dependent.

    Input is conditionally materialized for the same multi-pass
    reason as :func:`global_rank` (see _materialize_multipass_input).
    """
    df = _materialize_multipass_input(df)
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    keys = _normalize(order_by)
    bucket = _bucket_expr(
        df, keys[0][0], n_parts * _BUCKETS_PER_PART, desc=keys[0][1]
    )
    with_b = df.withColumn("_bucket", bucket)
    sort_cols = [c.desc() if d else c for c, d in keys]

    sums = {
        r["_bucket"]: int(r["s"] or 0)
        for r in with_b.groupBy("_bucket").agg(F.sum(value_col).alias("s")).collect()
    }
    offsets = _prefix_offsets(sums)

    ordered = with_b.repartition(n_parts, "_bucket").sortWithinPartitions(
        "_bucket", *sort_cols
    )
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType(), False)]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur, running = None, 0
        for pdf in batches:
            v = pdf[value_col].fillna(0).astype("int64").to_numpy()
            cs = np.empty(len(pdf), dtype="int64")
            i = 0
            for b, m in zip(*np.unique(pdf["_bucket"].to_numpy(), return_counts=True)):
                if b != cur:
                    cur, running = b, offsets[int(b)]
                seg = v[i : i + m].cumsum() + running
                cs[i : i + m] = (seg - v[i : i + m]) if exclusive else seg
                running = int(seg[-1])
                i += int(m)
            out = pdf.drop(columns=["_bucket"])
            out[out_col] = cs
            yield out

    return ordered.mapInPandas(_assign, out_schema)
