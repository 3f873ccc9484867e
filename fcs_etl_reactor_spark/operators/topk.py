"""Memory-bounded exact per-group top-k (the partial-TopK shuffle).

`row_number() OVER (PARTITION BY g ORDER BY v)` + filter (q44's shape)
is exact but shuffles EVERY row to its group's reducer and sorts the
whole group there — at 100 TB the shuffle volume is the table. The
classic combiner-style alternative keeps only the k best rows per
group per MAP partition (the same idea as map-side partial
aggregation, applied to an order statistic), so the shuffle carries at
most `input_partitions · groups · k` rows no matter how large the
input is, and the final per-group selection runs over that bounded
survivor set.

Exactness is structural, not probabilistic: the global top-k of a
union is the top-k of the union of per-part top-ks (any row outside
its own partition's top-k is dominated by k rows that travel). The
total order is (value, id tiebreak), so both passes and both engines
agree on every tie.

The map side is an Arrow-batched `mapInPandas` with O(groups·k) state
per partition — a pandas sort + groupby-head fold across batches —
deliberately bounded: it never holds a partition's full input. This is
one of the two sanctioned Python surfaces (vectorized, not per-row);
the reduce side is a plain JVM window over the survivors.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partial_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Exact top-k rows per group by (order_col, id_col-ascending
    tiebreak): returns the selected rows of ``df.select(group_cols +
    [order_col, id_col])`` plus a `rk` rank column (1..k, dense-free
    row_number — ties broken by id so ranking is total).

    Equivalent to the window-filter form, with the shuffle bounded to
    the per-partition survivors. k must be >= 1.

    Caller contract: id_col must be non-null — it is the tiebreak that
    makes the order total, and pandas and Spark order NULL ids
    differently. The check lives inside the map task (the first place
    the data is seen without an extra driver-side pass), so a
    violation surfaces as a wrapped PythonException at action time,
    not a fast driver-side error.
    """
    if k < 1:
        raise ValueError(f"partial_topk requires k >= 1, got {k}")
    from pyspark.sql.types import DoubleType, FloatType

    cols = [*group_cols, order_col, id_col]
    out = df.select(*cols)
    # NULL/NaN-safe total order matching the plain-window semantics
    # (Spark defaults: asc => NULLS FIRST, desc => NULLS LAST; NaN is
    # greater than any double, so first under desc / last under asc).
    # Arrow hands pandas NULL and NaN as the same NaN for doubles, so
    # the class MUST be computed JVM-side where the two are still
    # distinguishable; pandas then sorts on (cls, value, id) and never
    # needs na_position at all — rows whose value is NA all live in a
    # cls of their own, where the id tiebreak alone orders them.
    null_ = F.col(order_col).isNull()
    nan = (
        F.isnan(F.col(order_col))
        if isinstance(out.schema[order_col].dataType, (DoubleType, FloatType))
        else F.lit(False)
    )
    if descending:
        cls = F.when(nan, 0).when(null_, 2).otherwise(1)
    else:
        cls = F.when(null_, 0).when(nan, 2).otherwise(1)
    out = out.withColumn("__cls", cls.cast("tinyint"))
    schema = out.schema
    by = [*group_cols, "__cls", order_col, id_col]
    asc = [True] * len(group_cols) + [True, not descending, True]

    def local_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        state: pd.DataFrame | None = None
        for pdf in batches:
            if pdf[id_col].isna().any():
                raise ValueError(
                    "partial_topk: id_col must be non-null (it is the "
                    "tiebreak that makes the order total; NULL ids order "
                    "differently in pandas and Spark)"
                )
            cur = pd.concat([state, pdf]) if state is not None else pdf
            cur = cur.sort_values(by, ascending=asc, kind="mergesort")
            # fold: keep at most k rows per group across batches —
            # state stays O(groups·k) regardless of partition size.
            # dropna=False: pandas groupby silently discards NULL
            # group keys by default, but a window PARTITION BY treats
            # NULL as a regular partition value — the two sides must
            # agree or null-group rows vanish from the top-k
            state = cur.groupby(group_cols, sort=False, dropna=False).head(k)
        if state is not None and len(state):
            yield state

    survivors = out.mapInPandas(local_topk, schema)
    order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    # __cls leads the reduce-side order too: within a cls there are no
    # NULLs and no NaNs, so Spark's null/NaN placement rules can never
    # disagree with the map-side pandas sort
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__cls").asc(), order, F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("__cls")
    )


def partial_topk_reference(
    rows: list[tuple], n_groups_cols: int, k: int, descending: bool = True
) -> list[tuple]:
    """Pure-Python twin for property tests: rows are (group..., value,
    id); returns the selected rows + rank, sorted, same (cls, value,
    id) total order as partial_topk — value None and float NaN follow
    the Spark-default window placement (asc: NULLS FIRST, NaN last;
    desc: NaN first, NULLS LAST)."""
    import math

    if k < 1:
        raise ValueError(f"partial_topk_reference requires k >= 1, got {k}")

    def key(r):
        v = r[n_groups_cols]
        is_nan = isinstance(v, float) and math.isnan(v)
        if descending:
            cls = 0 if is_nan else (2 if v is None else 1)
        else:
            cls = 0 if v is None else (2 if is_nan else 1)
        vv = 0 if cls != 1 else (-v if descending else v)
        return (cls, vv, r[n_groups_cols + 1])

    groups: dict[tuple, list[tuple]] = {}
    for r in rows:
        groups.setdefault(tuple(r[:n_groups_cols]), []).append(r)
    out = []
    for g, members in groups.items():
        members.sort(key=key)
        for i, r in enumerate(members[:k], start=1):
            out.append((*r, i))
    def canon(x):
        # canonical-comparison sort only (tests compare sorted lists);
        # None/NaN aren't orderable by plain tuple comparison
        if x is None:
            return (2, 0)
        if isinstance(x, float) and math.isnan(x):
            return (1, 0)
        return (0, x)

    out.sort(key=lambda r: tuple(canon(x) for x in r))
    return out
