"""Mergeable quantile sketch (A7 family, the rank cousin of the
count-min/HLL/Misra-Gries trio): bounded-memory per-partition
summaries that merge associatively and answer any quantile with a
small rank error — the only way to get percentiles out of 100 TB
without a global sort.

Design (the compactor scheme of the mergeable-summaries / KLL line of
work, made DETERMINISTIC so runs are bit-reproducible):

- build (one pass per partition, O(B) memory): raw values accumulate
  in a buffer; at capacity the buffer is sorted and systematically
  sampled — every m-th order statistic, phase m/2, each kept item
  standing for m dropped neighbours (weight m; the last item absorbs
  the division remainder so Σw == n exactly). Sampled items land in
  a weighted summary; when THAT overflows it is re-compacted by
  weighted systematic resampling at coarser spacing. Each compaction
  of total weight W into t items moves any rank estimate by at most
  W/(2t), so the per-partition error is a short geometric sum —
  bounded, deterministic, and independent of partition count.
- merge: summaries are plain (value, weight) rows; a union of
  sketches IS a sketch (weights add rank-exactly), so merging is
  re-compaction of the concatenated rows. A two-stage tree (group by
  partition-hash, then one final group) keeps every merge input
  bounded: P partitions never funnel into one task.
- query: sort the merged summary by value; the q-quantile estimate is
  the first item whose cumulative weight reaches q·W.

Unlike randomized KLL there is no failure probability — the phase is
fixed — at the cost of a slightly worse constant in the rank-error
bound. The registered query (q1q) checks the observed rank error
against the exact order statistics as its oracle envelope.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SKETCH_SCHEMA = "gid int, v double, w double"

#: Default merged-summary capacity. sketch_merge emits at most
#: SUMMARY_CAP_DEFAULT // 2 rows; consumers that assert on sketch
#: size (q1q's size_ok envelope) must derive their bound from this
#: constant, never hardcode it.
SUMMARY_CAP_DEFAULT = 2048


def _systematic_sample(vals: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Every m-th order statistic of sorted `vals`, phase m//2, with
    weights that sum EXACTLY to len(vals): each kept item weighs m
    except the last, which absorbs the remainder (≤ 2m−1) so the
    summary's total weight never drifts from the true count — the
    'weights add rank-exactly' invariant holds strictly, not just to
    within m−1 per flush. The tail item's rank error is still O(m)."""
    kept = vals[m // 2 :: m]
    if not len(kept):  # m//2 >= len: keep the last value, full weight
        return vals[-1:], np.array([float(len(vals))])
    w = np.full(len(kept), float(m))
    w[-1] = float(len(vals) - m * (len(kept) - 1))
    return kept, w


def _weighted_resample(
    vals: np.ndarray, weights: np.ndarray, target: int
) -> tuple[np.ndarray, np.ndarray]:
    """Re-compact a weighted summary to ≤ target items: pick the item
    covering each cumulative-weight threshold (j+0.5)·W/target. Rank
    error added: ≤ W/(2·target)."""
    order = np.argsort(vals, kind="stable")
    vals, weights = vals[order], weights[order]
    total = float(weights.sum())
    if len(vals) <= target:
        return vals, weights
    spacing = total / target
    thresholds = (np.arange(target) + 0.5) * spacing
    cum = np.cumsum(weights)
    idx = np.searchsorted(cum, thresholds, side="left")
    idx = np.minimum(idx, len(vals) - 1)
    return vals[idx], np.full(len(idx), spacing)


class _PartitionSketch:
    """One pass, O(buf_cap + summary_cap) memory, deterministic."""

    def __init__(self, buf_cap: int = 8192, summary_cap: int = SUMMARY_CAP_DEFAULT):
        self.buf_cap = buf_cap
        self.summary_cap = summary_cap
        self.raw: list[np.ndarray] = []
        self.n_raw = 0
        self.sv = np.empty(0)
        self.sw = np.empty(0)

    def _flush_raw(self) -> None:
        if not self.n_raw:
            return
        vals = np.sort(np.concatenate(self.raw), kind="stable")
        m = max(1, int(np.ceil(len(vals) / (self.summary_cap / 2))))
        kept, kw = _systematic_sample(vals, m)
        self.sv = np.concatenate([self.sv, kept])
        self.sw = np.concatenate([self.sw, kw])
        self.raw, self.n_raw = [], 0
        if len(self.sv) > self.summary_cap:
            self.sv, self.sw = _weighted_resample(
                self.sv, self.sw, self.summary_cap // 2
            )

    def update(self, vals: np.ndarray) -> None:
        self.raw.append(vals)
        self.n_raw += len(vals)
        if self.n_raw >= self.buf_cap:
            self._flush_raw()

    def summary(self) -> tuple[np.ndarray, np.ndarray]:
        self._flush_raw()
        return self.sv, self.sw


def sketch_build(df: DataFrame, value_col: str, fanout: int = 16) -> DataFrame:
    """Per-partition sketches as (gid, v, w) rows; gid pre-assigns the
    stage-1 merge group so P partitions funnel into ≤ fanout tasks,
    never one."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sk = _PartitionSketch()
        for b in batches:
            vals = b[value_col].to_numpy(dtype=np.float64)
            sk.update(vals[~np.isnan(vals)])
        sv, sw = sk.summary()
        yield pd.DataFrame(
            {"gid": np.full(len(sv), pid % fanout, dtype=np.int32), "v": sv, "w": sw}
        )

    return df.select(F.col(value_col).cast("double").alias(value_col)).mapInPandas(
        build, _SKETCH_SCHEMA
    )


def sketch_merge(sketch: DataFrame, summary_cap: int = SUMMARY_CAP_DEFAULT) -> DataFrame:
    """Two-stage tree merge → ONE (gid=0, v, w) summary of ≤
    summary_cap rows. Stage 1 re-compacts each gid group; stage 2
    re-compacts the ≤ fanout·cap/2 survivors."""

    def compact(pdf: pd.DataFrame) -> pd.DataFrame:
        v, w = _weighted_resample(
            pdf["v"].to_numpy(), pdf["w"].to_numpy(), summary_cap // 2
        )
        return pd.DataFrame({"gid": np.zeros(len(v), dtype=np.int32), "v": v, "w": w})

    stage1 = sketch.groupBy("gid").applyInPandas(compact, _SKETCH_SCHEMA)
    return stage1.groupBy("gid").applyInPandas(compact, _SKETCH_SCHEMA)


def sketch_quantiles(merged: DataFrame, qs: list[float]) -> DataFrame:
    """(q, est) per requested quantile: first value whose cumulative
    weight reaches q·W. The merged summary is ≤ summary_cap rows, so
    the window is sketch-bounded, never data-bounded."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy("gid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("gid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    probes = F.array(*[F.lit(float(q)) for q in qs])
    return (
        cum.select(F.explode(probes).alias("q"), "v", "cw", "tw")
        .filter(F.col("cw") >= F.col("q") * F.col("tw"))
        .groupBy("q")
        .agg(F.min("v").alias("est"))
    )
