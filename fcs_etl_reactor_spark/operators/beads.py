"""Bead-peak detection + calibration-curve fit — SURVEY.md §2.9 C3.

The reference color model (reconstructed from public TASBE docs)
calibrates arbitrary fluorescence units to MEFL by running beads with
known fluorophore quantities, finding the histogram peaks of the bead
channel, and fitting log10(MEFL) ~ log10(peak value) linearly.

Spark decomposition:
1. histogram per sample×channel on a log10 grid (A11 — built-ins),
2. local-maximum test with lag/lead over the bin axis (W2),
3. per-sample least-squares fit via ``applyInPandas`` + np.polyfit
   (U3 grouped-map: model fitting is per-GROUP work, tiny after the
   histogram reduction — the 100 TB-safe shape: the raw events never
   leave the executors; only |bins| rows per sample reach the fit).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def log_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    step: float = 0.02,
    n_bins: int = 256,
) -> DataFrame:
    """log10-grid histogram: (groups..., bin, bin_center, n)."""
    groups = group_cols or ["sample_id"]
    raw = F.floor((F.log10(value_col) - F.lit(lo)) / F.lit(step))
    b = F.least(F.greatest(raw.cast("long"), F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(F.col(value_col) > 0)
        .select(*groups, b.alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_center", F.lit(lo) + (F.col("bin") + 0.5) * F.lit(step))
    )


def find_peaks(
    hist: DataFrame,
    group_cols: list[str] | None = None,
    min_count: int = 10,
) -> DataFrame:
    """Local maxima over the bin axis: count > both neighbors (missing
    neighbor bins treated as 0 via the lag/lead default)."""
    groups = group_cols or ["sample_id"]
    w = Window.partitionBy(*groups).orderBy("bin")
    prev_n = F.coalesce(F.lag("n").over(w), F.lit(0))
    next_n = F.coalesce(F.lead("n").over(w), F.lit(0))
    prev_bin = F.lag("bin").over(w)
    next_bin = F.lead("bin").over(w)
    # a gap in the bin sequence means the neighbor bin had zero count
    prev_eff = F.when(prev_bin == F.col("bin") - 1, prev_n).otherwise(F.lit(0))
    next_eff = F.when(next_bin == F.col("bin") + 1, next_n).otherwise(F.lit(0))
    return (
        hist.withColumn("is_peak",
                        (F.col("n") > prev_eff) & (F.col("n") >= next_eff)
                        & (F.col("n") >= min_count))
        .filter(F.col("is_peak"))
        .drop("is_peak")
    )


_FIT_SCHEMA = StructType(
    [
        StructField("sample_id", StringType(), False),
        StructField("slope", DoubleType(), True),
        StructField("intercept", DoubleType(), True),
        StructField("n_peaks", LongType(), False),
    ]
)


def fit_calibration(
    peaks: DataFrame,
    known_log_mefl: list[float],
    sample_col: str = "sample_id",
) -> DataFrame:
    """Least-squares log-log fit per sample: the k brightest detected
    peaks (by bin_center) are matched in order to the top-k known bead
    log10(MEFL) values; returns slope/intercept per sample."""
    known = sorted(known_log_mefl)

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        sid = pdf[sample_col].iloc[0]
        xs = np.sort(pdf["bin_center"].to_numpy(dtype=float))
        k = min(len(xs), len(known))
        if k < 2:
            return pd.DataFrame(
                {"sample_id": [sid], "slope": [None], "intercept": [None],
                 "n_peaks": [len(xs)]}
            )
        ys = np.array(known[-k:])
        slope, intercept = np.polyfit(xs[-k:], ys, 1)
        return pd.DataFrame(
            {"sample_id": [sid], "slope": [float(slope)],
             "intercept": [float(intercept)], "n_peaks": [len(xs)]}
        )

    return peaks.groupBy(sample_col).applyInPandas(_fit, _FIT_SCHEMA)


def calibrate(df: DataFrame, value_col: str, slope: float, intercept: float) -> DataFrame:
    """Apply a fitted curve: mefl = 10^(slope·log10(x) + intercept)
    (C2 log-domain calibration as a pure expression)."""
    return df.withColumn(
        f"{value_col}_mefl",
        F.pow(F.lit(10.0), F.lit(slope) * F.log10(value_col) + F.lit(intercept)),
    )
