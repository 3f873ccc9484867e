"""Domain operators — the FCS pipeline re-expressed relationally
(SURVEY.md §2.9 C1-C5).

The reference pipeline (reconstructed in SURVEY §0.2; the checkout at
/root/reference is empty) is: compensate (spillover matrix multiply) →
calibrate (per-channel affine/log to MEFL) → gate → summarize →
histogram. The fixtures have no multi-channel FCS table, so C1/C2 are
exercised on a 3-"channel" frame built from lineitem measures — the
operator shape (broadcast matrix → generated per-row expressions) is
identical for real 12-channel cytometry data.

Scale: compensation is a per-row dense matvec with a broadcast
(channels × channels) matrix — generated column expressions keep it
inside WholeStageCodegen, zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.operators.compensation import compensate
from fcs_etl_reactor_spark.queries import query

# 3×3 inverse-spillover matrix for the synthetic channels
# (qty, price_k, disc); rows = output channel weights.
_COMP = [
    [1.0, -0.02, -0.001],
    [-0.05, 1.0, -0.002],
    [-0.01, -0.03, 1.0],
]
_CHANNELS = ["ch_qty", "ch_price_k", "ch_disc"]


def _channel_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").alias("sample_id"),
        F.col("l_linenumber").alias("event_no"),
        F.col("l_quantity").alias("ch_qty"),
        (F.col("l_extendedprice") / 1000.0).alias("ch_price_k"),
        (F.col("l_discount") * 100.0).alias("ch_disc"),
    )


def _comp_sql_expr(i: int) -> str:
    terms = " + ".join(
        f"({_COMP[i][j]!r}) * ch_{n}" for j, n in enumerate(["qty", "price_k", "disc"])
    )
    return terms


@query(
    "q70_compensation",
    oracle=f"""
    WITH ch AS (
      SELECT
        l_orderkey AS sample_id,
        l_linenumber AS event_no,
        l_quantity AS ch_qty,
        l_extendedprice / 1000.0 AS ch_price_k,
        l_discount * 100.0 AS ch_disc
      FROM lineitem
    )
    SELECT
      sample_id, event_no,
      {_comp_sql_expr(0)} AS comp_ch_qty,
      {_comp_sql_expr(1)} AS comp_ch_price_k,
      {_comp_sql_expr(2)} AS comp_ch_disc
    FROM ch
    """,
)
def q70_compensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: spillover compensation as generated expressions."""
    ch = _channel_frame(spark, sf_dir)
    return compensate(ch, _CHANNELS, _COMP, keep=["sample_id", "event_no"])


@query(
    "q71_calibration",
    oracle="""
    SELECT
      l_orderkey AS sample_id,
      l_linenumber AS event_no,
      2.5 * l_quantity + 10.0 AS mefl_linear,
      ROUND(POW(10, 0.8 * LOG10(l_extendedprice) + 0.2), 6) AS mefl_log
    FROM lineitem
    WHERE l_extendedprice > 0
    """,
)
def q71_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: per-channel affine + log-domain calibration (MEFL units)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return l.select(
        F.col("l_orderkey").alias("sample_id"),
        F.col("l_linenumber").alias("event_no"),
        (2.5 * F.col("l_quantity") + 10.0).alias("mefl_linear"),
        F.round(F.pow(F.lit(10.0), 0.8 * F.log10("l_extendedprice") + 0.2), 6).alias(
            "mefl_log"
        ),
    )


# --------------------------------------------------------------------------
# q72 — long→wide pivot (C4): per-user event-type counts as columns.
# Values list is pinned so the schema is static (no extra pass) — at
# scale an unpinned pivot does a distinct scan first.
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "q72_pivot_wide",
    oracle="""
    SELECT
      user_id,
      COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      COUNT(*) FILTER (WHERE event_type = 'view') AS view,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
)
def q72_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# --------------------------------------------------------------------------
# q73 — wide→long unpivot (C4 reverse): lineitem measures to tidy
# (key, channel, value) triples — the engine-internal long format for
# dynamic-channel FCS data (SURVEY §1.1).
# --------------------------------------------------------------------------


@query(
    "q73_unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'qty' AS channel, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM lineitem
    """,
)
def q73_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount)"
            " AS (channel, value)"
        ),
    )


# --------------------------------------------------------------------------
# q75 — multimodal binary pipeline (L6, rows-only): fixture documents
# become binary blobs (per-lang magic header + utf-8 payload), then the
# REAL media plumbing runs: magic-number sniffing and Arrow-batched
# byte-histogram "feature extraction" (the stub decoder — no codecs in
# this container), aggregated per detected modality. Deterministic:
# scaled-integer sums.
# --------------------------------------------------------------------------


@query("q75_multimodal_features")
def q75_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.multimodal import (
        extract_features,
        sniff_media,
    )

    d = load(spark, sf_dir, "documents")
    header = (
        F.when(F.col("lang") == "en", F.lit(b"\x89PNG\r\n"))
        .when(F.col("lang") == "de", F.lit(b"\xff\xd8\xff\xe0"))
        .when(F.col("lang") == "fr", F.lit(b"RIFF\x00\x00"))
        .when(F.col("lang") == "es", F.lit(b"ID3\x03"))
        .otherwise(F.lit(b"\x00\x00\x00\x18ftyp"))
    )
    blobs = d.select(
        F.col("doc_id").cast("string").alias("path"),
        F.concat(header, F.encode("text", "utf-8")).alias("content"),
    )
    feats = extract_features(sniff_media(blobs), feature_dim=8)
    f1 = F.element_at("feature", 1).cast("double")
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        (
            F.sum(F.floor(f1 * F.lit(1e9) + F.lit(0.5)).cast("long")).cast("double")
            / F.lit(1e9)
        ).alias("sum_feat1"),
    )


# --------------------------------------------------------------------------
# q76 — FCS write→parse roundtrip (S4, rows-only): each event_type
# group becomes one synthetic float64 FCS file (spec-conformant
# header + TEXT + DATA built by make_fcs_bytes), which is immediately
# re-parsed by the production parser and summarized per channel —
# the ingest path exercised end-to-end inside the driver harness, on
# fixture-derived input. applyInPandas = one task per sample; at
# 100 TB samples are independent files (embarrassingly parallel).
# --------------------------------------------------------------------------


@query("q76_fcs_roundtrip")
def q76_fcs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.sources.fcs import make_fcs_bytes, parse_fcs_bytes

    e = load(spark, sf_dir, "events")

    def roundtrip(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("event_id")
        sample = str(pdf["event_type"].iloc[0])
        mat = np.column_stack(
            [
                pdf["value"].to_numpy(np.float64),
                pdf["user_id"].to_numpy(np.float64),
            ]
        )
        blob = make_fcs_bytes(["VAL", "USER"], mat, datatype="D")
        _, channels, parsed = parse_fcs_bytes(blob)
        rows = []
        for i, ch in enumerate(channels):
            col = parsed[:, i]
            s = int(np.floor(col * 1e6 + 0.5).astype(np.int64).sum())
            rows.append((sample, ch, len(col), s / 1e6 / len(col)))
        return pd.DataFrame(rows, columns=["sample_id", "channel", "n", "mean_value"])

    return e.select("event_type", "event_id", "user_id", "value").groupBy(
        "event_type"
    ).applyInPandas(
        roundtrip, "sample_id string, channel string, n bigint, mean_value double"
    )


# --------------------------------------------------------------------------
# q77 — bead-calibration chain (C3, rows-only): the TASBE color-model
# shape run on fixture data — events.value per event_type as the
# pseudo-bead samples: log10 histogram (A11) → lag/lead local-maxima
# peaks (W2) → per-sample np.polyfit via applyInPandas (U3). Raw rows
# never leave the executors; only ≤n_bins rows per sample reach the
# fit — the 100 TB-safe decomposition.
# --------------------------------------------------------------------------


@query("q77_bead_calibration")
def q77_bead_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.beads import (
        find_peaks,
        fit_calibration,
        log_histogram,
    )

    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("sample_id"), "value"
    )
    hist = log_histogram(e, "value", ["sample_id"], lo=0.0, step=0.05, n_bins=64)
    peaks = find_peaks(hist, ["sample_id"], min_count=5)
    # known bead quantities: log10(MEFL) ladder (public TASBE-style)
    return fit_calibration(peaks, [2.0, 2.8, 3.5, 4.1, 4.7, 5.2])
