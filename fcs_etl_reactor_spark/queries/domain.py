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
