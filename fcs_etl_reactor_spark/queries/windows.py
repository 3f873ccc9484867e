"""Window functions (SURVEY.md §2.5 W1-W6) + per-group normalization (C5).

Window partitioning shuffles once on the partition key and sorts within
partitions — the same cost envelope as a group-by. Every ORDER BY here
carries a unique tiebreaker column so ranking is total and both engines
agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q40 — ranking family (W1): row_number / rank / dense_rank / ntile.
# --------------------------------------------------------------------------


@query(
    "q40_ranking",
    oracle="""
    SELECT
      o_custkey, o_orderkey,
      CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
      CAST(RANK() OVER w AS INTEGER) AS rnk,
      CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
      CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q40_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# q42 — running / framed aggregates (W3): cumulative revenue per
# customer. Decimal-cast inside the window sum keeps the prefix sums
# exact and order-independent of partitioning.
# --------------------------------------------------------------------------


@query(
    "q42_running_total",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend,
      CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS running_orders
    FROM orders
    """,
)
def q42_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


# --------------------------------------------------------------------------
# q43 — ECDF (W4): empirical CDF per channel — the FCS plotting
# primitive (cume_dist over value order). percent_rank alongside.
# --------------------------------------------------------------------------


@query(
    "q43_ecdf",
    oracle="""
    SELECT
      event_type, event_id, value,
      CUME_DIST() OVER w AS ecdf,
      PERCENT_RANK() OVER w AS pct_rank
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def q43_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_type",
        "event_id",
        "value",
        F.cume_dist().over(w).alias("ecdf"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


# --------------------------------------------------------------------------
# q44 — top-k per group (W5): top-3 orders per customer. The window
# filter runs map-side after one shuffle — never a global sort.
# --------------------------------------------------------------------------


@query(
    "q44_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q44_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# q45 — first/last in group (W6): each user's first and latest event —
# expressed as min_by/max_by (one aggregation, no window needed; at
# scale this is cheaper than a window because partial agg kicks in).
# --------------------------------------------------------------------------


@query(
    "q45_first_last",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, ts,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rfirst,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rlast
      FROM events
    )
    SELECT user_id,
      MAX(CASE WHEN rfirst = 1 THEN event_id END) AS first_event_id,
      MAX(CASE WHEN rlast = 1 THEN event_id END) AS last_event_id,
      MIN(ts) AS first_ts,
      MAX(ts) AS last_ts
    FROM ranked GROUP BY user_id
    """,
)
def q45_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_id", F.struct("ts", "event_id")).alias("first_event_id"),
        F.max_by("event_id", F.struct("ts", "event_id")).alias("last_event_id"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# q46 — per-group normalization (C5): z-score within event_type, from
# exact decimal sums (same composition as q21) joined back — a
# broadcast join of the tiny stats table against the fact.
# --------------------------------------------------------------------------


@query(
    "q46_zscore",
    oracle="""
    WITH s AS (
      SELECT
        event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(value * value AS DECIMAL(24,8))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    )
    SELECT
      e.event_id, e.event_type, e.value,
      (e.value - s.sx / s.n)
        / SQRT((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)) AS zscore
    FROM events e JOIN s USING (event_type)
    """,
)
def q46_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,8)"))
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1))
    return (
        e.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - mean) / std).alias("zscore"),
        )
    )


# --------------------------------------------------------------------------
# q47 — time-RANGE window frames (W3's rangeBetween form): per event,
# the trailing-1-hour sum/count of that user's activity. The frame is
# defined on the ORDER BY *value* (epoch seconds), not row offsets, so
# peers at the same timestamp are always included together — identical
# RANGE semantics in both engines. Scaled-long window sums keep the
# trailing sum order-independent.
# --------------------------------------------------------------------------


@query(
    "q47_time_frames",
    oracle="""
    SELECT
      event_id, user_id, ts,
      CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
        / 1000000.0 AS trailing_1h_value,
      COUNT(*) OVER w AS trailing_1h_events
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
    )
    """,
)
def q47_time_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3599, 0)
    )
    scaled = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(scaled).over(w).cast("double") / F.lit(1e6)).alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


# --------------------------------------------------------------------------
# q48 — bounded ROWS frame (W3 completion): trailing 4-row moving
# average per user in (ts, event_id) order. Deterministic: the frame
# is defined by a total order (unique tie-break), sums are scaled
# longs.
# --------------------------------------------------------------------------


@query(
    "q48_moving_avg",
    oracle="""
    SELECT
      event_id, user_id,
      CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
        / 1000000.0 / COUNT(*) OVER w AS moving_avg_4,
      COUNT(*) OVER w AS frame_n
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    )
    """,
)
def q48_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    scaled = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(scaled).over(w).cast("double") / F.lit(1e6) / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_4"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


# --------------------------------------------------------------------------
# q4a — value-picking window functions (W6's window form):
# first_value / nth_value / last_value with an explicit full-partition
# frame — last_value over the DEFAULT frame (unbounded preceding →
# current row) is the classic footgun; the full frame is stated in
# both engines so semantics are identical.
# --------------------------------------------------------------------------


@query(
    "q4a_value_windows",
    oracle="""
    SELECT
      o_custkey, o_orderkey,
      FIRST_VALUE(o_orderkey) OVER w AS best_orderkey,
      NTH_VALUE(o_orderkey, 2) OVER w AS second_orderkey,
      LAST_VALUE(o_orderkey) OVER w AS worst_orderkey
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q4a_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("best_orderkey"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
        F.last("o_orderkey").over(w).alias("worst_orderkey"),
    )


# --------------------------------------------------------------------------
# q3y — GROUPS window frame mode (round-9 mint; the one ANSI frame
# type Spark lacks — SPARK-28648 is open). A GROUPS frame counts PEER
# GROUPS (distinct ORDER BY values), not rows or value distance:
# `GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW` over shipping days is
# "this day and the two previous ACTIVE days", whatever their gaps and
# however many rows each day has. The Spark-first composition is
# exact, not emulated: number the peer groups 1..G, and a RANGE frame
# over that integer IS the GROUPS frame by definition (peer group g's
# frame = groups in [g-2, g]).
# Scale shape: for a DISTRIBUTIVE aggregate (sum/count/min/max) the
# frame only needs per-group totals, so the group quotient is built
# FIRST — a map-side-combinable groupBy over the raw rows, fully
# parallel — and the window runs over one row per peer group
# (row_number == group index there), bounded by key cardinality
# (calendar days × flags), never by table size. The naive form
# (dense_rank + RANGE over the RAW rows) is semantically identical
# but sorts every row inside #flags window partitions — measured 6.4×
# at the 10× probe vs 1.2× for this quotient form. Non-distributive
# GROUPS aggregates (median over the frame) would need the raw-row
# dense_rank composition; none of the registry's do.
# DuckDB 1.0 lacks GROUPS too, so the oracle is an INDEPENDENT
# formulation: per-day aggregates banded by group index with a range
# join — different algebra, same definition.
# Output: one row per peer group (flag, day, frame sum) — every row of
# a peer group carries the same frame value, so this is the row-level
# result's quotient, keeping the contract compact.
# --------------------------------------------------------------------------


@query(
    "q3y_groups_frame",
    oracle="""
    WITH days AS (
      SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS ship_date,
             SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS day_cents,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag ORDER BY CAST(l_shipdate AS DATE)
             ) AS gi
      FROM lineitem GROUP BY 1, 2
    )
    SELECT a.flag, a.ship_date,
           CAST(SUM(b.day_cents) AS BIGINT) AS frame_cents
    FROM days a JOIN days b
      ON b.flag = a.flag AND b.gi BETWEEN a.gi - 2 AND a.gi
    GROUP BY a.flag, a.ship_date
    """,
)
def q3y_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    # peer-group quotient first (map-side combinable, fully parallel);
    # the window then touches one row per peer group, so its sort is
    # key-cardinality-bound, not table-bound
    days = li.groupBy("flag", "ship_date").agg(
        F.sum("cents").alias("day_cents")
    )
    wd = Window.partitionBy("flag").orderBy("ship_date")
    grouped = days.withColumn("_g", F.row_number().over(wd))
    # RANGE over the group index == GROUPS over ship_date: the frame
    # is exactly the 2 preceding peer groups plus the current one,
    # gap-insensitive
    wf = Window.partitionBy("flag").orderBy("_g").rangeBetween(-2, 0)
    return grouped.select(
        "flag",
        "ship_date",
        F.sum("day_cents").over(wf).alias("frame_cents"),
    )


# --------------------------------------------------------------------------
# q1y — memory-bounded exact per-group top-k via the partial-TopK
# shuffle (round-9 mint): q44 answers the same question with a full
# window (every row shuffles to its group's reducer); this is the
# combiner form — each MAP partition keeps only its own k best rows
# per group (Arrow-batched fold, O(groups·k) state), so the shuffle
# carries ≤ partitions·groups·k rows at ANY input size, and the final
# window ranks just the survivors. Exact by the dominance argument in
# operators/topk.py; the (price_cents, o_orderkey) total order makes
# tie-handling engine-identical.
# --------------------------------------------------------------------------


@query(
    "q1y_partial_topk",
    oracle="""
    SELECT o_orderpriority, price_cents, o_orderkey, CAST(rn AS INT) AS rk
    FROM (
      SELECT o_orderpriority, o_orderkey,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                        o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q1y_partial_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.topk import partial_topk

    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("price_cents"),
    )
    return partial_topk(
        o, ["o_orderpriority"], "price_cents", "o_orderkey", k=3
    )


# --------------------------------------------------------------------------
# q3z — ANSI window frame EXCLUSION (round-9 mint; the other frame
# feature Spark lacks, alongside q3y's GROUPS mode): `EXCLUDE CURRENT
# ROW / EXCLUDE GROUP / EXCLUDE TIES` carve rows back out of an
# established frame — "the surrounding days' demand WITHOUT my own
# order / my whole day / my day except me". DuckDB implements the
# clause natively, so for once the oracle is the REAL ANSI surface
# and Spark is the one composing. The composition is exact algebra on
# distributive aggregates over two shared-sort windows:
#   frame_sum  = SUM over the RANGE frame
#   peers_sum  = SUM over RANGE (0,0)   (the current row's peer group)
#   EXCLUDE CURRENT ROW = frame_sum − v       (NULL if frame = {me})
#   EXCLUDE GROUP       = frame_sum − peers_sum  (NULL if frame ⊆ peers)
#   EXCLUDE TIES        = frame_sum − peers_sum + v   (never empty)
# The NULL guards matter: ANSI SUM over an emptied frame is NULL, not
# 0, so the compositions carry frame/peer COUNTs and null out exactly
# when DuckDB does. All sums are BIGINT cents — engine-identical.
# Both windows share one (partition, order) sort; day ties make the
# three modes genuinely diverge.
# --------------------------------------------------------------------------


@query(
    "q3z_frame_exclusion",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
      CAST(SUM(cents) OVER (PARTITION BY o_orderpriority ORDER BY di
        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)
        AS BIGINT) AS excl_current,
      CAST(SUM(cents) OVER (PARTITION BY o_orderpriority ORDER BY di
        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE GROUP)
        AS BIGINT) AS excl_group,
      CAST(SUM(cents) OVER (PARTITION BY o_orderpriority ORDER BY di
        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE TIES)
        AS BIGINT) AS excl_ties
    FROM (
      SELECT o_orderpriority, o_orderkey,
             DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS di,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    """,
)
def q3z_frame_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .alias("di"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    frame = (
        Window.partitionBy("o_orderpriority").orderBy("di").rangeBetween(-2, 0)
    )
    peers = (
        Window.partitionBy("o_orderpriority").orderBy("di").rangeBetween(0, 0)
    )
    fsum, fcnt = F.sum("cents").over(frame), F.count(F.lit(1)).over(frame)
    psum, pcnt = F.sum("cents").over(peers), F.count(F.lit(1)).over(peers)
    v = F.col("cents")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.when(fcnt > 1, fsum - v).alias("excl_current"),
        F.when(fcnt > pcnt, fsum - psum).alias("excl_group"),
        (fsum - psum + v).alias("excl_ties"),
    )
