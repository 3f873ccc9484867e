"""Aggregations (SURVEY.md §2.4 A1-A13).

All group-bys here rely on Spark's automatic partial (map-side)
aggregation: each scan partition reduces to ≤|groups| rows before the
shuffle, so shuffle volume is O(groups × partitions), not O(rows) —
the property that makes these plans 100 TB-safe.

Float determinism: plain double sums drift between engines; anything
summed here goes through the decimal-cast trick (functions.exact) or,
for transcendental pipelines (geo-mean, stddev), is composed from
decimal sums with identical final-step IEEE arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import davg, dsum, o_davg, o_dsum
from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q20 — basic stats per group (A1/A2): count/sum/min/max/avg.
# --------------------------------------------------------------------------


@query(
    "q20_basic_stats",
    oracle=f"""
    SELECT
      event_type,
      COUNT(*) AS n,
      {o_dsum("value", "sum_value")},
      MIN(value) AS min_value,
      MAX(value) AS max_value,
      {o_davg("value", "avg_value")},
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q20_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        davg("value", "avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# q21 — dispersion (A3): stddev/variance composed from exact decimal
# sums: var = (Σx² − (Σx)²/n) / (n−1). Both engines then run the same
# IEEE double ops on identical inputs → bit-identical output.
# (Σx² needs more fractional digits: DECIMAL with scale 8.)
# --------------------------------------------------------------------------

_VAR_SQL = """
    WITH s AS (
      SELECT
        event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(value * value AS DECIMAL(24,8))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    )
    SELECT
      event_type,
      (sxx - sx * sx / n) / (n - 1) AS var_samp_value,
      SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_samp_value,
      (sxx - sx * sx / n) / n AS var_pop_value
    FROM s
"""


@query("q21_dispersion", oracle=_VAR_SQL)
def q21_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,8)"))
        .cast("double")
        .alias("sxx"),
    )
    var_samp = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    var_pop = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    return s.select(
        "event_type",
        var_samp.alias("var_samp_value"),
        F.sqrt(var_samp).alias("stddev_samp_value"),
        var_pop.alias("var_pop_value"),
    )


# --------------------------------------------------------------------------
# q22 — geometric mean / geo-SD (A4): THE core FCS statistic
# (per-channel MEFL geo-means in the reference pipeline, SURVEY §0.2
# step 4). exp(mean(ln x)) over x>0. ln/exp differ in the last ulp
# between libm implementations, so the mean of ln goes through the
# decimal trick and the result is rounded to 9 significant-stable
# decimals in BOTH engines.
# --------------------------------------------------------------------------


@query(
    "q22_geomean",
    oracle="""
    SELECT
      event_type,
      ROUND(EXP(CAST(SUM(CAST(LN(value) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)), 9)
        AS geo_mean_value
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def q22_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    mean_ln = (
        F.sum(F.log(F.col("value")).cast("decimal(18,9)")).cast("double")
        / F.count(F.lit(1))
    )
    return e.groupBy("event_type").agg(F.round(F.exp(mean_ln), 9).alias("geo_mean_value"))


# --------------------------------------------------------------------------
# q23 — exact percentiles / median (A5): per-channel quantiles of the
# FCS summarize step. Exact (not approx) so the oracle matches; at
# 100 TB you'd flip to percentile_approx and drop the oracle claim.
# --------------------------------------------------------------------------


@query(
    "q23_percentiles",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25_price,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75_price"),
    )


# --------------------------------------------------------------------------
# q24 — grouping sets / rollup (A8) with grouping_id.
# --------------------------------------------------------------------------


@query(
    "q24_rollup",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      GROUPING(l_returnflag, l_linestatus) AS gid,
      COUNT(*) AS n,
      {o_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q24_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")


# --------------------------------------------------------------------------
# q25 — filtered / conditional aggregation (A9).
# --------------------------------------------------------------------------


@query(
    "q25_conditional_agg",
    oracle=f"""
    SELECT
      user_id,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
      COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
      {o_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END", "purchase_value")}
    FROM events
    GROUP BY user_id
    """,
)
def q25_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_clicks"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0)),
            "purchase_value",
        ),
    )


# --------------------------------------------------------------------------
# q26 (collect aggregates, A10) moved to queries/envelopes.py: its
# array outputs are serialized to strings there (driver constraint).
# --------------------------------------------------------------------------
# q27 — histogram / binning (A11): the FCS "histogram CSV" output on a
# log10 grid (SURVEY §0.2 step 5). floor((log10 x − lo)/step) in both
# engines; bins with no events are absent (join a bin grid to densify).
# --------------------------------------------------------------------------

_HIST_LO, _HIST_STEP, _HIST_N = -2.0, 0.25, 20


@query(
    "q27_log_histogram",
    oracle=f"""
    SELECT
      event_type,
      LEAST(GREATEST(CAST(FLOOR((LOG10(value) - ({_HIST_LO})) / {_HIST_STEP}) AS BIGINT),
            0), {_HIST_N - 1}) AS bin,
      COUNT(*) AS n
    FROM events
    WHERE value > 0
    GROUP BY 1, 2
    """,
)
def q27_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    raw_bin = F.floor((F.log10("value") - F.lit(_HIST_LO)) / F.lit(_HIST_STEP))
    bin_ = F.least(F.greatest(raw_bin.cast("bigint"), F.lit(0)), F.lit(_HIST_N - 1))
    return (
        e.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# q28 — correlation / covariance (A12): channel-vs-channel QC stat,
# composed from decimal sums for cross-engine determinism.
# corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
# --------------------------------------------------------------------------

_CORR_SQL = """
    WITH s AS (
      SELECT
        l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,8)) ) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(26,8))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      ROUND((n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
        AS corr_qty_price,
      ROUND((sxy - sx * sy / n) / (n - 1), 4) AS covar_samp_qty_price
    FROM s
"""


@query("q28_corr_covar", oracle=_CORR_SQL)
def q28_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(24,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(28,8)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(26,8)"))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    covar = (sxy - sx * sy / n) / (n - 1)
    return s.select(
        "l_returnflag",
        F.round(corr, 9).alias("corr_qty_price"),
        F.round(covar, 4).alias("covar_samp_qty_price"),
    )


# --------------------------------------------------------------------------
# q29 — arg-max / arg-min (A13): the single most valuable order per
# customer segment-month. max_by needs a unique extremum for
# determinism: o_totalprice ties are broken impossible-in-fixture but
# we guard by keying on (price, orderkey) pairs.
# --------------------------------------------------------------------------


@query(
    "q29_argmax",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rtop,
        ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice ASC, o_orderkey DESC) AS rbot
      FROM orders
    )
    SELECT o_orderstatus,
      MAX(CASE WHEN rtop = 1 THEN o_orderkey END) AS top_orderkey,
      MAX(CASE WHEN rtop = 1 THEN o_totalprice END) AS top_totalprice,
      MAX(CASE WHEN rbot = 1 THEN o_orderkey END) AS bottom_orderkey
    FROM ranked GROUP BY o_orderstatus
    """,
)
def q29_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_totalprice"),
        F.min_by(
            "o_orderkey", F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk"))
        ).alias("bottom_orderkey"),
    )


# --------------------------------------------------------------------------
# q30 (approx distinct, A7) moved to queries/envelopes.py as an
# exact+tolerance envelope so the HLL path is oracle-checked.
# --------------------------------------------------------------------------
# q31 — CUBE (A8, completing rollup from q24): all 4 grouping-set
# combinations of (o_orderstatus, o_orderpriority) in one pass — Spark
# expands the sets and still runs a single partial+final aggregation.
# --------------------------------------------------------------------------


@query(
    "q31_cube",
    oracle=f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      GROUPING(o_orderstatus, o_orderpriority) AS gid,
      COUNT(*) AS n,
      {o_dsum("o_totalprice", "sum_price", scale="100.0")}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q31_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "sum_price", scale=100.0),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


# --------------------------------------------------------------------------
# q32 — deterministic mode (A13): most frequent user per event_type.
# Native mode() is tie-nondeterministic in both engines, so the modal
# value is derived as count → argmax with an explicit (count, value)
# tie-break — identical, reproducible semantics in Spark and the
# oracle. Two hash aggregations, no window on the Spark side.
# --------------------------------------------------------------------------


@query(
    "q32_mode",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY event_type, user_id
    ), r AS (
      SELECT event_type, user_id, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id DESC) AS rn
      FROM c
    )
    SELECT event_type, user_id AS modal_user, cnt AS n_occurrences
    FROM r WHERE rn = 1
    """,
)
def q32_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    best = F.max(F.struct(F.col("cnt"), F.col("user_id"))).alias("m")
    return (
        counts.groupBy("event_type")
        .agg(best)
        .select(
            "event_type",
            F.col("m.user_id").alias("modal_user"),
            F.col("m.cnt").alias("n_occurrences"),
        )
    )


# --------------------------------------------------------------------------
# q33 — explicit GROUPING SETS through the SQL lifecycle (§3.3): the
# Spark side IS a SQL string over a registered temp view — same text
# shape as the oracle — exercising parser → analyzer → same Catalyst
# pipeline the DataFrame API feeds. (rollup=q24, cube=q31 cover the
# DataFrame forms.)
# --------------------------------------------------------------------------

_GS_SQL = """
    SELECT
      l_returnflag,
      l_linestatus,
      {gid} AS gid,
      COUNT(*) AS n,
      CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0 AS sum_qty
    FROM {table}
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query(
    "q33_grouping_sets",
    oracle=_GS_SQL.format(gid="GROUPING(l_returnflag, l_linestatus)", table="lineitem"),
)
def q33_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf-unique view name: a fixed name re-registered for another
    # sf_dir would be resolved by any not-yet-analyzed cached plan
    view = "q33_lineitem_" + "".join(c if c.isalnum() else "_" for c in sf_dir)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(_GS_SQL.format(gid="CAST(GROUPING_ID() AS BIGINT)", table=view))


# --------------------------------------------------------------------------
# q36 (approximate percentiles, A5 scale path) moved to
# queries/envelopes.py as an exact+tolerance envelope.
# --------------------------------------------------------------------------
# q37 — DISTINCT aggregates (A6 completion): SUM/COUNT over distinct
# value sets. Spark plans these as an expand + two-level aggregate;
# still one shuffle keyed on the group columns.
# --------------------------------------------------------------------------


@query(
    "q37_distinct_aggs",
    oracle="""
    SELECT
      l_returnflag,
      CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_distinct_qty,
      COUNT(DISTINCT l_linenumber) AS n_linenumbers,
      COUNT(DISTINCT l_shipdate) AS n_ship_dates
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q37_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum_distinct(F.col("l_quantity").cast("bigint")).alias("sum_distinct_qty"),
        F.countDistinct("l_linenumber").alias("n_linenumbers"),
        F.countDistinct("l_shipdate").alias("n_ship_dates"),
    )


# --------------------------------------------------------------------------
# q8 (heavy hitters via freqItems, A7's counting cousin) moved to
# queries/envelopes.py, checked via the sketch's superset guarantee.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# q4c — U4 as a TRUE vectorized UDAF (pandas GROUPED_AGG), not an
# expression composition: 10%-trimmed mean price per (flag, status).
# The oracle is the rank-window SQL twin — which is also the plan
# you'd run when a single group outgrows one Arrow batch.
# --------------------------------------------------------------------------


@query(
    "q4c_trimmed_mean",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v100,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
      FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           (CAST(SUM(v100) AS DOUBLE) / 100.0) / COUNT(*) AS trimmed_mean,
           COUNT(*) AS n_kept
    FROM s
    WHERE rn > CAST(FLOOR(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q4c_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.udfs import trimmed_mean_udaf

    l = load(spark, sf_dir, "lineitem")
    tm, tc = trimmed_mean_udaf()
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        tm(F.col("l_extendedprice")).alias("trimmed_mean"),
        tc(F.col("l_extendedprice")).alias("n_kept"),
    )


# --------------------------------------------------------------------------
# q8q — per-group OLS (A-family extension): closed-form simple linear
# regression of event value on hour-of-day, one fit per event_type.
# The normal-equation sums (n, Σx, Σx², Σy, Σxy) are ONE pass of
# map-side-combinable aggregates — the pattern that generalizes to
# per-key model fitting at 100 TB (featurize → 5 sums → closed form),
# where per-group iterative solvers would need a shuffle per step.
# Σy and Σxy go through the scaled-long exact sum (functions/exact.py)
# so the slope is bit-identical at any partition count; x-sums are
# integers and exact for free.
# --------------------------------------------------------------------------


@query(
    "q8q_group_ols",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(EXTRACT(HOUR FROM ts)) AS sx,
             SUM(EXTRACT(HOUR FROM ts) * EXTRACT(HOUR FROM ts)) AS sxx,
             {o_dsum("value", "sy")},
             {o_dsum("EXTRACT(HOUR FROM ts) * value", "sxy", "100000.0")}
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9)
             AS intercept
    FROM s
    """,
)
def q8q_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    x = F.hour("ts")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        dsum("value", "sy"),
        dsum(x.cast("double") * F.col("value"), "sxy", scale=1e5),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias(
            "intercept"
        ),
    )


# --------------------------------------------------------------------------
# q4h — quantile discretizer (ntile bucketing): assign each lineitem
# price to its within-group quartile and report per-bucket ranges —
# the feature-binning primitive (equal-FREQUENCY bins; q27/q7e are the
# equal-WIDTH/equi-depth boundary forms). NTILE is rank arithmetic on
# one sorted shuffle per group key; bucket edges come from the same
# pass (min/max per bucket), no second scan.
# --------------------------------------------------------------------------


@query(
    "q4h_ntile_bucketing",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             NTILE(4) OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket,
             l_extendedprice
      FROM lineitem
    )
    SELECT l_returnflag, CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS lo,
           MAX(l_extendedprice) AS hi
    FROM t GROUP BY l_returnflag, bucket
    """,
)
def q4h_ntile_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    t = l.select(
        "l_returnflag",
        F.ntile(4).over(w).alias("bucket"),
        "l_extendedprice",
    )
    return t.groupBy("l_returnflag", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


# --------------------------------------------------------------------------
# q4r — Gini coefficient of customer revenue concentration (the
# inequality statistic behind "top-x% of customers drive y% of
# revenue"). Revenue per customer is collapsed first (the only
# corpus-sized aggregation); the Lorenz rank-weighted sum uses the
# standard G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n identity over scaled-long
# revenues with a deterministic (revenue, custkey) rank — integer
# arithmetic end to end, one final double division.
# Scale note: the rank is a single ordered window over the CUSTOMER
# aggregate (|customers| rows, not |orders|); for an unbounded key
# space swap in ordering.global_rank — the identity itself only
# needs (i · x_i) products, which distribute.
# --------------------------------------------------------------------------


@query(
    "q4r_gini",
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i
      FROM r
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(rev) AS BIGINT) AS total_rev_scaled,
           ROUND(2.0 * CAST(SUM(i * rev) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                 - (CAST(COUNT(*) AS DOUBLE) + 1.0)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS gini
    FROM ranked
    """,
)
def q4r_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    o = load(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).alias("rev")
    )
    # distributed rank (bucket-partitioned two-pass), NOT a global
    # no-partition row_number() window — the single-reducer sort that
    # would serialize every customer through one task at scale.
    ranked = global_rank(r, ["rev", "o_custkey"], rank_col="i").select("rev", "i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").cast("bigint").alias("total_rev_scaled"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("rev")).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.sum("rev").cast("double"))
            - (F.count(F.lit(1)).cast("double") + F.lit(1.0))
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("gini"),
    )

# --------------------------------------------------------------------------
# q1o — Spearman rank correlation (the rank-based complement of q28's
# Pearson corr/covar — robust to monotone transforms and outliers).
# Average ranks with exact tie handling: per distinct value,
# 2·rank_avg = 2·(count of preceding rows) + count + 1 — an INTEGER,
# so ranks are carried DOUBLED and every aggregate is exact (widened
# through DECIMAL(38,0); rank² sums pass int64 around 1e9 rows). The
# preceding-count prefix sum runs through operators/
# ordering.global_cumsum — price-cents cardinality is DATA-bounded,
# so a bare SUM() OVER (ORDER BY v) on the value summary would funnel
# it through one reducer (the q4r lesson). ρ is one expression over
# six exact sums: doubles enter at the last step only (both engines
# round the same exact integers to nearest double), SQRT is IEEE-
# correctly-rounded (unlike exp/ln), output rounded 9 dp.
# --------------------------------------------------------------------------


@query(
    "q1o_spearman",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    rx AS (
      SELECT x, 2 * (SUM(COUNT(*)) OVER (ORDER BY x) - COUNT(*))
                + COUNT(*) + 1 AS r2x
      FROM v GROUP BY x
    ),
    ry AS (
      SELECT y, 2 * (SUM(COUNT(*)) OVER (ORDER BY y) - COUNT(*))
                + COUNT(*) + 1 AS r2y
      FROM v GROUP BY y
    ),
    j AS (
      SELECT rx.r2x AS a, ry.r2y AS b FROM v JOIN rx USING(x) JOIN ry USING(y)
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(a AS HUGEINT)) AS sa, SUM(CAST(b AS HUGEINT)) AS sb,
             SUM(CAST(a AS HUGEINT) * b) AS sab,
             SUM(CAST(a AS HUGEINT) * a) AS saa,
             SUM(CAST(b AS HUGEINT) * b) AS sbb
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                         - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 9)
             AS spearman_rho
    FROM s
    """,
)
def q1o_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_cumsum

    l = load(spark, sf_dir, "lineitem")
    v = l.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint").alias("y"),
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        g = v.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        g = global_cumsum(g, [col], "c", out_col="prev", exclusive=True)
        return g.select(
            col, (F.lit(2) * F.col("prev") + F.col("c") + F.lit(1)).alias(out)
        )

    j = v.join(doubled_ranks("x", "a"), "x").join(doubled_ranks("y", "b"), "y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("a")).alias("sa"),
        F.sum(dec("b")).alias("sb"),
        F.sum(dec("a") * F.col("b")).alias("sab"),
        F.sum(dec("a") * F.col("a")).alias("saa"),
        F.sum(dec("b") * F.col("b")).alias("sbb"),
    )
    nd = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    rho = (nd * d("sab") - d("sa") * d("sb")) / F.sqrt(
        (nd * d("saa") - d("sa") * d("sa")) * (nd * d("sbb") - d("sb") * d("sb"))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(rho, 9).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# q1v — hierarchical share-of-parent (ratio-to-report over ROLLUP):
# the contribution analysis every revenue dashboard renders — each
# nation's share of its region, each region's share of the grand
# total, from ONE rollup pass. The raw-data pass is a single
# combine-friendly groupBy to (region, nation) cents; ROLLUP then
# runs over the ≤(|regions|·|nations|) summary, and parent attachment
# is two broadcast joins on the tiny level tables (grand total = one
# 1-row broadcast combine). Shares are single divisions of exact
# BIGINT cents, rounded 9 dp.
# --------------------------------------------------------------------------


@query(
    "q1v_share_of_parent",
    oracle="""
    WITH base AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    ),
    ru AS (
      SELECT r_name, n_name, CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(GROUPING(r_name) AS INTEGER) AS g_r,
             CAST(GROUPING(n_name) AS INTEGER) AS g_n
      FROM base GROUP BY ROLLUP (r_name, n_name)
    ),
    lvl0 AS (SELECT cents AS total FROM ru WHERE g_r = 1 AND g_n = 1),
    lvl1 AS (SELECT r_name, cents AS rcents FROM ru WHERE g_r = 0 AND g_n = 1)
    SELECT 2 AS level, ru.r_name, ru.n_name, ru.cents,
           ROUND(CAST(ru.cents AS DOUBLE) / CAST(l1.rcents AS DOUBLE), 9)
             AS share_of_parent
    FROM ru JOIN lvl1 l1 ON ru.r_name = l1.r_name
    WHERE ru.g_r = 0 AND ru.g_n = 0
    UNION ALL
    SELECT 1, l1.r_name, 'ALL', l1.rcents,
           ROUND(CAST(l1.rcents AS DOUBLE) / CAST(l0.total AS DOUBLE), 9)
    FROM lvl1 l1, lvl0 l0
    UNION ALL
    SELECT 0, 'ALL', 'ALL', total, 1.0 FROM lvl0
    """,
)
def q1v_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    ru = base.rollup("r_name", "n_name").agg(
        F.sum("cents").cast("bigint").alias("cents"),
        F.grouping("r_name").cast("int").alias("g_r"),
        F.grouping("n_name").cast("int").alias("g_n"),
    )
    lvl0 = ru.filter((F.col("g_r") == 1) & (F.col("g_n") == 1)).select(
        F.col("cents").alias("total")
    )
    lvl1 = ru.filter((F.col("g_r") == 0) & (F.col("g_n") == 1)).select(
        "r_name", F.col("cents").alias("rcents")
    )
    lvl2 = (
        ru.filter((F.col("g_r") == 0) & (F.col("g_n") == 0))
        .join(F.broadcast(lvl1), "r_name")
        .select(
            F.lit(2).alias("level"),
            "r_name",
            "n_name",
            "cents",
            F.round(
                F.col("cents").cast("double") / F.col("rcents").cast("double"), 9
            ).alias("share_of_parent"),
        )
    )
    l1out = lvl1.crossJoin(F.broadcast(lvl0)).select(
        F.lit(1).alias("level"),
        "r_name",
        F.lit("ALL").alias("n_name"),
        F.col("rcents").alias("cents"),
        F.round(
            F.col("rcents").cast("double") / F.col("total").cast("double"), 9
        ).alias("share_of_parent"),
    )
    l0out = lvl0.select(
        F.lit(0).alias("level"),
        F.lit("ALL").alias("r_name"),
        F.lit("ALL").alias("n_name"),
        F.col("total").alias("cents"),
        F.lit(1.0).alias("share_of_parent"),
    )
    return lvl2.unionAll(l1out).unionAll(l0out)
