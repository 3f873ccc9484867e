"""Relational core: scan/project/filter/predicate/sort/limit queries.

SURVEY.md §2.2 (P1-P4), §2.6 (O1-O2). The flagship q1_pricing_summary
is the FCS "per-sample-per-channel summary stats" capability transposed
onto the fixtures (SURVEY.md §7 'minimum end-to-end slice').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import davg, dsum, o_davg, o_dsum
from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q1 — flagship: scan → filter → derive → groupBy-agg → sort  (TPC-H Q1 shape)
# Scale notes: filter + column pruning push into the parquet scan; the
# group-by has 6 groups so partial (map-side) aggregation reduces each of
# the N input partitions to ≤6 rows before the shuffle — this plan is
# O(rows) scan-bound at 100 TB with a ~KB shuffle.
# --------------------------------------------------------------------------

_Q1_CUTOFF = "2000-09-02"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {o_dsum("l_quantity", "sum_qty")},
      {o_dsum("l_extendedprice", "sum_base_price")},
      {o_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
      {o_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
      {o_davg("l_quantity", "avg_qty")},
      {o_davg("l_extendedprice", "avg_price")},
      {o_davg("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q2 — compound predicates (P2/P3): AND/OR/NOT, IN, BETWEEN, LIKE.
# All of these push down to the parquet row-group level (PushedFilters).
# --------------------------------------------------------------------------


@query(
    "q2_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority LIKE '_-%'
      AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'F')
      AND o_custkey IS NOT NULL
    """,
)
def q2_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("_-%")
        & ~((F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderstatus") == "F"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# q3 — conditional expressions (P4): when/otherwise, coalesce, nullif.
# --------------------------------------------------------------------------


@query(
    "q3_conditional_recode",
    oracle="""
    SELECT
      o_orderkey,
      CASE WHEN o_totalprice >= 300000 THEN 'high'
           WHEN o_totalprice >= 100000 THEN 'mid'
           ELSE 'low' END AS price_band,
      COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_recode
    FROM orders
    """,
)
def q3_conditional_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_recode"
        ),
    )


# --------------------------------------------------------------------------
# q4 — global sort + top-k (O1/O2). orderBy().limit(k) plans as
# TakeOrderedAndProject: per-partition top-k then a driver-side merge of
# k*P rows — no global sort shuffle at any scale. Tie-broken on the
# primary key so the k-th row is deterministic across engines.
# --------------------------------------------------------------------------


@query(
    "q4_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q4_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------------
# q5 — projection with computed columns / renames (P1).
# --------------------------------------------------------------------------


@query(
    "q5_derived_columns",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount) AS revenue,
      l_quantity * l_extendedprice / 100.0 AS weighted,
      CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def q5_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * F.col("l_extendedprice") / 100.0).alias("weighted"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


# --------------------------------------------------------------------------
# q6 — correlated scalar subquery (§4 decorrelation): orders costing
# more than their own customer's average. Expressed as SQL so Catalyst's
# RewriteCorrelatedScalarSubquery turns the per-row subquery into an
# aggregate + join (no nested-loop re-execution — asserted in
# tests/test_plans.py). The subquery average uses the scaled-integer
# form so the > comparison sits on bit-identical values in both
# engines (a raw AVG(double) could flip rows at the boundary).
# --------------------------------------------------------------------------

_Q6_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM {table} o
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(FLOOR(o2.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*)
      FROM {table} o2
      WHERE o2.o_custkey = o.o_custkey
    )
"""


@query("q6_correlated_subquery", oracle=_Q6_SQL.format(table="orders"))
def q6_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf-unique view name — see q33 for why a fixed name is unsafe
    view = "q6_orders_" + "".join(c if c.isalnum() else "_" for c in sf_dir)
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(_Q6_SQL.format(table=view))
