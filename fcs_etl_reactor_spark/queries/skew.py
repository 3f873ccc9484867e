"""Skew-mitigation queries (SURVEY.md §4 salting): the salted rewrites
are semantics-preserving, so both are checked against UNSALTED SQL
oracles — the strongest possible evidence the rewrite is sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import o_dsum
from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.operators.skew import salted_agg, salted_join
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q34 — salted two-phase aggregation: per-user event count + exact
# value sum, spread over 8 salt buckets before the per-key merge.
# Identical output to the plain GROUP BY oracle.
# --------------------------------------------------------------------------


@query(
    "q34_salted_agg",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n, {o_dsum("value", "sum_value")}
    FROM events GROUP BY user_id
    """,
)
def q34_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    merged = salted_agg(
        e,
        keys=["user_id"],
        partials={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_scaled": (
                F.sum(F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")),
                F.sum("sum_scaled"),
            ),
        },
        n_salt=8,
        salt_on="event_id",
    )
    return merged.select(
        "user_id",
        "n",
        (F.col("sum_scaled").cast("double") / F.lit(1e6)).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# q35 — salted equi-join: lineitem (probe, salted on a row-varying
# column) ⋈ orders (build, replicated 8×), then revenue per order
# priority. Oracle is the plain unsalted join.
# --------------------------------------------------------------------------


@query(
    "q35_salted_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {o_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q35_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(l, o, key="o_orderkey", n_salt=8, salt_on="l_partkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.sum(
                F.floor(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("long")
            ).cast("double")
            / F.lit(1e6)
        ).alias("revenue"),
    )


# --------------------------------------------------------------------------
# q19 — skew diagnostics: the planning companion to q34/q35. One
# groupBy produces the per-key histogram; a 1-row global-stats frame
# (broadcast by construction) turns it into actionable salting advice:
# share of traffic, hot-key flag (> 2× mean), and the salt factor
# salted_join/salted_agg would need to level that key. Top-20 keys
# with a total-order tie-break, so the result set is deterministic.
#
# Scale: shuffle = |distinct keys| (map-side partial agg), the stats
# side is ONE row, and top-20 runs as TakeOrderedAndProject — no
# global sort materialization.
# --------------------------------------------------------------------------


@query(
    "q19_skew_stats",
    oracle="""
    WITH k AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), s AS (
      SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM k
    )
    SELECT user_id, cnt,
           ROUND(CAST(cnt AS DOUBLE) / total, 9) AS share,
           cnt > 2.0 * total / n_keys AS is_hot,
           CAST(GREATEST(1, CEIL(cnt / (2.0 * total / n_keys))) AS BIGINT)
             AS salt_factor
    FROM k, s
    ORDER BY cnt DESC, user_id
    LIMIT 20
    """,
)
def q19_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    s = k.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    mean2 = F.lit(2.0) * F.col("total") / F.col("n_keys")
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 9).alias("share"),
            (F.col("cnt") > mean2).alias("is_hot"),
            F.greatest(F.lit(1), F.ceil(F.col("cnt") / mean2))
            .cast("bigint")
            .alias("salt_factor"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(20)
    )
