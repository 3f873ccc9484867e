"""Set operations + deduplication (SURVEY.md §2.7 E1-E4, §2.11 L1).

Set ops shuffle on the full row; at scale prefer keyed forms (semi/anti
joins) when only membership matters — both shapes are exercised here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q50 — union all / by-name (E1): stacking sample tables, the FCS
# "combine samples into one frame" step.
# --------------------------------------------------------------------------


@query(
    "q50_union_all",
    oracle="""
    SELECT entity_key, name, kind FROM (
      SELECT c_custkey AS entity_key, c_name AS name, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_suppkey AS entity_key, s_name AS name, 'supplier' AS kind FROM supplier
    )
    """,
)
def q50_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


# --------------------------------------------------------------------------
# q51 — distinct union (E2).
# --------------------------------------------------------------------------


@query(
    "q51_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q51_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --------------------------------------------------------------------------
# q52 — intersect / except (E3): nations having customers but no
# suppliers, and nations with both.
# --------------------------------------------------------------------------


@query(
    "q52_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q52_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q53_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q53_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set semantics); exceptAll = EXCEPT ALL


# --------------------------------------------------------------------------
# q54 — row dedup by subset of columns (E4): keep the earliest order
# per (custkey, status). dropDuplicates is partition-order-dependent, so
# the deterministic form is a row_number filter — same plan shape.
# --------------------------------------------------------------------------


@query(
    "q54_dedup_keyed",
    oracle="""
    SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q54_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select("o_custkey", "o_orderstatus", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# q55 — exact content dedup (L1): documents deduplicated by SHA-256 of
# normalized text — the first stage of any LLM-corpus dedup pipeline.
# Hash-groupBy distributes perfectly: the shuffle key is the digest.
# --------------------------------------------------------------------------


@query(
    "q55_exact_dedup",
    oracle="""
    SELECT doc_id, content_hash FROM (
      SELECT doc_id,
             SHA256(LOWER(TRIM(text))) AS content_hash,
             ROW_NUMBER() OVER (PARTITION BY SHA256(LOWER(TRIM(text)))
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q55_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("content_hash")
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# q38 — union by name with missing columns (E1 completion): schema
# evolution at the stack edge — the older "table" lacks a column and
# Spark null-pads it by NAME (position-independent), vs the oracle's
# explicit NULL projection.
# --------------------------------------------------------------------------


@query(
    "q38_union_by_name",
    oracle="""
    SELECT user_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, event_type, NULL AS value FROM events WHERE event_type = 'view'
    """,
)
def q38_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    new = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_type", "value"
    )
    # the "old schema" frame: value column absent, and a different
    # column ORDER — unionByName must align by name and null-pad
    old = e.filter(F.col("event_type") == "view").select("event_type", "user_id")
    return new.unionByName(old, allowMissingColumns=True)


# --------------------------------------------------------------------------
# q39 — bitwise aggregates (A-family completion): bit_and/bit_or/
# bit_xor over per-group key bits — flag-mask consolidation.
# --------------------------------------------------------------------------


@query(
    "q39_bitwise_aggs",
    oracle="""
    SELECT
      event_type,
      BIT_AND(user_id) AS mask_and,
      BIT_OR(user_id) AS mask_or,
      BIT_XOR(user_id) AS mask_xor
    FROM events
    GROUP BY event_type
    """,
)
def q39_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("mask_and"),
        F.bit_or("user_id").alias("mask_or"),
        F.bit_xor("user_id").alias("mask_xor"),
    )
