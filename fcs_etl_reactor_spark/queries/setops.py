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


# --------------------------------------------------------------------------
# q7a — order-independent table fingerprint (pipeline integrity
# verification): per-row 60-bit digest from md5 over a canonicalized
# column string, folded with TWO order/partition-independent
# aggregates — bit_xor and an exact sum reduced modulo 2^62 so the
# emitted cell stays inside int64 (a modular sum is still order- and
# partition-independent). The sum is widened through DECIMAL(38,0)
# internally (values reach ~2.9e21 at sf0.01) but NEVER emitted as a
# >int64 decimal: round-5 proved the driver's value-hash
# canonicalizes >64-bit decimals differently per engine (q7a
# hash-fail with byte-identical values; same class as q75's r02
# HUGEINT stringification). Verifying a 100 TB copy is one scan + a
# 1-row-per-group exchange; the float column enters via exact
# scaling so both engines digest identical strings.
# --------------------------------------------------------------------------


@query(
    "q7a_table_fingerprint",
    oracle="""
    WITH h AS (
      SELECT o_orderstatus,
             ('0x' || SUBSTR(MD5(
               CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
               || '|' || o_orderstatus || '|' ||
               CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
               || '|' || o_orderpriority), 1, 15))::BIGINT AS d
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           BIT_XOR(d) AS xor_fp,
           CAST(SUM(d) % 4611686018427387904 AS BIGINT) AS sum_fp
    FROM h GROUP BY o_orderstatus
    """,
)
def q7a_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").cast("string"),
        "o_orderpriority",
    )
    d = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
    return (
        o.select("o_orderstatus", d.alias("d"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("d").alias("xor_fp"),
            (
                F.sum(F.col("d").cast("decimal(38,0)"))
                % F.lit(4611686018427387904).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("sum_fp"),
        )
    )


# --------------------------------------------------------------------------
# q7b — upsert / merge (SCD-style maintenance without a table format):
# updates replace matching base rows by key, new keys append. The
# anti-join shuffles on the merge key (broadcast when the update
# batch is bounded — the common CDC case); nothing rewrites
# untouched partitions. Here the update batch is derived
# deterministically from orders itself so both engines replay it.
# --------------------------------------------------------------------------


@query(
    "q7b_upsert_merge",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    ), merged AS (
      SELECT * FROM updates
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS HUGEINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def q7b_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.merge import merge_upsert

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    updates = o.filter(F.col("o_orderkey") % 97 == 0).withColumns(
        {
            "o_orderstatus": F.lit("U"),
            "o_totalprice": F.col("o_totalprice") + 1000.0,
        }
    )
    merged = merge_upsert(o, updates, ["o_orderkey"])
    scaled = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(scaled).cast("double") / 100.0).alias("total_price"),
    )


# --------------------------------------------------------------------------
# q7c — per-column table profiler (schema-level data quality): one
# output row per column with null/distinct/extreme stats. One pass:
# every per-column aggregate runs in a single scan (no per-column
# jobs); the unpivot to rows happens AFTER aggregation on a 1-row
# frame, so profiling a 100 TB table costs exactly one scan + a
# metadata-sized stack.
# --------------------------------------------------------------------------


@query(
    "q7c_column_profile",
    oracle="""
    WITH s AS (
      SELECT
        COUNT(*) AS n,
        COUNT(c_custkey) AS nn_custkey, COUNT(DISTINCT c_custkey) AS nd_custkey,
        CAST(MIN(c_custkey) AS VARCHAR) AS mn_custkey,
        CAST(MAX(c_custkey) AS VARCHAR) AS mx_custkey,
        COUNT(c_name) AS nn_name, COUNT(DISTINCT c_name) AS nd_name,
        MIN(c_name) AS mn_name, MAX(c_name) AS mx_name,
        COUNT(c_nationkey) AS nn_nationkey, COUNT(DISTINCT c_nationkey) AS nd_nationkey,
        CAST(MIN(c_nationkey) AS VARCHAR) AS mn_nationkey,
        CAST(MAX(c_nationkey) AS VARCHAR) AS mx_nationkey,
        COUNT(c_mktsegment) AS nn_mktsegment, COUNT(DISTINCT c_mktsegment) AS nd_mktsegment,
        MIN(c_mktsegment) AS mn_mktsegment, MAX(c_mktsegment) AS mx_mktsegment
      FROM customer
    )
    SELECT col, n_rows, n_nonnull, n_distinct, min_str, max_str FROM (
      SELECT 'c_custkey' AS col, n AS n_rows, nn_custkey AS n_nonnull,
             nd_custkey AS n_distinct, mn_custkey AS min_str, mx_custkey AS max_str FROM s
      UNION ALL
      SELECT 'c_name', n, nn_name, nd_name, mn_name, mx_name FROM s
      UNION ALL
      SELECT 'c_nationkey', n, nn_nationkey, nd_nationkey, mn_nationkey, mx_nationkey FROM s
      UNION ALL
      SELECT 'c_mktsegment', n, nn_mktsegment, nd_mktsegment, mn_mktsegment, mx_mktsegment FROM s
    )
    """,
)
def q7c_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for col in cols:
        aggs += [
            F.count(col).alias(f"nn_{col}"),
            F.countDistinct(col).alias(f"nd_{col}"),
            F.min(col).cast("string").alias(f"mn_{col}"),
            F.max(col).cast("string").alias(f"mx_{col}"),
        ]
    one = c.agg(*aggs)
    profile = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(col).alias("col"),
                    F.col("n").alias("n_rows"),
                    F.col(f"nn_{col}").alias("n_nonnull"),
                    F.col(f"nd_{col}").alias("n_distinct"),
                    F.col(f"mn_{col}").alias("min_str"),
                    F.col(f"mx_{col}").alias("max_str"),
                )
                for col in cols
            ]
        )
    ).alias("p")
    return one.select(profile).select("p.*")


# --------------------------------------------------------------------------
# q7d — referential-integrity audit: orphan counts for each FK edge of
# the star schema, as anti-join aggregates. Each edge is one shuffle
# on its key (broadcastable when the parent's key set is bounded);
# the output is one row per edge — the shape a nightly 100 TB
# integrity gate emits.
# --------------------------------------------------------------------------


@query(
    "q7d_fk_check",
    oracle="""
    SELECT 'orders->customer' AS fk_edge,
           (SELECT COUNT(*) FROM orders) AS n_child,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
    """,
)
def q7d_fk_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(name: str, child: DataFrame, key: str, parent: DataFrame, pkey: str):
        # ONE pass over the child: left-join the distinct parent key
        # set and count total + unmatched in a single aggregation —
        # half the exchanges and scans of the older count-then-anti-
        # join formulation (plan-lint review queue). No broadcast
        # hint: a dimension-sized parent broadcasts on its own, while
        # a fact-sized parent (lineitem->orders at 100 TB) must be
        # free to shuffle-join.
        marker = parent.select(F.col(pkey).alias(key)).distinct().withColumn(
            "__hit", F.lit(1)
        )
        return (
            child.select(key)
            .join(marker, key, "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.count(F.when(F.col("__hit").isNull(), 1)).alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    l = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    return (
        edge("orders->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(edge("lineitem->orders", l, "l_orderkey", o, "o_orderkey"))
        .unionByName(edge("customer->nation", c, "c_nationkey", n, "n_nationkey"))
    )


# --------------------------------------------------------------------------
# q7e — equi-depth histogram (the complement of q27's equi-width log
# bins): 10 equal-population buckets per event_type via ntile. The
# (value, event_id) tie-break makes bucket boundaries deterministic —
# NTILE splits ties by row order, so an unordered tie would make
# bucket extrema partition-dependent. At scale this is the sort-based
# statistics pass a query optimizer runs to build its own histograms.
# --------------------------------------------------------------------------


@query(
    "q7e_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT event_type, CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM b GROUP BY event_type, bucket
    """,
)
def q7e_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select("event_type", "value", F.ntile(10).over(w).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# q7g — table diff (snapshot regression detection): classify every key
# of two table versions as added / removed / changed / unchanged with
# ONE full-outer join on the key, comparing md5 row digests — never
# column-by-column row comparison. The "new version" is derived
# deterministically from orders (q7b's update rule plus a deletion
# rule) so both engines replay it.
# --------------------------------------------------------------------------


@query(
    "q7g_table_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k,
             MD5(o_orderstatus || '|' ||
                 CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR))
               AS digest
      FROM orders
    ), new AS (
      SELECT o_orderkey AS k,
             MD5(CASE WHEN o_orderkey % 97 = 0 THEN 'U' ELSE o_orderstatus END
                 || '|' ||
                 CAST(CAST(FLOOR(
                   (CASE WHEN o_orderkey % 97 = 0
                         THEN o_totalprice + 1000.0 ELSE o_totalprice END) * 100
                   + 0.5) AS BIGINT) AS VARCHAR)) AS digest
      FROM orders WHERE o_orderkey % 101 <> 0
    )
    SELECT CASE
             WHEN o.k IS NULL THEN 'added'
             WHEN n.k IS NULL THEN 'removed'
             WHEN o.digest <> n.digest THEN 'changed'
             ELSE 'unchanged'
           END AS change_kind,
           COUNT(*) AS n_keys
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    GROUP BY 1
    """,
)
def q7g_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def digest(status, price):
        return F.md5(
            F.concat_ws(
                "|",
                status,
                F.floor(price * 100 + 0.5).cast("bigint").cast("string"),
            )
        )

    old = o.select(
        F.col("o_orderkey").alias("k"),
        digest(F.col("o_orderstatus"), F.col("o_totalprice")).alias("old_digest"),
    )
    upd = F.col("o_orderkey") % 97 == 0
    new = (
        o.filter(F.col("o_orderkey") % 101 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            digest(
                F.when(upd, "U").otherwise(F.col("o_orderstatus")),
                F.when(upd, F.col("o_totalprice") + 1000.0).otherwise(
                    F.col("o_totalprice")
                ),
            ).alias("new_digest"),
        )
    )
    j = old.join(new, "k", "full_outer")
    kind = (
        F.when(F.col("old_digest").isNull(), "added")
        .when(F.col("new_digest").isNull(), "removed")
        .when(F.col("old_digest") != F.col("new_digest"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(kind.alias("change_kind")).agg(F.count(F.lit(1)).alias("n_keys"))


# --------------------------------------------------------------------------
# q7k — incremental rollup maintenance (materialized-view semantics):
# a precomputed base aggregate plus a delta batch's partial aggregate
# combine (sum-of-sums / sum-of-counts) into EXACTLY the full
# recompute — the algebraic property that lets a 100 TB nightly
# rollup absorb a day's delta without touching history. The oracle IS
# the full recompute; additivity of the scaled-integer sums makes the
# combine bit-exact.
# --------------------------------------------------------------------------


@query(
    "q7k_incremental_rollup",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS HUGEINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q7k_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    scaled = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.sum(scaled).alias("s")
        )

    base = partial(o.filter(F.col("o_orderkey") % 11 != 0))  # "history"
    delta = partial(o.filter(F.col("o_orderkey") % 11 == 0))  # "today"
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum("s").cast("double") / 100.0).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# q7l — event-transition analysis (user-path bigrams): per-user
# consecutive event_type pairs by time order, counted corpus-wide —
# the Markov-transition table funnels and session analyses start
# from. One keyed window (lag) + one aggregation.
# --------------------------------------------------------------------------


@query(
    "q7l_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q7l_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# q7u — declarative data-quality expectations (Deequ / Great
# Expectations style): a constraint suite over lineitem evaluated in
# ONE aggregation pass (operators/expectations.py) — one scan,
# map-side partials, a 1-row shuffle, then a stack() unpivot into the
# (expectation, metric, passed) report. N constraints cost one pass,
# not N — the only sane topology at 100 TB. Metrics are restricted to
# exactly-reproducible aggregates (counts, count-distinct, min/max,
# violation counts) so every boolean verdict hash-matches the SQL
# replay.
# --------------------------------------------------------------------------


@query(
    "q7u_expectations",
    oracle="""
    WITH m AS (
      SELECT
        CAST(COUNT(l_shipdate) AS DOUBLE) / COUNT(*) AS m0,
        CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE)
          / COUNT(*) AS m1,
        CAST(MIN(l_quantity) AS DOUBLE) AS m2,
        CAST(MAX(l_quantity) AS DOUBLE) AS m3,
        CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 ELSE 0 END) AS DOUBLE) AS m4,
        CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                      THEN 1 ELSE 0 END) AS DOUBLE) AS m5,
        CAST(SUM(CASE WHEN l_extendedprice <= 0.0
                      THEN 1 ELSE 0 END) AS DOUBLE) AS m6
      FROM lineitem
    )
    SELECT e.expectation, e.metric, e.passed FROM m, LATERAL (
      VALUES ('completeness_l_shipdate', m0, m0 >= 1.0),
             ('uniqueness_l_orderkey_l_linenumber', m1, m1 >= 1.0),
             ('min_l_quantity', m2, m2 >= 1.0),
             ('max_l_quantity', m3, m3 <= 50.0),
             ('domain_l_returnflag', m4, m4 = 0.0),
             ('range_l_discount', m5, m5 = 0.0),
             ('positive_l_extendedprice', m6, m6 = 0.0)
    ) AS e(expectation, metric, passed)
    """,
)
def q7u_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.expectations import (
        Expectation,
        completeness,
        run_expectations,
        uniqueness,
        violations,
    )

    l = load(spark, sf_dir, "lineitem")
    specs = [
        (completeness("l_shipdate"), "{m} >= 1.0d"),
        (uniqueness("l_orderkey", "l_linenumber"), "{m} >= 1.0d"),
        (
            Expectation("min_l_quantity", F.min("l_quantity").cast("double")),
            "{m} >= 1.0d",
        ),
        (
            Expectation("max_l_quantity", F.max("l_quantity").cast("double")),
            "{m} <= 50.0d",
        ),
        (
            violations(
                "domain_l_returnflag", ~F.col("l_returnflag").isin("A", "N", "R")
            ),
            "{m} = 0.0d",
        ),
        (
            violations(
                "range_l_discount",
                (F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0),
            ),
            "{m} = 0.0d",
        ),
        (
            violations("positive_l_extendedprice", F.col("l_extendedprice") <= 0.0),
            "{m} = 0.0d",
        ),
    ]
    return run_expectations(l, specs)


# --------------------------------------------------------------------------
# q7v — Benford's-law first-digit audit over order totals: the
# classic forensic data-quality screen. Digit counts are exact
# integers (first digit via string, no float log); the Benford
# expectation LOG10(1 + 1/d) and the chi-square-style deviation use
# identical IEEE chains on both engines with scaled-long summation
# for order independence. Output: per digit 1-9, observed count,
# expected probability (9 dp), plus the aggregate deviation — one
# scan, dimension-bounded everything after it.
# --------------------------------------------------------------------------


@query(
    "q7v_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ),
    n AS (SELECT COUNT(*) AS n FROM d),
    c AS (SELECT digit, COUNT(*) AS observed FROM d GROUP BY digit)
    SELECT c.digit, c.observed,
           ROUND(LOG10(1.0 + 1.0 / CAST(c.digit AS DOUBLE)), 9)
             AS benford_p,
           ROUND((CAST(c.observed AS DOUBLE) / CAST(n.n AS DOUBLE)
                  - LOG10(1.0 + 1.0 / CAST(c.digit AS DOUBLE)))
                 * (CAST(c.observed AS DOUBLE) / CAST(n.n AS DOUBLE)
                  - LOG10(1.0 + 1.0 / CAST(c.digit AS DOUBLE))), 9)
             AS sq_dev
    FROM c, n
    """,
)
def q7v_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    bp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    frac = F.col("observed").cast("double") / F.col("n").cast("double")
    return (
        c.join(F.broadcast(n))
        .select(
            "digit",
            "observed",
            F.round(bp, 9).alias("benford_p"),
            F.round((frac - bp) * (frac - bp), 9).alias("sq_dev"),
        )
    )


# --------------------------------------------------------------------------
# q7x — population-stability-index drift audit (PSI): the standard
# "did this feature's distribution move between two periods" monitor.
# Events are split at the midpoint of their time span (a pure
# expression against a broadcast 1-row bound table), `value` is
# binned into 10 fixed-width bands, and PSI = Σ (p1−p2)·ln(p1/p2)
# with Laplace-smoothed proportions (p = (c+1)/(n+10)) so an empty
# band never produces ±inf. Counts are exact integers; each log term
# is rounded half-up to 9 dp via the scaled-long trick before the
# order-independent sum. One groupBy shuffle; the 10-band table and
# the margins are broadcast-sized.
# --------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_WIDTH = 50.0  # value ∈ [0, 500) in the fixtures


@query(
    "q7x_psi_drift",
    oracle=f"""
    WITH bounds AS (
      SELECT EPOCH(MIN(ts)) AS lo, EPOCH(MAX(ts)) AS hi FROM events
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(value / {_PSI_WIDTH}) AS INTEGER), {_PSI_BINS - 1}) AS bin,
             CASE WHEN EPOCH(ts) * 2 <= lo + hi THEN 0 ELSE 1 END AS half
      FROM events, bounds
    ),
    cells AS (
      SELECT bin,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
      FROM binned GROUP BY bin
    ),
    n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM cells),
    terms AS (
      SELECT ((CAST(c1 + 1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + {_PSI_BINS}.0))
              - (CAST(c2 + 1 AS DOUBLE) / (CAST(n2 AS DOUBLE) + {_PSI_BINS}.0)))
             * LN((CAST(c1 + 1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + {_PSI_BINS}.0))
                  / (CAST(c2 + 1 AS DOUBLE) / (CAST(n2 AS DOUBLE) + {_PSI_BINS}.0)))
             AS term
      FROM cells, n
    )
    SELECT (SELECT CAST(n1 AS BIGINT) FROM n) AS n_first,
           (SELECT CAST(n2 AS BIGINT) FROM n) AS n_second,
           CAST(SUM(CAST(FLOOR(term * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 AS psi
    FROM terms
    """,
)
def q7x_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.unix_timestamp(F.min("ts")).alias("lo"),
        F.unix_timestamp(F.max("ts")).alias("hi"),
    )
    binned = e.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(F.col("value") / _PSI_WIDTH).cast("int"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        F.when(
            F.unix_timestamp("ts") * 2 <= F.col("lo") + F.col("hi"), 0
        )
        .otherwise(1)
        .alias("half"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    n = cells.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    p1 = (F.col("c1") + 1).cast("double") / (
        F.col("n1").cast("double") + F.lit(float(_PSI_BINS))
    )
    p2 = (F.col("c2") + 1).cast("double") / (
        F.col("n2").cast("double") + F.lit(float(_PSI_BINS))
    )
    term = (p1 - p2) * F.log(p1 / p2)
    psi = (
        F.sum(F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")).cast("double")
        / F.lit(1e9)
    ).alias("psi")
    return (
        cells.crossJoin(F.broadcast(n))
        .agg(psi)
        .crossJoin(
            F.broadcast(
                n.select(
                    F.col("n1").cast("bigint").alias("n_first"),
                    F.col("n2").cast("bigint").alias("n_second"),
                )
            )
        )
        .select("n_first", "n_second", "psi")
    )


# --------------------------------------------------------------------------
# q7o — CDC changelog apply (the Debezium/ordered-upsert op q7b's
# single-batch merge does NOT cover: here a log of I/U/D operations
# with per-key sequence numbers must collapse to latest-wins state,
# deletes removing the key entirely). Latest-wins is one aggregation —
# max of a (lsn, op, payload) struct per key (lsn is unique per key,
# so the struct max IS argmax-by-lsn; no window, no sort) — followed
# by a delete filter. At 100 TB this is the hourly CDC-apply job: one
# shuffle on the key, state one row per key, deletes are free. The
# changelog is derived deterministically from orders (every key
# inserts at lsn 1; keys ≡0 mod 3 update at lsn 2; keys ≡0 mod 7
# delete at lsn 3) so both engines replay the identical log.
# --------------------------------------------------------------------------


@query(
    "q7o_cdc_apply",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
      FROM orders
    ),
    log AS (
      SELECT k, 1 AS lsn, 'I' AS op, st, pc FROM base
      UNION ALL
      SELECT k, 2 AS lsn, 'U' AS op, 'U' AS st, pc + 100000 AS pc
      FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT k, 3 AS lsn, 'D' AS op, st, pc FROM base WHERE k % 7 = 0
    ),
    latest AS (
      SELECT k, ARG_MAX(op, lsn) AS op, ARG_MAX(st, lsn) AS st,
             ARG_MAX(pc, lsn) AS pc
      FROM log GROUP BY k
    )
    SELECT st AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(pc) AS BIGINT) AS price_cents
    FROM latest WHERE op <> 'D' GROUP BY st
    """,
)
def q7o_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("pc"),
    )
    log = (
        base.select("k", F.lit(1).alias("lsn"), F.lit("I").alias("op"), "st", "pc")
        .unionAll(
            base.filter(F.col("k") % 3 == 0).select(
                "k",
                F.lit(2).alias("lsn"),
                F.lit("U").alias("op"),
                F.lit("U").alias("st"),
                (F.col("pc") + 100000).alias("pc"),
            )
        )
        .unionAll(
            base.filter(F.col("k") % 7 == 0).select(
                "k", F.lit(3).alias("lsn"), F.lit("D").alias("op"), "st", "pc"
            )
        )
    )
    latest = log.groupBy("k").agg(
        F.max(F.struct("lsn", "op", "st", "pc")).alias("m")
    )
    return (
        latest.filter(F.col("m.op") != "D")
        .groupBy(F.col("m.st").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("m.pc").cast("bigint").alias("price_cents"),
        )
    )


# --------------------------------------------------------------------------
# q1p — bag-semantics set operations (INTERSECT ALL / EXCEPT ALL),
# the multiset complement of q52/q53's set-semantics pair. Spark
# lowers intersectAll/exceptAll to a count-per-row aggregate plus a
# replicate generator — one shuffle on the row key with map-side
# partial counts, never a row-by-row comparison — so the plan is
# combine-friendly and scales with distinct keys, not raw rows.
# --------------------------------------------------------------------------


@query(
    "q1p_bag_setops",
    oracle="""
    SELECT 'intersect_all' AS op, nationkey FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      INTERSECT ALL
      SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    )
    UNION ALL
    SELECT 'except_all' AS op, nationkey FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      EXCEPT ALL
      SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    )
    """,
)
def q1p_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("bigint").alias("nationkey")
    )
    ia = c.intersectAll(s).select(
        F.lit("intersect_all").alias("op"), "nationkey"
    )
    ea = c.exceptAll(s).select(F.lit("except_all").alias("op"), "nationkey")
    return ia.unionAll(ea)
