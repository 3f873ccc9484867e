"""Scalar-function surface (SURVEY.md §2.8 F1-F8): string, date/time,
math, JSON, map/struct, hash, casts. All JVM-side built-ins — these
stay inside WholeStageCodegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q60 — string functions (F1).
# --------------------------------------------------------------------------


@query(
    "q60_string_funcs",
    oracle="""
    SELECT
      c_custkey,
      UPPER(c_name) AS name_upper,
      LOWER(c_mktsegment) AS seg_lower,
      SUBSTR(c_name, 1, 8) AS name_prefix,
      LENGTH(c_name) AS name_len,
      CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
      REPLACE(c_name, 'Customer', 'Cust') AS name_short,
      TRIM(c_name) AS name_trim,
      CAST(STRPOS(c_name, '#') AS INTEGER) AS hash_pos
    FROM customer
    """,
)
def q60_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
    )


# --------------------------------------------------------------------------
# q61 — regex + split (F1): token extraction — regexp_extract and
# split agree between engines on RE2-compatible patterns.
# --------------------------------------------------------------------------


@query(
    "q61_regex",
    oracle="""
    SELECT
      p_partkey,
      REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
      CAST(LENGTH(STRING_SPLIT(p_name, ' ')) AS INTEGER) AS n_words,
      CASE WHEN REGEXP_MATCHES(p_type, 'STANDARD|PROMO') THEN 1 ELSE 0 END AS is_std_promo
    FROM part
    """,
)
def q61_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.when(F.col("p_type").rlike("STANDARD|PROMO"), 1).otherwise(0).alias("is_std_promo"),
    )


# --------------------------------------------------------------------------
# q62 — date/time functions (F2): calendar math on order dates.
# --------------------------------------------------------------------------


@query(
    "q62_datetime",
    oracle="""
    SELECT
      o_orderkey,
      CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
      CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
      CAST(DAYOFMONTH(o_orderdate) AS INTEGER) AS order_day,
      CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
      CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
      CAST(DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
        AS days_since_epoch_start,
      CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q62_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


# --------------------------------------------------------------------------
# q63 — math functions (F3): log10 is load-bearing for FCS transforms.
# Per-row transcendental results are rounded to 9 dp to absorb libm
# last-ulp differences between JVM and C implementations.
# --------------------------------------------------------------------------


@query(
    "q63_math_funcs",
    oracle="""
    SELECT
      event_id,
      ROUND(LOG10(value), 9) AS log10_value,
      ROUND(LN(value), 9) AS ln_value,
      ROUND(SQRT(value), 9) AS sqrt_value,
      ROUND(POW(value, 0.5), 9) AS pow_half,
      ABS(value - 100) AS abs_centered,
      ROUND(value, 1) AS value_round1,
      CAST(FLOOR(value) AS BIGINT) AS value_floor,
      CAST(CEIL(value) AS BIGINT) AS value_ceil,
      CAST(SIGN(value - 100) AS INTEGER) AS sign_centered,
      GREATEST(value, 100.0) AS geq100,
      LEAST(value, 100.0) AS leq100
    FROM events
    WHERE value > 0
    """,
)
def q63_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    return e.select(
        "event_id",
        F.round(F.log10("value"), 9).alias("log10_value"),
        F.round(F.log("value"), 9).alias("ln_value"),
        F.round(F.sqrt("value"), 9).alias("sqrt_value"),
        F.round(F.pow("value", F.lit(0.5)), 9).alias("pow_half"),
        F.abs(F.col("value") - 100).alias("abs_centered"),
        F.round(F.col("value"), 1).alias("value_round1"),
        F.floor("value").alias("value_floor"),
        F.ceil("value").alias("value_ceil"),
        F.signum(F.col("value") - 100).cast("int").alias("sign_centered"),
        F.greatest(F.col("value"), F.lit(100.0)).alias("geq100"),
        F.least(F.col("value"), F.lit(100.0)).alias("leq100"),
    )


# --------------------------------------------------------------------------
# q64 — JSON extraction (F6) over events.props.
# --------------------------------------------------------------------------


@query(
    "q64_json_extract",
    oracle="""
    SELECT
      event_id,
      CAST(props->>'k' AS INTEGER) AS k,
      CAST(JSON_VALID(props) AS INTEGER) AS is_valid
    FROM events
    """,
)
def q64_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.when(F.get_json_object("props", "$.k").isNotNull(), 1)
        .otherwise(0)
        .alias("is_valid"),
    )


# --------------------------------------------------------------------------
# q65 — hashing (F7): stable digests for dedup keys. md5/sha are
# engine-portable; xxhash64 is Spark-specific (kept out of oracles).
# --------------------------------------------------------------------------


@query(
    "q65_hashing",
    oracle="""
    SELECT
      doc_id,
      MD5(text) AS md5_hex,
      SHA256(text) AS sha256_hex
    FROM documents
    """,
)
def q65_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
    )


# --------------------------------------------------------------------------
# q66 — casts across the type lattice (F8), ANSI semantics.
# --------------------------------------------------------------------------


@query(
    "q66_casts",
    oracle="""
    SELECT
      l_orderkey,
      CAST(l_quantity AS INTEGER) AS qty_i,
      CAST(l_quantity AS VARCHAR) AS qty_s,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dp,
      CAST(l_linenumber AS DOUBLE) AS line_d,
      CAST(l_shipdate AS DATE) AS ship_day,
      CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day_s
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q66_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return l.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_i"),
        F.col("l_quantity").cast("decimal(18,1)").cast("string").alias("qty_s"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_2dp"),
        F.col("l_linenumber").cast("double").alias("line_d"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day_s"),
    )


# --------------------------------------------------------------------------
# q67 — map/struct construction + field access (F5). The struct and
# map are BUILT and accessed in-plan; the struct leaves the query
# serialized as JSON (a top-level STRUCT cell crashes the driver's
# canonicalizer), and map access surfaces as the extracted value.
# --------------------------------------------------------------------------


@query(
    "q67_struct_map",
    oracle="""
    SELECT
      n_nationkey,
      '{"n_name":"' || n_name || '","n_regionkey":' || n_regionkey || '}'
        AS nation_struct_json,
      STRUCT_EXTRACT({'n_name': n_name, 'n_regionkey': n_regionkey}, 'n_name')
        AS sname,
      MAP(['key'], [n_regionkey])['key'][1] AS region_from_map
    FROM nation
    """,
)
def q67_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    st = F.struct(F.col("n_name"), F.col("n_regionkey"))
    m = F.create_map(F.lit("key"), F.col("n_regionkey"))
    return n.select(
        "n_nationkey",
        F.to_json(st).alias("nation_struct_json"),
        st.getField("n_name").alias("sname"),
        m.getItem("key").alias("region_from_map"),
    )


# --------------------------------------------------------------------------
# q68 — fuzzy string ops (F1 completion): levenshtein distance (the
# dedup-adjacent primitive), padding, repetition, character translate.
# All per-row JVM built-ins with exact DuckDB twins.
# --------------------------------------------------------------------------


@query(
    "q68_fuzzy_string",
    oracle="""
    SELECT
      p_partkey,
      CAST(LEVENSHTEIN(p_brand, 'Brand#00') AS INTEGER) AS brand_dist,
      CAST(LEVENSHTEIN(p_type, 'STANDARD POLISHED TIN') AS INTEGER) AS type_dist,
      LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      REPEAT(p_brand, 2) AS brand_twice,
      REPLACE(TRANSLATE(p_brand, '#', '-'), 'Brand', 'B') AS brand_slug
    FROM part
    """,
)
def q68_fuzzy_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#00")).alias("brand_dist"),
        F.levenshtein("p_type", F.lit("STANDARD POLISHED TIN")).alias("type_dist"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.replace(
            F.translate("p_brand", "#", "-"), F.lit("Brand"), F.lit("B")
        ).alias("brand_slug"),
    )


# --------------------------------------------------------------------------
# q69 — three-valued-logic / null semantics: NULLIF-derived nulls,
# null-skipping COUNT, IS [NOT] DISTINCT FROM (Spark: eqNullSafe),
# COALESCE. Fixtures are null-free, so the nulls are derived — the
# point is that both engines agree on every 3VL edge.
# --------------------------------------------------------------------------


@query(
    "q69_null_semantics",
    oracle="""
    WITH x AS (
      SELECT event_id,
             NULLIF(event_type, 'click') AS a,
             NULLIF(event_type, 'view') AS b
      FROM events
    )
    SELECT
      COUNT(*) AS n,
      COUNT(a) AS n_a_nonnull,
      CAST(SUM(CASE WHEN a IS DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT)
        AS n_distinct_from,
      CAST(SUM(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT)
        AS n_null_safe_eq,
      COUNT(COALESCE(a, b)) AS n_coalesce
    FROM x
    """,
)
def q69_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    a = F.nullif(F.col("event_type"), F.lit("click"))
    b = F.nullif(F.col("event_type"), F.lit("view"))
    x = e.select(a.alias("a"), b.alias("b"))
    ns_eq = F.col("a").eqNullSafe(F.col("b"))
    return x.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("a").alias("n_a_nonnull"),
        F.sum(F.when(~ns_eq, 1).otherwise(0)).cast("bigint").alias("n_distinct_from"),
        F.sum(F.when(ns_eq, 1).otherwise(0)).cast("bigint").alias("n_null_safe_eq"),
        F.count(F.coalesce("a", "b")).alias("n_coalesce"),
    )


# --------------------------------------------------------------------------
# q49 — calendar completion (F2): constructors, month arithmetic,
# boundary snapping, ISO parts. add_months clamps to month-end in both
# engines (e.g. Jan 31 + 1 month = Feb 28/29).
# --------------------------------------------------------------------------


@query(
    "q49_calendar_parts",
    oracle="""
    SELECT
      o_orderkey,
      CAST(MAKE_DATE(CAST(YEAR(o_orderdate) AS INTEGER),
                     CAST(MONTH(o_orderdate) AS INTEGER), 1) AS DATE) AS month_first,
      CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_last,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
      CAST(DAYOFWEEK(o_orderdate) AS INTEGER) + 1 AS dow_sun1,
      CAST(WEEKOFYEAR(o_orderdate) AS INTEGER) AS iso_week
    FROM orders
    """,
)
def q49_calendar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_first"
        ),
        F.last_day(d).alias("month_last"),
        F.add_months(d, 3).alias("plus3m"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


# --------------------------------------------------------------------------
# q7 — JSON structural parsing (F6 completion): from_json into a typed
# struct (the schema-on-read path — at scale this parses once into
# columnar form instead of per-access get_json_object scans),
# plus schema introspection fields.
# --------------------------------------------------------------------------


@query(
    "q7_json_struct",
    oracle="""
    SELECT
      event_id,
      CAST(props->>'k' AS INTEGER) AS k_typed,
      CAST(props->>'k' AS INTEGER) * 2 AS k_doubled,
      CAST(JSON_ARRAY_LENGTH(JSON_KEYS(CAST(props AS JSON))) AS INTEGER) AS n_keys
    FROM events
    """,
)
def q7_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        (parsed["k"] * 2).alias("k_doubled"),
        F.size(F.json_object_keys("props")).alias("n_keys"),
    )


# --------------------------------------------------------------------------
# q5a — error-tolerant expressions: try_cast / try_divide return NULL
# where ANSI mode would abort the job — at 100 TB one malformed row
# must not kill a 10-hour pipeline. DuckDB twins: TRY_CAST and
# NULLIF-guarded division.
# --------------------------------------------------------------------------


@query(
    "q5a_try_functions",
    oracle="""
    SELECT
      p_partkey,
      TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
      TRY_CAST(REPLACE(p_brand, 'Brand#', '') AS INTEGER) AS brand_num,
      p_retailprice / NULLIF(CAST(p_size AS DOUBLE) - 25.0, 0.0) AS price_per_off25
    FROM part
    """,
)
def q5a_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.replace("p_brand", F.lit("Brand#"), F.lit(""))
        .try_cast("int")
        .alias("brand_num"),
        F.try_divide(
            F.col("p_retailprice"),
            F.nullif(F.col("p_size").cast("double") - 25.0, F.lit(0.0)),
        ).alias("price_per_off25"),
    )


# --------------------------------------------------------------------------
# q7n — VARIANT semi-structured type (F6 scale path, Spark 4):
# parse_json once into the binary-encoded VARIANT, then typed-path
# extraction (variant_get) WITHOUT re-parsing per access — at 100 TB
# the parse cost is paid once per row, not once per field reference,
# and shredded variant columns carry statistics ordinary JSON strings
# can't. schema_of_variant proves the inferred runtime type; the
# oracle pins it as a literal.
# --------------------------------------------------------------------------


@query(
    "q7n_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           'OBJECT<k: BIGINT>' AS props_schema
    FROM events GROUP BY event_type
    """,
)
def q7n_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_k"),
        F.min(F.schema_of_variant(F.col("v"))).alias("props_schema"),
    )


# --------------------------------------------------------------------------
# q5d — SQL UDF (U-family, Spark 4 CREATE FUNCTION ... RETURN expr):
# unlike a Python UDF, a SQL UDF is INLINED into the plan at analysis
# time — the aggregate below runs entirely in whole-stage codegen
# (asserted in tests/test_udfs.py), so abstraction costs nothing at
# 100 TB. The oracle states the inlined expression directly.
# --------------------------------------------------------------------------

_Q5D_SUM = (
    "CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
    " / 1000000.0 AS revenue"
)


@query(
    "q5d_sql_udf",
    oracle=f"""
    SELECT l_returnflag,
           {_Q5D_SUM.format(expr="l_extendedprice * (1 - l_discount)")},
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q5d_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q5d_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q5d_disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               {_Q5D_SUM.format(expr="q5d_disc_price(l_extendedprice, l_discount)")},
               COUNT(*) AS n_lines
        FROM q5d_lineitem
        GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# q5e — exact DECIMAL aggregation (F8/A-family): money sums on the
# long-backed decimal fast path. SUM over DECIMAL is associative and
# exact (no IEEE reassociation drift), so the total is deterministic
# on ANY partitioning without the scaled-integer trick — the
# trade-off vs functions/exact.dsum is ~4× slower codegen (measured
# there), which is why dsum carries the hot paths and decimal is the
# semantic reference. Final cast to DOUBLE keeps the cross-engine
# schema identical.
# --------------------------------------------------------------------------


@query(
    "q5e_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q5e_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# q5g — Python UDTF in a lateral join (U5, SURVEY §2.12): the n-gram
# expander UDTF fans each document into (gram, start_pos, n) rows for
# n ∈ [1,3]; the query aggregates per (doc, n). The oracle replays
# the same expansion with pure SQL list arithmetic, so the UDTF's
# row-generation logic (tokenization, window bounds, join shape) is
# value-hash-verified — upgrading U5 from test-only to driver-checked.
# Scale note: UDTFs are the row-at-a-time escape hatch; the JVM-side
# explode/transform pipeline (queries/text.py) is the hot path — this
# query exists to verify the U5 surface, not to recommend it at 100 TB.
# --------------------------------------------------------------------------


@query(
    "q5g_udtf_ngrams",
    # DuckDB 1.0 cannot bind a lateral-correlated slice length, so
    # each n is its own branch (same pattern as the Jaccard oracle)
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, CAST(1 AS INTEGER) AS n, w[i] AS gram
      FROM (SELECT doc_id, w,
                   UNNEST(RANGE(1, GREATEST(LEN(w), 0) + 1)) AS i FROM toks)
      UNION ALL
      SELECT doc_id, 2, w[i] || ' ' || w[i+1]
      FROM (SELECT doc_id, w,
                   UNNEST(RANGE(1, GREATEST(LEN(w) - 1, 0) + 1)) AS i FROM toks)
      UNION ALL
      SELECT doc_id, 3, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      FROM (SELECT doc_id, w,
                   UNNEST(RANGE(1, GREATEST(LEN(w) - 2, 0) + 1)) AS i FROM toks)
    )
    SELECT doc_id, n,
           COUNT(*) AS n_grams,
           COUNT(DISTINCT gram) AS n_distinct
    FROM grams
    GROUP BY doc_id, n
    """,
)
def q5g_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.udtfs import NGramExpander

    spark.udtf.register("fcs_ngram_expand", NGramExpander)
    load(spark, sf_dir, "documents").createOrReplaceTempView("q5g_docs")
    return spark.sql(
        """
        SELECT d.doc_id, g.n,
               COUNT(*) AS n_grams,
               COUNT(DISTINCT g.gram) AS n_distinct
        FROM q5g_docs d, LATERAL fcs_ngram_expand(d.text, 1, 3) g
        GROUP BY d.doc_id, g.n
        """
    )


# --------------------------------------------------------------------------
# q5t — the Observation API (df.observe): production pipelines attach
# named metric expressions to a DataFrame and read them AFTER an
# action, without a second scan — the built-in data-quality /
# lineage-metrics channel (X-surface beside SQL UDF q5d and the
# Python Data Source q5m). The query runs ONE noop-sink action over
# orders with three observed aggregates and returns the observed
# metrics as the result row; the metrics ride the action, so the
# scan happens once. Sums go through the scaled-long discipline.
# The 1-row driver hop is the API's design (metrics, not data).
# --------------------------------------------------------------------------


@query(
    "q5t_observed_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total_price,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_urgent
    FROM orders
    """,
)
def q5t_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("q5t_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                )
            ).cast("double")
            / 100.0
        ).alias("total_price"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("bigint")
        .alias("n_urgent"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), float(m["total_price"]), int(m["n_urgent"]))],
        "n_rows long, total_price double, n_urgent long",
    )


# --------------------------------------------------------------------------
# q1r — Jaro-Winkler similarity (functions/strsim.py): the fuzzy-
# match scorer q68's levenshtein can't substitute (JW weighs shared
# prefixes and tolerates transpositions — the name-matching staple).
# Scores every part name against a probe phrase plus the name/type
# cross-field pair, through the vectorized Arrow UDF; semantics are
# bit-exact vs DuckDB's vendored rapidfuzz implementation (boost only
# above 0.7 Jaro, prefix cap 4), so no rounding tolerance is needed.
# Top-50 by (similarity DESC, key) keeps the output stable.
# --------------------------------------------------------------------------


@query(
    "q1r_jaro_winkler",
    oracle="""
    SELECT p_partkey,
           jaro_winkler_similarity(p_name,
             'goldenrod lavender spring chocolate lace') AS jw_probe
    FROM part
    ORDER BY jw_probe DESC, p_partkey
    LIMIT 50
    """,
)
def q1r_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.strsim import jaro_winkler_udf

    jw = jaro_winkler_udf()
    p = load(spark, sf_dir, "part")
    probe = F.lit("goldenrod lavender spring chocolate lace")
    return (
        p.select(
            "p_partkey",
            jw(F.col("p_name"), probe).alias("jw_probe"),
        )
        .orderBy(F.col("jw_probe").desc(), "p_partkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# q9u — collation-aware grouping (round-10 mint; Spark 4 collation
# support, SPARK-46830): GROUP BY a UTF8_LCASE-collated key groups
# case-insensitively INSIDE the engine — comparisons, hash and sort
# all honor the collation, so there is no normalize-then-group rewrite
# for downstream to forget (the classic entity-dedup footgun where one
# code path lowercases and another doesn't). The fixture derives a
# mixed-case key deterministically (even keys UPPER, odd keys lower),
# groups under UTF8_LCASE, and ALSO counts the distinct binary-cased
# variants inside each CI group — the case-sensitive and case-
# insensitive semantics side by side in one result. The oracle replays
# with lower()-grouping, the pre-collation rewrite — an equivalence
# that holds on THESE fixtures because the keys are ASCII: UTF8_LCASE
# full-Unicode case folding and lower() diverge on e.g. Turkish dotted
# I and German ß, so the oracle's rewrite is ASCII-scoped, not a
# general identity. Scale shape: one
# shuffle, same as any groupBy; collation only changes the comparator.
# --------------------------------------------------------------------------


@query(
    "q9u_collated_grouping",
    oracle="""
    SELECT lower(o_orderpriority) AS prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT))
                AS BIGINT) AS price_cents,
           CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 0
                                    THEN upper(o_orderpriority)
                                    ELSE lower(o_orderpriority) END)
                AS BIGINT) AS n_cased_variants
    FROM orders GROUP BY 1
    """,
)
def q9u_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH s AS (
          SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                      ELSE lower(o_orderpriority)
                 END COLLATE UTF8_LCASE AS pr,
                 o_totalprice
          FROM orders
        )
        SELECT CAST(lower(pr) AS STRING) AS prio,
               COUNT(*) AS n_orders,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                 AS price_cents,
               COUNT(DISTINCT CAST(pr AS STRING)) AS n_cased_variants
        FROM s GROUP BY pr
        """
    )


# --------------------------------------------------------------------------
# q9v — correlated LATERAL subquery (round-10 mint): top-N-per-key
# written the way an application developer writes it — a per-row
# correlated subquery with ORDER BY ... LIMIT in the FROM clause —
# rather than the window-function form (q44) or the combiner form
# (q1y). Catalyst decorrelates the LATERAL into a ranked join (the
# DomainJoin rewrite), so the declared row-at-a-time semantics
# execute as ONE set-oriented plan: no per-outer-row re-execution
# exists anywhere, which is exactly why the surface is safe at 100 TB.
# DuckDB's native LATERAL is the oracle. acctbal is emitted in exact
# cents (scaled BIGINT) per the cross-engine float protocol.
# --------------------------------------------------------------------------


@query(
    "q9v_lateral_topn",
    oracle="""
    SELECT n.n_name, l.c_name, l.bal_cents
    FROM nation n, LATERAL (
      SELECT c_name,
             CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY bal_cents DESC, c_name
      LIMIT 2
    ) l
    """,
)
def q9v_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.bal_cents
        FROM nation n, LATERAL (
          SELECT c_name,
                 CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, c_name
          LIMIT 2
        ) l
        """
    )


# --------------------------------------------------------------------------
# q9x — LISTAGG ... WITHIN GROUP (round-10 mint; Spark 4 SPARK-42746,
# the ANSI ordered string aggregation): the statement-level form of
# the concat_ws(array_sort(collect_list(...))) composition the
# envelope queries build by hand. The WITHIN GROUP order clause is
# what makes a string aggregate deterministic — without it the result
# depends on partitioning and could never hash-match an oracle. The
# per-group ORDER BY sorts inside each group's collected buffer
# (group-bounded, never a global sort); DuckDB's string_agg with an
# ORDER BY argument is the oracle. Customer-count and longest-name
# columns ride along so the hash also pins group membership.
# --------------------------------------------------------------------------


@query(
    "q9x_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(MAX(LENGTH(n_name)) AS INTEGER) AS max_name_len
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q9x_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)
                 AS nations,
               COUNT(*) AS n_nations,
               MAX(LENGTH(n_name)) AS max_name_len
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )
