"""Driver-checked interchange + Python-surface queries.

Upgrades four SURVEY §2 rows from test-only to oracle-checked by
running the real surface inside the driver harness and restating the
expected result in pure SQL over the source tables:

- q5h: mapInArrow (U6) — the Arrow-batch L2-normalize kernel, checked
  per-vector against SQL float arithmetic;
- q5i: Python scalar UDF (U1) — row-at-a-time UDF with an exact
  integer-arithmetic SQL twin (and a scale warning in the docstring);
- q5j: XML write→read roundtrip (X12) — content preservation checked
  by exact integer aggregation;
- q5k: CSV sink roundtrip (S5) — explicit-schema read-back, exact
  aggregation;
- q5l: JSON sink roundtrip (S5) — same discipline;
- q5m: FCS Python Data Source connector (X11) — spool read via
  format("fcs"), exact per-channel means vs the events replay.

Roundtrip scratch dirs are pid-scoped (no cross-process races) and
built once per session via the plan cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fcs_etl_reactor_spark.io import load, source_fingerprint
from fcs_etl_reactor_spark.queries import query

_SCRATCH = os.environ.get(
    "SPARK_GRAFT_INTERCHANGE_DIR", "/tmp/spark_graft_interchange"
)


def _scratch(sf_dir: str, table: str, kind: str) -> str:
    fp = source_fingerprint(sf_dir, table)
    return os.path.join(_SCRATCH, f"{kind}_{table}_{fp}_{os.getpid()}")


# --------------------------------------------------------------------------
# q5h — mapInArrow kernel (U6): L2-normalize embeddings batch-wise on
# raw Arrow buffers; the oracle recomputes unit[0] = e[0]/||e|| with
# SQL float arithmetic. Both sides sum squares in double — summation
# order differs only in the last ulp, absorbed by ROUND(…, 6).
# --------------------------------------------------------------------------


@query(
    "q5h_arrow_normalize",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) AS e0,
             (SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
              FROM UNNEST(embedding) t(x)) AS s
      FROM embeddings
    )
    SELECT vec_id,
           ROUND(CASE WHEN s > 0 THEN e0 / SQRT(s) ELSE e0 END, 6) AS unit0
    FROM n
    """,
)
def q5h_arrow_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-copy Python escape hatch, driver-verified: NumPy views
    the Arrow list buffers directly (no pandas round-trip), one
    vectorized pass per batch. Per-batch cost is O(rows·dim) with no
    per-row Python — the right shape for feature pipelines at scale."""
    from fcs_etl_reactor_spark.functions.arrow_ops import l2_normalize_arrow

    e = load(spark, sf_dir, "embeddings")
    return l2_normalize_arrow(e, "embedding").select(
        "vec_id",
        F.round(F.element_at("unit", 1), 6).alias("unit0"),
    )


# --------------------------------------------------------------------------
# q5i — Python scalar UDF (U1): deliberately integer-exact so the SQL
# twin replays it verbatim. This surface is row-at-a-time Python —
# ~10-100× slower than codegen expressions — and exists in the
# registry ONLY to verify the U1 contract; nothing in the hot paths
# uses it (the same arithmetic would be a built-in expression).
# --------------------------------------------------------------------------


@query(
    "q5i_python_udf",
    oracle="""
    SELECT (o_orderkey * 31 + 7) % 1000 AS bucket_hash,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderkey % 97 = 0
    GROUP BY 1
    """,
)
def q5i_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    mix = F.udf(lambda k: (k * 31 + 7) % 1000, T.LongType())
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return (
        o.withColumn("bucket_hash", mix("o_orderkey"))
        .groupBy("bucket_hash")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


# --------------------------------------------------------------------------
# q5j — XML write→read roundtrip (X12): nation exported with the
# native format("xml") sink, re-parsed, and aggregated with exact
# integer stats — a content-preservation proof (the instrument/config
# manifest path). One shuffle-free map per side; scale is bounded by
# the manifest size, not the data.
# --------------------------------------------------------------------------


@query(
    "q5j_xml_roundtrip",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_chars
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q5j_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import read_xml, write_xml

    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = _scratch(sf_dir, "nation", "xml")
    write_xml(n, path, row_tag="nation")
    back = read_xml(
        spark,
        path,
        row_tag="nation",
        # match the fixture's physical types (int32 keys) so the
        # roundtrip is type-faithful, not just value-faithful
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
        F.sum(F.length("n_name")).alias("name_chars"),
    )


# --------------------------------------------------------------------------
# q5k / q5l — CSV and JSON sink roundtrips (S5): write the real sink,
# read back with an EXPLICIT schema (inference is a correctness trap:
# a numeric-looking string column silently changes type), aggregate
# exactly. The oracle replays from the source table, so a hash match
# certifies the full serialize→parse cycle row-for-row.
# --------------------------------------------------------------------------

_RT_ORACLE = """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
    FROM orders
    GROUP BY o_orderstatus
"""

_RT_SCHEMA = "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING"


def _roundtrip_agg(back: DataFrame) -> DataFrame:
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum("o_custkey").alias("cust_sum"),
    )


@query("q5k_csv_roundtrip", oracle=_RT_ORACLE)
def q5k_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import read_csv, write_csv

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    path = _scratch(sf_dir, "orders", "csv")
    write_csv(o, path)
    return _roundtrip_agg(read_csv(spark, path, schema=_RT_SCHEMA))


@query("q5l_json_roundtrip", oracle=_RT_ORACLE)
def q5l_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import read_json, write_json

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    path = _scratch(sf_dir, "orders", "json")
    write_json(o, path)
    return _roundtrip_agg(read_json(spark, path, schema=_RT_SCHEMA))


# --------------------------------------------------------------------------
# q5m — the FCS Python Data Source connector (X11), driver-checked:
# the same per-event_type float64 FCS spool q7j builds is read back
# through `spark.read.format("fcs")` (one input partition per file,
# executor-side parse, Arrow-batch emission) and summarized per
# (sample, channel). Float64 FCS roundtrips losslessly, so the
# scaled-integer per-channel means equal the same statistics computed
# straight off the events table — which is exactly what the oracle
# does. This certifies the CONNECTOR path (partition planning +
# DataSourceReader.read) the way q76 certifies the parser itself.
# --------------------------------------------------------------------------


@query(
    "q5m_fcs_datasource",
    oracle="""
    SELECT event_type AS sample_id, 'VAL' AS channel, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*) AS mean_value
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'USER', COUNT(*),
           CAST(SUM(CAST(FLOOR(CAST(user_id AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000 / COUNT(*)
    FROM events GROUP BY event_type
    """,
)
def q5m_fcs_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.queries.domain import _fcs_pipeline_dir
    from fcs_etl_reactor_spark.sources.fcs_datasource import register

    register(spark)
    spool = _fcs_pipeline_dir(spark, sf_dir)
    long = spark.read.format("fcs").load(spool)
    return (
        long.groupBy(
            F.regexp_replace("sample_id", "\\.fcs$", "").alias("sample_id"),
            "channel",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
                ).cast("double")
                / 1_000_000
                / F.count(F.lit(1))
            ).alias("mean_value"),
        )
    )
