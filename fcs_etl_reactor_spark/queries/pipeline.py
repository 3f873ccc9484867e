"""Training-data pipeline operators beyond dedup/similarity
(SURVEY.md §2.11 family): deterministic splitting, ordering, and
context-window packing — the steps between "corpus is clean" and
"batches hit the trainer".

Cross-engine determinism trick: both Spark and DuckDB expose MD5 over
strings with identical output, so hash-derived decisions (split
assignment, shuffle order) are bit-identical in the oracle — unlike
xxhash64/random(), which are engine-specific. MD5 is cryptographic
overkill but it is the one hash both engines share; at 100 TB the
per-row cost is still trivial next to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q6a — deterministic train/val/test split: bucket = md5(id||salt)
# mod 100 → 80/10/10. Hash-based (not random()) so the split is
# reproducible across engines, runs, and repartitionings, and any row
# can be re-assigned without global state — the property that matters
# when the corpus is re-sharded between pipeline versions.
# --------------------------------------------------------------------------

_SPLIT_SALT = "split-v1"


@query(
    "q6a_train_test_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '{_SPLIT_SALT}'), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT
      CASE WHEN bucket < 80 THEN 'train'
           WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      lang,
      COUNT(*) AS n_docs
    FROM b
    GROUP BY 1, 2
    """,
)
def q6a_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# q6b — deterministic global shuffle: training order = rank of
# md5(id||seed). A seeded hash sort is how you shuffle 100 TB — no
# driver-side RNG state, stable under re-execution and resumable from
# any offset; changing the seed string reshuffles.
# --------------------------------------------------------------------------

_SHUFFLE_SEED = "epoch-0"


@query(
    "q6b_shuffle_order",
    oracle=f"""
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY MD5(CAST(doc_id AS VARCHAR) || '{_SHUFFLE_SEED}'), doc_id
           ) AS train_order
    FROM documents
    """,
)
def q6b_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUFFLE_SEED)))
    # single global window = single-reducer rank; fine for a result the
    # trainer consumes in order. The 100 TB form writes range-partitioned
    # sorted output (repartitionByRange(h).sortWithinPartitions) and
    # derives the global offset from partition boundaries instead of
    # materializing one total order through one task.
    w = Window.orderBy(h, "doc_id")
    return d.select("doc_id", F.row_number().over(w).alias("train_order"))


# --------------------------------------------------------------------------
# q6c — context-window packing: greedy sequential fill of 4096-token
# windows in a deterministic document order. chunk = floor(cumulative
# tokens BEFORE this doc / capacity) — the streaming-friendly
# approximation of first-fit packing (a doc may straddle a boundary;
# exact bin packing is NP-hard and needs no more fidelity here).
# Expressed as a running-sum window — one shuffle, no Python.
# --------------------------------------------------------------------------

_CTX_TOKENS = 4096


@query(
    "q6c_context_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tokens_before
      FROM t
    )
    SELECT CAST(FLOOR(tokens_before / {_CTX_TOKENS}) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           SUM(n_tokens) AS chunk_tokens
    FROM c
    GROUP BY 1
    """,
)
def q6c_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    c = t.withColumn(
        "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.groupBy(
            F.floor(F.col("tokens_before") / _CTX_TOKENS).alias("chunk_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
        )
    )
