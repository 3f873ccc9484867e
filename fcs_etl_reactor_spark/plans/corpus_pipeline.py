"""End-to-end training-corpus cleaning as ONE lazy plan
(SURVEY.md §2.11 capstone; mirrors plans/fcs_pipeline.py for the FCS
domain): quality gate → near-dup dedup (LSH candidates → exact
Jaccard verify → connected components → keep canonical) → hash split.

Everything composes lazily — Catalyst sees the whole pipeline, so the
quality filter prunes the corpus BEFORE shingling (predicate order
verified in the plan), and nothing materializes between stages. At
100 TB this is the difference between one scan of the corpus and
four.

Thresholds mirror the standalone queries (q83 quality rule, q56
Jaccard ≥ 0.8, q6a md5 split) so each stage's semantics are already
individually oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.operators.dedup import (
    dedup_clusters,
    jaccard_verify_pairs,
    minhash_lsh_pairs,
)

NEARDUP_J = 0.8
SPLIT_SALT = "split-v1"


def quality_gate(docs: DataFrame) -> DataFrame:
    """q83's rule: 20-1000 tokens, mean token length 3-12 chars."""
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    avg_len = F.col("n_chars").cast("double") / F.size(toks)
    return docs.withColumn("n_tokens", n_tokens).filter(
        n_tokens.between(20, 1000) & avg_len.between(3, 12)
    )


def drop_near_dups(docs: DataFrame) -> DataFrame:
    """Keep each near-dup cluster's canonical (minimum-id) member:
    LSH candidates → exact Jaccard ≥ 0.8 → connected components →
    anti-join the non-canonical members."""
    cands = minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_perm=64, bands=16)
    verified = jaccard_verify_pairs(
        docs, cands, "doc_id", "text", n=3, threshold=NEARDUP_J
    )
    clusters = dedup_clusters(verified)
    losers = clusters.filter(~F.col("is_canonical")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti")


def assign_split(docs: DataFrame) -> DataFrame:
    """q6a's md5-bucket 80/10/10 split."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 100
    )
    return docs.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )


def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pipeline; returns (doc_id, lang, n_tokens, split) for
    every surviving document."""
    d = load(spark, sf_dir, "documents")
    survivors = assign_split(drop_near_dups(quality_gate(d)))
    return survivors.select("doc_id", "lang", "n_tokens", "split")
