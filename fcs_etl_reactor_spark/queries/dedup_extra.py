"""Rows-only query registrations for the approx/engine-specific dedup
and similarity operators (SURVEY.md §2.11 L2, SimHash, P6 sampling).

No SQL oracle exists for these (xxhash64 permutations and sampling are
engine-specific); the driver records the weaker rows-only check, and
tests/test_operators.py pins their semantics with goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_candidates,
)
from fcs_etl_reactor_spark.operators.similarity import cosine_topk_fast
from fcs_etl_reactor_spark.queries import query


@query("q56_minhash_lsh")
def q56_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: shingle → 64-perm MinHash → 16-band LSH candidate pairs."""
    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, num_perm=64, bands=16)


@query("q57_simhash_candidates")
def q57_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 64-bit fingerprints banded into 4×16-bit keys."""
    d = load(spark, sf_dir, "documents")
    return simhash_candidates(d, "doc_id", "text", band_bits=16)


@query("q58_sampling")
def q58_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: seeded Bernoulli sample + stratified sampleBy (plot-scale
    subsets of event data). Nondeterministic across engines → rows-only.
    """
    e = load(spark, sf_dir, "events")
    frac = {t: 0.2 for t in ["click", "view", "purchase", "signup", "error"]}
    return e.sampleBy("event_type", frac, seed=42)


@query("q59_cosine_topk_fast")
def q59_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 bench path: plain-double array-fold cosine (float reduction
    order differs from SQL engines → rows-only; q91 is the exact twin).
    """
    e = load(spark, sf_dir, "embeddings")
    return cosine_topk_fast(
        e.filter(F.col("label") == 0), e.filter(F.col("label") == 1), k=5
    )
