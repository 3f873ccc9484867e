"""Public query registry — the driver-facing capability surface.

Every operator in SURVEY.md §2 registers here as a (Spark callable,
DuckDB SQL) pair via @query. EVERY entry carries an oracle: operators
with no verbatim SQL replay (approx sketches, seeded LSH, sampling,
streaming) register as oracle-checkable envelopes — the query runs the
full operator and emits results SQL can recompute exactly (exact
values + tolerance/recall booleans, Jaccard-verified candidate sets,
batch-equivalent SQL for availableNow/complete streams). A query
without an oracle would score as err "no_oracle" at the driver;
tests/test_registry_contract.py enforces the invariant.

Import side effects populate QUERIES/ORACLE; __spark_entry__.py simply
re-exports them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

#: Prepared-plan cache: building a DataFrame is driver-side Py4J
#: traffic (each expression is a JVM round-trip; a 9-aggregate query
#: costs ~200 ms to construct, measured). Plans are immutable and
#: lazily executed — session confs are still read at action time — so
#: re-serving the same logical plan for the same (session, sf_dir) is
#: the DataFrame analogue of a prepared-statement cache. The cache
#: lives on the session object so it can never outlive its session.
_PLAN_CACHE_ATTR = "_fcs_plan_cache"


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, with optional
    DuckDB oracle SQL (ANSI; fixture tables pre-registered as views)."""

    def deco(fn):
        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            cache = spark.__dict__.setdefault(_PLAN_CACHE_ATTR, {})
            key = (name, sf_dir.rstrip("/"))
            df = cache.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                cache[key] = df
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        QUERIES[name] = cached
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Module imports populate the registry; the driver hard-verifies the
# FIRST 50 entries per round. Positions are pinned explicitly by
# _WINDOW_PRIORITY below (import order proved fragile), so import
# order here only affects the post-window remainder. History: round 1
# verified relational/joins/aggregates/windows/setops (46/50 green);
# round 2 envelopes/scalar/domain/text/vectors (44/50); round 3's
# window (the list below) is 100% never-tested-or-failing entries.
#
# ROUND-5 ROTATION TODO (mechanical): after CORRECTNESS_r04 lands,
# replace _WINDOW_PRIORITY with (a) any r04 failures, then (b) the
# never-driver-tested entries added in round 4 (q5f_cc_star,
# q7q_png_decode, q2g_schema_evolution, q5g_udtf_ngrams,
# q5h_arrow_normalize, q5i_python_udf, q5j_xml_roundtrip,
# q5k_csv_roundtrip, q5l_json_roundtrip, q5m_fcs_datasource,
# q4f_interpolate), then
# (c) the 20 remaining round-1 greens not re-confirmed in r04 (q14
# q15 q21 q22 q28 q31 q32 q37 q38 q39 q43 q45 q47 q48 q4a q50 q51
# q52 q53 q54), then (d) oldest round-2 greens. Everything in the
# registry is differ-green at sf0.001+sf0.01 and partition-count
# invariant.
from fcs_etl_reactor_spark.queries import pipeline  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import dedup_extra  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import skew  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import media  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import events_windows  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import gates  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import streaming_extra  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import joins  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import storage  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import advanced  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import domain  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import windows  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import relational  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import aggregates  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import setops  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import envelopes  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import scalar  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import interchange  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import text  # noqa: E402,F401
from fcs_etl_reactor_spark.queries import vectors  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Explicit driver-window control. Import order proved too fragile
# (appending a query to an early module silently shifts every later
# position), so the first-50 window is now pinned by NAME: the list
# below is exactly this round's verification window — every entry
# either never driver-tested or failing in CORRECTNESS_r02 — and the
# remainder keeps registration order. Next round: edit this list.
# ---------------------------------------------------------------------------

_WINDOW_PRIORITY = [
    # 1. The ONLY standing failure: q75 hash-failed in CORRECTNESS_r02
    #    (DuckDB SUM(int) returned HUGEINT -> "65745.0" vs Spark's
    #    BIGINT "65745" in the value hash). The oracle-side
    #    CAST(... AS BIGINT) fix landed in dac242c but was never
    #    driver-retested — it goes FIRST this round.
    "q75_multimodal_features",
    # 2. The 24 registry entries never inside any driver window
    #    (union of CORRECTNESS_r01-r03): warehouse utilities,
    #    tokenizer-training family, sketches, VARIANT, SQL UDF,
    #    the end-to-end FCS chain.
    "q7a_table_fingerprint", "q7b_upsert_merge", "q7c_column_profile",
    "q7d_fk_check", "q7e_equidepth_histogram", "q7g_table_diff",
    "q7h_arcsinh_transform", "q7i_quantile_normalization",
    "q7j_fcs_pipeline", "q7k_incremental_rollup", "q7l_event_transitions",
    "q7n_variant_extract",
    "q4c_trimmed_mean", "q5d_sql_udf", "q5e_decimal_exact",
    "q8d_random_projection", "q8g_vocab_oov", "q8h_countmin",
    "q8i_chunking", "q8j_bpe_pair_counts", "q8k_trigram_lm",
    "q8l_hll_union", "q8m_bpe_encode", "q8n_approx_top_k",
    # 3. Oldest-green re-confirms: these 25 were last tested in
    #    CORRECTNESS_r01 (green) and never since; the remaining 20
    #    round-1 greens rotate in next round.
    "q1_pricing_summary", "q2_filter_predicates", "q3_conditional_recode",
    "q4_top_orders", "q5_derived_columns", "q6_correlated_subquery",
    "q9_shipping_priority", "q10_star_join_revenue",
    "q11_outer_join_counts", "q12_semi_join", "q13_anti_join",
    "q16_asof_join", "q17_order_pairs",
    "q20_basic_stats", "q23_percentiles", "q24_rollup",
    "q25_conditional_agg", "q27_log_histogram", "q29_argmax",
    "q33_grouping_sets",
    "q40_ranking", "q42_running_total", "q44_topk_per_group",
    "q46_zscore", "q55_exact_dedup",
]
assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)


def _apply_window_priority() -> None:
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"window names not registered: {missing}"
    for reg in (QUERIES, ORACLE):
        ordered = {n: reg[n] for n in _WINDOW_PRIORITY if n in reg}
        for n, v in reg.items():
            if n not in ordered:
                ordered[n] = v
        reg.clear()
        reg.update(ordered)


_apply_window_priority()
