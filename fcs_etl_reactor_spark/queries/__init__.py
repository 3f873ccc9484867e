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
# ROUND-4 ROTATION TODO (mechanical): replace _WINDOW_PRIORITY with
# (a) whatever CORRECTNESS_r03 marks failed, then (b) the still-never-
# tested tail — q5d/q5e/q7n (scalar), q8k/q8m (text), q8l/q8n
# (envelopes), q7g/q7k/q7l and friends if untested — then (c)
# re-confirms of the oldest green entries. Everything in the registry
# is differ-green at sf0.001+sf0.01 and partition-count invariant.
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
    # LLM-pipeline family (never tested)
    "q6a_train_test_split", "q6b_shuffle_order", "q6e_clean_corpus",
    "q6d_decontamination", "q6c_context_packing", "q6f_domain_mixture",
    "q6g_stratified_sample",
    # dedup/sampling tail (never tested)
    "q56_minhash_lsh", "q57_simhash_candidates", "q58_sampling",
    "q5b_dedup_clusters", "q5c_span_dedup", "q6h_lsh_decontamination",
    "q59_cosine_topk_fast",
    # skew (never tested)
    "q34_salted_agg", "q35_salted_join", "q19_skew_stats",
    # media/multimodal (q75 hash-failed in r2; q74 never tested)
    "q74_media_decode", "q7f_frame_sample", "q7p_image_dhash_neardup",
    # events/windows (q95-q98/q3a failed in r2; rest never tested)
    "q95_tumbling_window", "q96_sliding_window", "q97_sessionization",
    "q98_streaming_tumbling", "q99_streaming_sessions", "q3a_funnel",
    "q3b_retention_cohorts", "q4d_gapfill", "q41_event_gaps",
    "q3c_rate_anomaly",
    # gates (never tested)
    "q4b_polygon_gate", "q4e_ellipse_gate",
    # streaming tail (never tested)
    "q9a_watermark_late", "q9b_streaming_dedup", "q9d_stateful_counters",
    "q9c_stream_static_join", "q9e_foreach_batch_sink",
    "q9f_streaming_upsert", "q9g_stream_stream_join",
    # joins never-tested tail
    "q18_bloom_semi_join", "q1a_local_supplier_volume",
    "q1b_forecast_revenue",
    # storage-layout + advanced (new this round)
    "q2a_bucketed_join", "q2b_partition_pruned_scan",
    "q2c_recursive_month_spine", "q2d_zorder_key", "q2e_bucketed_window",
    "q2f_tree_closure", "q7m_scd2_history", "q6i_shard_assignment",
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
