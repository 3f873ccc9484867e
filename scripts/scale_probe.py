#!/usr/bin/env python
"""Scale probe: run the REAL engine queries on 10×-replicated fixtures.

The 100 TB argument in BENCH.md is structural (shuffle volumes, partial
aggregation, broadcasts); this script adds measurement: replicate
lineitem/orders/events 10× (with key offsets so join fan-out stays
realistic), point the unmodified queries at the new sf dir, and report
wall-clock at 1× vs 10×. Sub-linear scaling (t10 < 10·t1) demonstrates
the plans actually parallelize; a query whose time scales ≥ 10× would
be scan- or shuffle-serialized — a bug in the plan, not the box.

Usage: python scripts/scale_probe.py [base_sf_dir] (default sf0.1)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import TABLES, load, table_path
from fcs_etl_reactor_spark.queries import QUERIES
from fcs_etl_reactor_spark.session import get_spark, tune_for_input

FACTOR = 10

#: the bench.py headline set minus q91 (its exact-cosine arm is
#: O(|Q|*|C|) BY DESIGN as the ANN baseline and its query side trips
#: the deliberate 100k driver-cap guard at 100x; lsh_topk_auto IS the
#: registered scale path for that task) — used by --factor 100.
HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q10_star_join_revenue",
    "q16_asof_join",
    "q25_conditional_agg",
    "q27_log_histogram",
    "q42_running_total",
    "q44_topk_per_group",
    "q55_exact_dedup",
    "q70_compensation",
    "q81_tfidf",
    "q95_tumbling_window",
    "q97_sessionization",
    "lsh_topk_auto",
]

PROBE_QUERIES = [  # all run on the replicated tables
    "q1_pricing_summary",
    "q10_star_join_revenue",
    "q16_asof_join",
    "q25_conditional_agg",
    "q95_tumbling_window",
    "q55_exact_dedup",
    "q81_tfidf",
    "q91_cosine_topk",   # exact ANN baseline: O(|Q|·|C|) — QUADRATIC by design
    "lsh_topk_auto",     # the scale path: same task, bucketed candidates.
    # NOTE: probed as the RAW OPERATOR, not registry q92 — since round 2
    # the q92 registry entry is an oracle envelope that also computes the
    # exact verifier (deliberately quadratic); the operator alone is what
    # runs at scale.
    "q6c_context_packing",   # distributed prefix sum (global_cumsum)
    "q6f_domain_mixture",    # broadcast-stats temperature sampling
    "q18_bloom_semi_join",   # bloom-pruned semi-join
    "q5c_span_dedup",        # sub-document span dedup (digest shuffle)
    "lsh_cross_decontam",    # cross-corpus LSH, RAW operator (registry
    # q6h also computes the quadratic-side exact verifier envelope)
    "q8i_chunking",          # RAG chunking (pure map stage)
    "q8g_vocab_oov",         # top-k vocab + broadcast OOV join
    "q8h_countmin",          # bounded-memory sketch build + probe
    "q7a_table_fingerprint", # integrity digest fold (scan-bound)
    "q4d_gapfill",           # dense grid + LOCF window
    "q2a_bucketed_join",     # exchange-free SMJ (incl. one-time bucket write)
    "q2b_partition_pruned_scan",  # day-partition pruning (incl. layout write)
    "q2c_recursive_month_spine",  # WITH RECURSIVE spine + gap join
    "q7m_scd2_history",      # gaps-and-islands SCD2 run collapse
    "q8k_trigram_lm",        # n-gram LM counting topology
    "q9g_stream_stream_join",  # stream-stream interval join state at 10x
    "q8m_bpe_encode",        # vocab-dedup BPE encode (fold ~ |vocab|)
    "q2e_bucketed_window",   # shuffle-free per-key window
    "q4e_ellipse_gate",      # pure-codegen gate rollup
    "q5f_cc_star",           # large-star/small-star CC at 10x pair graph
    "q2g_schema_evolution",  # mergeSchema epochs (incl. layout write)
    "q5h_arrow_normalize",   # zero-copy Arrow kernel (pure map)
    "q5k_csv_roundtrip",     # sink->read roundtrip at 10x orders
    "q5n_pagerank",          # iterative join+agg chain at 10x edges
    "q8o_bm25",              # retrieval scoring (explode-once shape)
    "q6j_domain_kl",         # windowed-distribution divergence
    "q6k_weighted_sample",   # weighted reservoir rank per stratum
    "q3d_debounce",          # lag-pass burst collapse
    "q1c_copurchase",        # per-order-bounded pair self-join
    "q5o_triangles",         # oriented wedge join
    "q8t_power_iteration",   # Gram outer-product + dimension-bound iters
    "q8u_perplexity",        # explode-once bigram LM scoring
    "q4i_rolling_median",    # fixed-frame array median
    # round-5 continuation additions:
    "qt09_product_profit",   # 5-table TPC-H Q9 profit rollup
    "qt21_waiting_suppliers",  # EXISTS + NOT-EXISTS pair-set joins
    "q8v_kmeans",            # 3 exact Lloyd rounds (broadcast centroids)
    "q4j_spatial_grid_join", # 3x3 cell cover spatial join
    "q5q_sorted_neighborhood",  # global-rank window blocking
    "q1d_apriori_triples",   # candidate-driven support counting
    "q5r_bfs_hops",          # 3 Pregel frontier rounds
    "q8w_pmi_collocations",  # bigram transform + vocab broadcasts
    "q8e_gram_matrix",       # partition-local integer X^T X matmul
    "q5y_dbscan_core",       # eps-grid 3x3 candidate join
    "q4u_autocorrelation",   # hourly buckets + per-type lag window
    # round-5 session additions:
    "q4v_mann_whitney",      # bucket-keyed distributed rank-sum
    "q4w_ks_test",           # packed-pair distributed prefix sum
    "q3k_pattern_vshape",    # CEP run encoding (two window passes)
    "q2h_zonemap_skip",      # file-skipping band scan (incl. layout write)
    "q4z_theil_sen",         # calendar-bounded pair slopes + global_rank
    "q5z_rrf_fusion",        # bounded top-N fuse
    "q6p_gain_chart",        # distributed decile ranks
    "q8f_pca_deflation",     # Gram + two dimension-bound power chains
    "q3o_rolling_wau",       # contribute-explode sliding distinct (x7 fanout)
    "q6s_feature_hashing",   # hashing-trick bucket mass (explode pass)
    "q1h_kcore_peel",        # 3 peel rounds, materialized state
    "q1j_brand_modularity",  # edge/degree integer rollup
    "q3n_interarrival",      # bucket-local lag + boundary reattach (r6 rewrite)
    "q3l_weighted_median",   # bucket-keyed prefix sum crossing
    # round-6 additions:
    "q6w_repetition_filter",  # zip_with bigrams + doc-keyed aggs
    "q6y_lexical_diversity",  # explode + two combine-friendly aggs
    "q7o_cdc_apply",          # latest-wins struct-max per key
    "q3r_funnel_conversion",  # chained per-user MIN stages
    "q2m_pipe_syntax",        # pipe parser -> same plan as SQL twin
    # round-6 session additions:
    "q1p_bag_setops",         # count-replicate multiset ops
    "q2n_lateral_join",       # decorrelated LATERAL top-k
    "q3s_bh_fdr",             # groupBy moments + 35-row BH rank pass
    "q3t_isotonic",           # granularity-bounded min-max triple join
    "q1q_quantile_sketch",    # compactor build + tree merge + probe
    "q1s_interval_union",     # gaps-and-islands coverage (wide-key windows)
    "q3v_capped_sessions",    # per-user session walk (applyInPandas, wide key)
    "q1t_er_pipeline",        # blocking -> verify -> star contraction chain
    "q1u_sparse_cosine_join", # inverted-index sparse cosine (df-cap fanout bound)
    # round-7 rewrites (global-window lint):
    "q3f_rfm_segments",       # 3x global_rank + NTILE closed form (ex global ntile)
    "q8r_zipf_fit",           # global_rank vocab rank (ex global row_number)
    # round-7: the plan-lint exchange-heavy review flags, measured
    # (fixed-iteration chains — exchanges accumulate in ONE action's
    # plan and each executes once; probe proves scan-linearity):
    "q5v_logreg_gd",          # 3 GD steps x (scan + 8-cell reduce + 1-row bcast)
    "q1k_clustering_coeff",   # oriented wedge join (q5o-class densification)
    "q4x_mutual_information", # 35-cell contingency + 1-row n cross
    "q1i_ndcg",               # per-user rank windows + ideal-order join
    "q5u_naive_bayes",        # 5-row class stats broadcast scoring
    # round-8 mints:
    "q2r_rendezvous_sharding",  # map-side HRW argmax fanout (pure scan)
    "q3w_hll_rollup",         # sketch build + no-rescan merge rollup
    "q1w_link_prediction_ra",  # RA wedge join (q5o-class densification)
    "q2s_bloom_file_skip",    # per-file bloom index build (16-key groupBy)
    "q3x_changepoint",        # daily rollup + per-type CUSUM windows
    "q1x_label_propagation",  # 3 LPA sweeps (densified edge multiplicity)
    # round-9 mints:
    "q3y_groups_frame",       # peer-group quotient + RANGE-over-index
    "q1y_partial_topk",       # combiner top-k (bounded shuffle)
    "q2t_merge_into_sql",     # MERGE surface -> one merge-key shuffle
    "q3z_frame_exclusion",    # two shared-sort RANGE windows
    "q2u_unpivot_sql",        # Expand node, pure map fanout
    "q2v_limit_offset",       # grouped agg + offset+limit top-k
    # round-10 mints:
    "q1z_link_prediction_budgeted",  # escalated wedge-budget regime
    "q2w_merge_insert_cols",  # MERGE columns-list INSERT (one key shuffle)
    "q2x_merge_by_source",    # MERGE BY SOURCE cascade (one key shuffle)
    "q2y_keyset_pagination",  # seek predicate -> TakeOrderedAndProject
    "q9u_collated_grouping",  # UTF8_LCASE comparator groupBy
    "q9v_lateral_topn",       # decorrelated LATERAL -> WindowGroupLimit
    "q9w_bitmap_distinct",    # fixed-size bitmap agg shuffle
    "q9x_listagg",            # ordered string agg (group-bounded sort)
    # round-11 mints:
    "q9y_sharded_lsh_dedup",  # in-plan shard-union losslessness proof
    "q9z_sql_scripting",      # WHILE ratchet: rounds x pushed count scans
    "q9j_parameterized_sql",  # bound params -> pushdown + top-k
    "qa0_tablesample",        # sampled scans + envelope aggs
    "qa1_sql_udf",            # inlined SQL UDFs, LATERAL TVF
    "qa2_interval_types",     # interval-typed lag window + groupBy
]


def _lsh_topk_auto_probe(spark, sf_dir):
    from fcs_etl_reactor_spark.operators.similarity import lsh_topk_auto

    e = load(spark, sf_dir, "embeddings")
    return lsh_topk_auto(
        e.filter(F.col("label") == 0), e.filter(F.col("label") == 1), k=5
    )


def _lsh_cross_decontam_probe(spark, sf_dir):
    from fcs_etl_reactor_spark.operators.dedup import minhash_lsh_cross_pairs

    d = load(spark, sf_dir, "documents")
    return minhash_lsh_cross_pairs(
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
        "doc_id",
        "text",
    )


_EXTRA_PROBES = {
    "lsh_topk_auto": _lsh_topk_auto_probe,
    "lsh_cross_decontam": _lsh_cross_decontam_probe,
}
#: tables replicated with key offsets (fact side); the rest copy as-is
REPLICATED = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}


def build_scaled_dir(spark, base: str, dest: str, factor: int = FACTOR) -> str:
    if os.path.exists(os.path.join(dest, "_DONE")):
        return dest
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        out = os.path.join(dest, f"{t}.parquet")
        if t in REPLICATED:
            key, stride = REPLICATED[t]
            df = load(spark, base, t)
            # replicate via a broadcast-exploded copy index instead of
            # a factor-wide unionAll: one scan, one plan node, works
            # the same at factor 100 as at 10
            scaled = (
                df.crossJoin(
                    F.broadcast(
                        spark.range(factor).select(
                            F.col("id").alias("_copy")
                        )
                    )
                )
                .withColumn(key, F.col(key) + F.col("_copy") * F.lit(stride))
                .drop("_copy")
            )
            scaled.repartition(32).write.mode("overwrite").parquet(out)
        else:
            shutil.copy(table_path(base, t), out)
    open(os.path.join(dest, "_DONE"), "w").close()
    return dest


def _clear_plan_cache(spark) -> None:
    """Evict the session's prepared-plan LRU so every timed sample is
    a COLD plan build + full execution. Without this, queries that do
    real work at construction time — eager localCheckpoint rounds in
    the iterative-graph family, bounded offset-map collects in the
    global-ordering primitives — run that work once in the warmup and
    the timed samples re-execute only the post-checkpoint tail
    (measured: q1x_label_propagation "0.14 s" warm vs ~2 s cold at
    1×). The scan-plan memo in io.load stays: building a scan plan
    executes nothing, and the one-time re-chunk layout is exactly the
    kind of amortized ingest cost the probe should not re-bill."""
    from fcs_etl_reactor_spark.queries import _PLAN_CACHE_ATTR

    spark.__dict__.pop(_PLAN_CACHE_ATTR, None)


def time_query(spark, name: str, sf_dir: str, runs: int = 3) -> float:
    fn = QUERIES.get(name, _EXTRA_PROBES.get(name))
    _clear_plan_cache(spark)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        _clear_plan_cache(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("base", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--factor",
        type=int,
        default=FACTOR,
        help="replication factor (default 10; 100 runs the headline set)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated probe subset (default: full PROBE_QUERIES "
        "at factor 10, HEADLINE_QUERIES otherwise)",
    )
    args = ap.parse_args()
    if args.queries:
        probe = args.queries.split(",")
    elif args.factor == FACTOR:
        probe = PROBE_QUERIES
    else:
        probe = HEADLINE_QUERIES
    dest = (
        "/tmp/spark_graft_scale_probe"
        if args.factor == FACTOR
        else f"/tmp/spark_graft_scale_probe_{args.factor}x"
    )
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled_dir(spark, args.base, dest, factor=args.factor)

    tune_for_input(spark, args.base)
    t1 = {q: time_query(spark, q, args.base) for q in probe}
    tune_for_input(spark, dest)
    tn = {q: time_query(spark, q, dest) for q in probe}

    fx = f"{args.factor}x s"
    print(f"{'query':<28}{'1x s':>8}{fx:>9}{'scaling':>9}")
    for q in probe:
        print(f"{q:<28}{t1[q]:>8.3f}{tn[q]:>9.3f}{tn[q] / t1[q]:>8.1f}x")
    total1, totaln = sum(t1.values()), sum(tn.values())
    print(f"{'TOTAL':<28}{total1:>8.3f}{totaln:>9.3f}{totaln / total1:>8.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
