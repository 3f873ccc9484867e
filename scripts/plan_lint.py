#!/usr/bin/env python
"""Plan lint: explain EVERY registered query and flag plan smells.

Rules:
- CartesianProduct / BroadcastNestedLoopJoin on unbounded sides is a
  100 TB killer — allowed only for the registry's documented
  quadratic-by-design exact arms and deliberate small-grid crosses.
- BatchEvalPython (row-at-a-time Python UDF) is the slow path —
  allowed only in q5i_python_udf, which exists to verify that surface.
- Exchange count per query is reported (informational): every
  exchange is a shuffle; queries above the report threshold deserve a
  look, though iterative/recursive plans legitimately carry more.

Usage: python scripts/plan_lint.py [sf_dir] (default sf0.01)
Exit 1 if a hard rule fails.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcs_etl_reactor_spark.queries import QUERIES
from fcs_etl_reactor_spark.session import get_spark, tune_for_input

# Quadratic-by-design / deliberate cross joins (each documented at its
# definition): exact ANN baselines and verification arms, the small
# cross-join grid, broadcast-1-row combinations. Round 7 pruned 26
# stale entries whose plans no longer carry the pattern at EITHER
# sf0.01 or sf0.1 (vectorized-ANN rewrites, 1-row crosses now planned
# as BroadcastHashJoin) — the stale-allowlist report below keeps this
# list honest; a reintroduced cartesian there now fails loudly.
ALLOW_CARTESIAN = {
    "q14_cross_join_grid",      # deliberate small-dims grid
    "q15_theta_join_bands",     # banded theta join (broadcast side)
    "q5x_hits",                 # 1-row max-renorm broadcast cross per HITS
                                # round (visible since the r12 lazy fold —
                                # the eager checkpoint used to hide the
                                # last round's join behind a LogicalRDD)
    "q59_cosine_topk_fast",     # exact float fast path (same contract)
    "q92_lsh_topk",             # recall envelope: exact arm inside
    "q89_ivf_topk",             # recall envelope: exact arm inside
    "q8b_quantized_topk",       # agreement envelope vs exact arm
    "q8d_random_projection",    # broadcast sign-matrix cross (16x64)
    "q8_freq_items",            # 1-row envelope cross
    "q8l_hll_union",            # 1-row envelope cross
    "q8h_countmin",             # sketch-vs-exact envelope cross
    "q81_tfidf",                # 1-row corpus-size broadcast cross
    "qt11_important_parts",     # 1-row grand-total cross (non-equi >)
    "qt22_idle_customers",      # 1-row global-avg cross (non-equi >)
    "q4l_bootstrap_ci",         # 1-row point-estimate + B-row replicate cross
    "q8w_pmi_collocations",     # 1-row corpus-total crosses (n_uni, n_bg)
    "q4m_chi_square",           # 1-row n/dof crosses over 35 cells
    "q8x_join_size_estimate",   # 1-row sketch-estimate/exact/N crosses
    "q1d_apriori_triples",      # 1-row fractional-support threshold cross
    "q8y_heavy_hitters",        # 1-row corpus-N cross for the HH gate
    "q1g_association_rules",    # 1-row basket-N cross for lift
    "q7v_benford",              # 1-row digit-total cross
    "q4s_cusum",                # 1-row (n, tot) mean-denominator cross
    "q3j_decayed_counts",       # 1-row freshness-anchor (max ts) cross
    "q8z_heaps_law",            # 1-row max-doc-id decile-denominator cross
    "q5u_naive_bayes",          # 5-row class-stats broadcast cross (NB scoring)
    "q5v_logreg_gd",            # 1-row weight-state broadcast cross per GD step
    "q5w_knn_eval",             # quadratic exact arm (q91 contract), broadcast eval side
    "q6f_domain_mixture",       # 1-row stats broadcast cross
    "q19_skew_stats",           # 1-row corpus-stats broadcast cross
    "q18_bloom_semi_join",      # 1-row bloom-bitset broadcast attach
    "q8o_bm25",                 # 1-row corpus-stats (N, avgdl) broadcast cross
    "q5o_triangles",            # 1-row x 1-row (n_triangles, n_edges) combine
    "q8s_hll_intersect",        # K-row broadcast theta pair join of sketch rows
    "q8t_power_iteration",      # 1-row corpus-size and norm broadcast crosses
    "q8u_perplexity",           # 1-row vocab-size broadcast cross
    "q6n_dataset_card",         # 1-row stat-frame broadcast combines
    "q8f_pca_deflation",        # 1-row norm/size broadcast crosses per chain
    "q4w_ks_test",              # 1-row (n_a, n_b) broadcast cross over cum rows
    "q4x_mutual_information",   # 1-row n cross over 35 cells (q4m shape)
    "q4y_dft_spectrum",         # 1-row min-hour + 3-row period broadcast crosses
    "q1q_quantile_sketch",      # 5-row estimate + 1-row size envelope crosses
    "q3s_bh_fdr",               # 1-row corpus-moments broadcast cross over 35 groups
    "q9t_streaming_quantile_sketch",  # 3-row estimate envelope crosses (q1q shape)
    "q3u_rolling_hll",          # calendar-bounded day-grid sketch-merge theta join
    "q1v_share_of_parent",      # 1-row grand-total broadcast cross over 5 region rows
    "q4z_theil_sen",            # broadcast day-pair theta join (calendar-bounded)
    "q7x_psi_drift",            # 1-row time-bounds + margins broadcast crosses
    "q6p_gain_chart",           # 1-row n/total-responders broadcast crosses
    "q3l_weighted_median",      # 1-row total-weight broadcast cross
    "q2i_compaction",           # ≤4-row file-stats overlap self-join + 1-row crosses
    "q7y_batch_effect",         # 1-row global-median broadcast cross
    "q6t_semantic_dedup",       # exact quadratic pair arm (q91/q88 contract)
    "q1h_kcore_peel",           # 1-row core-edge-count broadcast cross
    "q1j_brand_modularity",     # 1-row edge-count broadcast cross
    "q3o_rolling_wau",          # 1-row calendar-bound broadcast cross
    "q3p_median_ci",            # 1-row n/rank-bounds broadcast crosses
    "q6u_synthetic_sample",     # 1-row n + K-row draw-table broadcast crosses
    "q1k_clustering_coeff",     # 1-row triangle-count broadcast cross
    "q7z_westgard_rules",       # 1-row control-limits broadcast cross
    "q6x_mixture_reweight",     # 1-row total + 1-row ESS broadcast crosses
    "q3r_funnel_conversion",    # three 1-row step-count broadcast crosses
    "q6j_domain_kl",            # 1-row corpus-total broadcast cross (ex-global-window)
    "q3f_rfm_segments",         # 1-row user-count cross for NTILE closed form
    "q2r_rendezvous_sharding",  # 1-row (n_total, n_moved) broadcast cross
    "q2s_bloom_file_skip",      # 1-row probe-value + 1-row probe-bits crosses
    "q9w_bitmap_distinct",      # 1-row all-types-total broadcast cross
    "qa0_tablesample",          # three 1-row contract-bit broadcast crosses
}
# Python-eval nodes allowed: q5i IS the scalar-UDF surface; q5g IS the
# UDTF surface (UDTF eval is row-generating Python by definition).
ALLOW_PY_UDF = {"q5i_python_udf", "q5g_udtf_ngrams"}
EXCHANGE_REPORT_THRESHOLD = 8

#: Shuffle-heavy plans traced and accepted (printed as "reviewed:"
#: with the reason instead of "<-- review"), mirroring
#: ALLOW_GLOBAL_WINDOW's mechanics. The counts are structural —
#: iterative rounds or dimension-bounded post-agg shuffles — not
#: accidental; a count that GROWS past its reviewed level still
#: deserves a fresh look, so the report prints the number either way.
SHUFFLE_HEAVY_REVIEWED: dict[str, str] = {
    "q8v_kmeans": "fixed Lloyd rounds x (dist/best/assign/centroid) "
                  "aggs; per-round state localCheckpointed",
    "q4x_mutual_information": "everything past the one events groupBy "
                              "acts on the <=35-row contingency table",
    "q4m_chi_square": "same topology as q4x: dimension-bounded after "
                      "the single events aggregation",
    "q1k_clustering_coeff": "degree-oriented triangle join (O(sqrt m) "
                            "wedge fanout) + per-node pair counts",
    "q5o_triangles": "degree orientation prep + wedge join + closing "
                     "join, each key-partitioned",
    "q5u_naive_bayes": "train/score split; model tables are vocab- and "
                       "class-bounded broadcasts",
    "q3u_rolling_hll": "per-window HLL partial merges, calendar-bounded",
    "q1i_ndcg": "two self-joins (train pairs, test truth) + ranked recs "
                "+ eval joins, all key-partitioned",
}

# Global (empty-partition-spec) Window nodes funnel ALL rows through
# one task — a 100 TB killer unless the window's input is provably
# bounded. Every entry below was traced to a dimension/granularity/
# sketch-bounded subtree (the bound and its reason, per query); any
# new global window must either pick a partition key, use
# operators/ordering.global_rank/global_cumsum (the distributed
# rewrites — q3f/q8r got them when this rule landed; q6j's corpus
# total became a 1-row broadcast cross), or be annotated here.
# Mirrors ALLOW_CARTESIAN's mechanics (round-6 verdict item 3).
ALLOW_GLOBAL_WINDOW: dict[str, str] = {
    "q8v_kmeans": "row_number over the k seed rows (post-limit(k))",
    "q8z_heaps_law": "cumulative over ≤10 corpus-decile rows",
    "q7z_westgard_rules": "lag over the calendar-bounded daily series",
    "q6p_gain_chart": "cumulative over 10 decile rows",
    "q6z_threshold_curve": "cumulative over ≤10 jaccard-bucket rows",
    "q4k_seasonal_decompose": "7-day window over calendar-bounded daily counts",
    "q4l_bootstrap_ci": "row_number over B bootstrap-replicate rows",
    "q4o_kaplan_meier": "cumulatives over distinct observation days (calendar)",
    "q3s_bh_fdr": "BH rank over the |event_types|x7 test grid",
    "q4t_interval_stabbing": "running sum over calendar-month boundaries",
    "q1n_pareto_frontier": "prefix-min over distinct price-cents (granularity)",
    "q89_ivf_topk": "row_number over the n_centroids seed rows (post-limit)",
}


def _split_top_level(group: str) -> list[str]:
    """Split a bracket-group body on TOP-LEVEL commas only (window
    expressions nest parens/brackets with their own commas)."""
    items: list[str] = []
    depth = 0
    start = 0
    for j, ch in enumerate(group):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(group[start:j])
            start = j + 1
    items.append(group[start:])
    return [it.strip() for it in items if it.strip()]


_ORDER_ITEM_RE = None


def _is_order_list(group: str) -> bool:
    """True iff every top-level item ends with a sort-direction
    marker, e.g. ``l_shipdate#5 ASC NULLS FIRST`` — the shape
    explain('formatted') prints for SortOrder, and one a partition
    expression can never end with."""
    import re

    global _ORDER_ITEM_RE
    if _ORDER_ITEM_RE is None:
        _ORDER_ITEM_RE = re.compile(r"\b(ASC|DESC)( NULLS (FIRST|LAST))?$")
    items = _split_top_level(group)
    return bool(items) and all(_ORDER_ITEM_RE.search(it) for it in items)


def _global_window_count(plan: str) -> int:
    """Count Window nodes whose Arguments line has no partition list.

    explain('formatted') renders a Window node's Arguments as
    top-level bracket groups: [functions], then optionally
    [partition-cols], then optionally [order-cols]. Both optional
    groups can be absent independently, so group COUNT alone cannot
    identify a global window — the discriminator is that an order
    list always prints sort direction (ASC/DESC) on every item while
    a partition list never does. Groups are found with a depth scan
    (expressions nest brackets, so a regex split would miscount)."""
    import re

    lines = plan.splitlines()
    n_global = 0
    for i, line in enumerate(lines):
        # exact node name: "(12) Window" — NOT WindowGroupLimit /
        # WindowInPandas, whose Arguments have different shapes
        if not re.match(r"^\(\d+\) Window(\s+\[codegen id.*)?$", line.strip()):
            continue
        for detail in lines[i + 1 : i + 6]:
            if not detail.startswith("Arguments: "):
                continue
            groups: list[str] = []
            depth = 0
            start = -1
            for j, ch in enumerate(detail):
                if ch == "[":
                    if depth == 0:
                        start = j
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append(detail[start + 1 : j])
            # groups[0] = window functions; a group is an ORDER list
            # iff every top-level comma item ENDS with a direction
            # marker ("x ASC NULLS FIRST") — anchoring at item end
            # (not substring presence, ADVICE r7) keeps a partition
            # expression that merely embeds the token (sort_array(...,
            # DESC), an alias containing " DESC") from masquerading
            # as an order list. A partition list is any non-order
            # later group.
            has_partition = any(not _is_order_list(g) for g in groups[1:])
            if not has_partition:
                n_global += 1
            break
    return n_global


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = tune_for_input(get_spark(app_name="plan-lint"), sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    busiest: list[tuple[int, str]] = []
    used_cartesian: set[str] = set()
    used_py: set[str] = set()
    used_gw: set[str] = set()
    explained: set[str] = set()
    for name, fn in QUERIES.items():
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # streaming plans can't explain pre-start
            print(f"[skip] {name}: {type(exc).__name__}")
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            if name not in ALLOW_CARTESIAN:
                failures.append((name, "unexpected cartesian/nested-loop join"))
            used_cartesian.add(name)
        if "BatchEvalPython" in plan:
            if name not in ALLOW_PY_UDF:
                failures.append((name, "row-at-a-time Python UDF in plan"))
            used_py.add(name)
        n_gw = _global_window_count(plan)
        if n_gw:
            if name not in ALLOW_GLOBAL_WINDOW:
                failures.append(
                    (name, f"{n_gw} global Window node(s) not in allowlist")
                )
            used_gw.add(name)
        # count REAL shuffles only: plain "Exchange" nodes, once each
        # (the numbered detail section lists every node exactly once).
        # A bare plan.count("Exchange") over-counts ~3x — formatted
        # explain lists each node in BOTH the tree and the detail
        # section, and the substring also matches BroadcastExchange
        # (not a shuffle; broadcasting small sides is the POINT) and
        # ReusedExchange (a reuse is a shuffle SAVED, not spent).
        # Measured on the two long-flagged plans: q1i's old "32" is
        # 17 shuffles + 5 broadcasts; q89's "30" is 10 + 7.
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
        busiest.append((n_ex, name))
        explained.add(name)
    busiest.sort(reverse=True)
    print("\nMost shuffle-heavy plans (shuffles are the scale currency):")
    for n_ex, name in busiest[:10]:
        if name in SHUFFLE_HEAVY_REVIEWED:
            mark = f"  reviewed: {SHUFFLE_HEAVY_REVIEWED[name]}"
        elif n_ex > EXCHANGE_REPORT_THRESHOLD:
            mark = "  <-- review"
        else:
            mark = ""
        print(f"  {n_ex:3d}  {name}{mark}")
    # Stale-allowlist report (informational): an allowance whose plan
    # no longer carries the pattern should be deleted, not carried —
    # a stale entry would silently excuse a future regression. Only
    # entries whose query WAS explained this run can be judged stale.
    for label, allow, used in (
        ("ALLOW_CARTESIAN", set(ALLOW_CARTESIAN), used_cartesian),
        ("ALLOW_PY_UDF", set(ALLOW_PY_UDF), used_py),
        ("ALLOW_GLOBAL_WINDOW", set(ALLOW_GLOBAL_WINDOW), used_gw),
    ):
        stale = sorted((allow & explained) - used)
        if stale:
            print(f"\nSTALE {label} entries (pattern no longer in plan):")
            for n in stale:
                print(f"  {n}")
    if failures:
        print("\nFAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print(f"\nplan lint OK over {len(busiest)} explainable plans")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
