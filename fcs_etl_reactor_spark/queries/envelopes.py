"""Oracle-checkable envelopes for array-valued and approximate
aggregates (SURVEY.md §2.4 A5/A7/A10).

Two driver constraints shape every query here (round-1 verdict):

1. The driver's canonicalizer pandas-sorts each output column, so a
   top-level ARRAY/STRUCT/MAP cell crashes it ("unhashable type") —
   array results are therefore serialized to delimited STRINGs on both
   the Spark and the DuckDB side, with the array logic (collect_list/
   array_sort/...) still exercised inside the query.

2. A registered query without an oracle is recorded as err
   "no_oracle", so the approximate operators (HLL count-distinct,
   KLL percentiles, count-min frequent items) are recast as
   *envelope* checks: the query computes BOTH the approximation and
   the exact value and emits the exact value plus a tolerance boolean.
   The sketch still runs — the oracle verifies the exact columns
   value-for-value and the boolean proves the approximation landed
   inside its published error bound (deterministically: HLL registers
   are max-merged so the estimate is partition-order independent, and
   the tolerance dwarfs the sketch's drift for the others).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q26 — collect aggregates (A10): per-group sorted lists/sets,
# serialized with '|' so the output is a flat string column.
# --------------------------------------------------------------------------


@query(
    "q26_collect",
    oracle="""
    SELECT
      n_regionkey,
      STRING_AGG(n_name, '|' ORDER BY n_name) AS nations,
      STRING_AGG(DISTINCT n_nationkey, '|' ORDER BY n_nationkey) AS nation_keys
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q26_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_set("n_nationkey")),
                lambda x: x.cast("string"),
            ),
        ).alias("nation_keys"),
    )


# --------------------------------------------------------------------------
# q30 — approx distinct (A7): HLL cardinality (rsd=0.01) checked
# against the exact COUNT(DISTINCT) it approximates. The exact columns
# ARE the oracle payload; the booleans assert the sketch landed within
# 5× its configured relative error (HLL merge = per-register max →
# the estimate is deterministic for a given dataset).
# --------------------------------------------------------------------------


@query(
    "q30_approx_distinct",
    oracle="""
    SELECT
      event_type,
      COUNT(DISTINCT user_id) AS n_users,
      COUNT(DISTINCT event_id) AS n_events,
      TRUE AS approx_users_ok,
      TRUE AS approx_events_ok
    FROM events
    GROUP BY event_type
    """,
)
def q30_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def within(approx, exact):
        return F.abs(approx.cast("double") - exact.cast("double")) <= F.lit(
            0.05
        ) * exact.cast("double")

    # Two aggregations joined on the (low-cardinality) group key, NOT
    # one combined agg: two COUNT(DISTINCT x) on different columns make
    # Catalyst rewrite through Expand, and every non-distinct aggregate
    # rides along grouped by (event_type, gid, distinct-value) — so the
    # rsd=0.01 HLL buffers (~13 KB of registers EACH) get allocated and
    # shuffled once per DISTINCT VALUE instead of once per group.
    # Measured at sf0.1: combined 80.5 s vs 3.8 s (exact) + 8.3 s (HLL)
    # split; results are identical (HLL merge is per-register max —
    # deterministic for a dataset regardless of plan). The join is two
    # ≤|event_type|-row aggregates — broadcast, no extra scan cost at
    # any scale vs the Expand plan, which already read the input twice
    # through the expand replicas.
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_id").alias("n_events"),
    )
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_au"),
        F.approx_count_distinct("event_id", 0.01).alias("_ae"),
    )
    agg = exact.join(approx, "event_type")
    return agg.select(
        "event_type",
        "n_users",
        "n_events",
        within(F.col("_au"), F.col("n_users")).alias("approx_users_ok"),
        within(F.col("_ae"), F.col("n_events")).alias("approx_events_ok"),
    )


# --------------------------------------------------------------------------
# q36 — approximate percentiles (A5 scale path): percentile_approx
# (accuracy 10000) checked against the exact interpolated percentile.
# Exact values are oracle-verified (same arithmetic as QUANTILE_CONT);
# the booleans bound the sketch error far above its worst case
# (rank error ≤ n/10000 → a handful of neighboring order statistics).
# --------------------------------------------------------------------------


@query(
    "q36_approx_percentiles",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25_price,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS p75_price,
      TRUE AS approx_median_ok,
      TRUE AS approx_quartiles_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q36_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75_price"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("_amed"),
        F.percentile_approx("l_extendedprice", [0.25, 0.75], 10000).alias("_aq"),
    )
    return agg.select(
        "l_returnflag",
        "median_qty",
        "p25_price",
        "p75_price",
        (F.abs(F.col("_amed") - F.col("median_qty")) <= F.lit(1.0)).alias(
            "approx_median_ok"
        ),
        (
            # relative tolerance: the sketch returns a real data point
            # while the exact percentile interpolates, so the gap can
            # reach one inter-order-statistic spacing — 2% of the value
            # dominates that at every fixture scale
            (F.abs(F.element_at("_aq", 1) - F.col("p25_price"))
             <= F.lit(0.02) * F.col("p25_price"))
            & (F.abs(F.element_at("_aq", 2) - F.col("p75_price"))
               <= F.lit(0.02) * F.col("p75_price"))
        ).alias("approx_quartiles_ok"),
    )


# --------------------------------------------------------------------------
# q8 — heavy hitters (A7's counting cousin): count-min-backed
# freqItems, envelope-checked via its published guarantee — every item
# with frequency ≥ support IS returned (false positives possible,
# false negatives not). The query finds the exactly-frequent
# event_types and asserts each appears in the sketch output; the
# oracle recomputes the exactly-frequent set in SQL.
# --------------------------------------------------------------------------

_FREQ_SUPPORT = 0.05


@query(
    "q8_freq_items",
    oracle=f"""
    SELECT
      event_type AS item,
      COUNT(*) AS n,
      TRUE AS found
    FROM events
    GROUP BY event_type
    HAVING COUNT(*) >= {_FREQ_SUPPORT} * (SELECT COUNT(*) FROM events)
    """,
)
def q8_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sketch = e.stat.freqItems(["event_type"], support=_FREQ_SUPPORT).select(
        F.col("event_type_freqItems").alias("_items")
    )
    total = e.groupBy().agg(F.count(F.lit(1)).alias("_total"))
    exact = (
        e.groupBy(F.col("event_type").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .filter(F.col("n") >= F.lit(_FREQ_SUPPORT) * F.col("_total"))
    )
    return (
        exact.join(F.broadcast(sketch))
        .select("item", "n", F.array_contains("_items", F.col("item")).alias("found"))
    )


# --------------------------------------------------------------------------
# q8h — count-min sketch (A7 family completion): per-user event counts
# estimated from a 4×1024-counter sketch vs their exact counts. The
# envelope states CMS's one-sided guarantee: estimates NEVER
# undercount, and here every estimate also lands within the ε·N
# overcount bound (ε = e/width; checked exhaustively at this scale —
# deterministic, seeded hashes). Sketch memory is 32 KB regardless of
# key cardinality, and two sketches ADD exactly — the distributed
# mergeability HLL lacks.
# --------------------------------------------------------------------------


@query(
    "q8h_countmin",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_exact,
           TRUE AS never_undercounts,
           TRUE AS within_eps
    FROM events GROUP BY user_id
    """,
)
def q8h_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from fcs_etl_reactor_spark.operators.countmin import cms_build, cms_estimate

    e = load(spark, sf_dir, "events")
    depth, width = 4, 1024
    sketch = cms_build(e, "user_id", depth, width)
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id", depth, width)
    n_total = e.agg(F.count(F.lit(1)).alias("n")).select("n")
    eps = math.e / width
    return (
        exact.join(est, "user_id")
        .crossJoin(F.broadcast(n_total))
        .select(
            "user_id",
            "n_exact",
            (F.col("cms_count") >= F.col("n_exact")).alias("never_undercounts"),
            (
                F.col("cms_count")
                <= F.col("n_exact") + F.ceil(F.lit(eps) * F.col("n"))
            ).alias("within_eps"),
        )
    )


# --------------------------------------------------------------------------
# q8l — HLL sketch build/merge (A7 scale path, Apache DataSketches via
# Spark 4's hll_* functions). The property that matters at 100 TB is
# MERGEABILITY: per-partition/per-group sketches union losslessly to
# the global sketch, so distinct counting is one pass + an O(sketch)
# combine — never a re-scan. The envelope emits the exact distincts
# (oracle-recomputed) plus two booleans: each group's sketch estimate
# within 5% of its exact count (default lgK=12 → ~0.8% rel. error),
# and the estimate of the UNION of the per-group sketches within 5%
# of the exact global distinct — the merge-consistency proof.
# --------------------------------------------------------------------------


@query(
    "q8l_hll_union",
    oracle="""
    WITH per AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type
    ), tot AS (
      SELECT COUNT(DISTINCT user_id) AS n_total FROM events
    )
    SELECT per.event_type, per.n_users, tot.n_total,
           TRUE AS sketch_ok, TRUE AS union_ok
    FROM per CROSS JOIN tot
    """,
)
def q8l_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def within(approx, exact):
        return F.abs(approx.cast("double") - exact.cast("double")) <= F.lit(
            0.05
        ) * exact.cast("double")

    per = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.hll_sketch_agg("user_id").alias("_sk"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("_est"),
    )
    glob = (
        per.agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est_u"))
        .crossJoin(e.agg(F.countDistinct("user_id").alias("n_total")))
    )  # 1 row × 1 row
    return per.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "n_users",
        "n_total",
        within(F.col("_est"), F.col("n_users")).alias("sketch_ok"),
        within(F.col("_est_u"), F.col("n_total")).alias("union_ok"),
    )


# --------------------------------------------------------------------------
# q8n — approx_top_k heavy hitters (Spark 4.1, DataSketches
# frequent-items): the sketch-based top-k whose error is bounded by
# the stream's residual mass. Envelope: exact term counts
# (oracle-recomputed) for the top-10 terms by (count DESC, term), plus
# a boolean asserting the sketch surfaced every one of them with its
# exact count (maxItemsTracked=10000 far exceeds the distinct terms
# here, so the sketch is provably exact at this scale; at 100 TB the
# same plan degrades gracefully to ±n/maxItemsTracked error).
# --------------------------------------------------------------------------


@query(
    "q8n_approx_top_k",
    oracle="""
    WITH t AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ), c AS (
      SELECT term, COUNT(*) AS n FROM t WHERE term <> '' GROUP BY term
    )
    SELECT term, n, TRUE AS sketch_found_exact
    FROM c ORDER BY n DESC, term LIMIT 10
    """,
)
def q8n_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(10)
    )
    sketch = toks.agg(
        F.explode(F.expr("approx_top_k(term, 10000, 10000)")).alias("e")
    ).select(F.col("e.item").alias("term"), F.col("e.count").alias("sk_n"))
    return exact.join(F.broadcast(sketch), "term", "left").select(
        "term",
        "n",
        (F.col("sk_n") == F.col("n")).alias("sketch_found_exact"),
    )


# --------------------------------------------------------------------------
# q8s — HLL set-intersection estimate via inclusion–exclusion:
# |A∩B| ≈ est(A) + est(B) − est(A∪B), the standard audience-overlap /
# cross-corpus-cardinality trick (HLL sketches union losslessly but
# have no native intersect). Envelope: exact intersections
# (oracle-recomputed via COUNT(DISTINCT) on the join) plus a boolean
# that the sketch estimate lands within the inclusion–exclusion error
# envelope — 10% of the UNION size, the honest bound: IE error scales
# with |A∪B|, not |A∩B|, which is exactly why tiny intersections of
# big sets need minhash/theta sketches instead (q56's territory).
# --------------------------------------------------------------------------


@query(
    "q8s_hll_intersect",
    oracle="""
    WITH pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ),
    inter AS (
      SELECT p.t1, p.t2,
             (SELECT COUNT(DISTINCT e1.user_id) FROM events e1
              WHERE e1.event_type = p.t1
                AND e1.user_id IN (SELECT e2.user_id FROM events e2
                                   WHERE e2.event_type = p.t2)) AS n_common,
             (SELECT COUNT(DISTINCT e3.user_id) FROM events e3
              WHERE e3.event_type IN (p.t1, p.t2)) AS n_union
      FROM pairs p
    )
    SELECT t1, t2, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_union AS BIGINT) AS n_union, TRUE AS estimate_ok
    FROM inter
    """,
)
def q8s_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    a = per.select(
        F.col("event_type").alias("t1"),
        F.col("sk").alias("sk1"),
        F.col("n_exact").alias("n1"),
    )
    b = per.select(
        F.col("event_type").alias("t2"),
        F.col("sk").alias("sk2"),
        F.col("n_exact").alias("n2"),
    )
    # K event types ⇒ K(K−1)/2 pair rows — a dimension-sized theta
    # join on broadcastable sketch rows, never a fact-table cross.
    pairs = a.join(F.broadcast(b), F.col("t1") < F.col("t2"))
    est1 = F.hll_sketch_estimate("sk1")
    est2 = F.hll_sketch_estimate("sk2")
    est_u = F.hll_sketch_estimate(F.hll_union("sk1", "sk2"))
    est_i = est1 + est2 - est_u
    # exact intersection/union for the envelope, computed once per pair
    ex = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.user_id") == F.col("y.user_id"))
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("t1"), F.col("y.event_type").alias("t2")
        )
        .agg(F.countDistinct("x.user_id").alias("n_common"))
    )
    joined = pairs.join(ex, ["t1", "t2"], "left").select(
        "t1",
        "t2",
        F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias("n_common"),
        (F.col("n1") + F.col("n2")).cast("double").alias("_n12"),
        est_i.alias("_est_i"),
        est_u.alias("_est_u"),
    )
    n_union = (
        F.col("_n12")
        - F.col("n_common")
    )  # exact |A∪B| = |A|+|B|−|A∩B|
    return joined.select(
        "t1",
        "t2",
        "n_common",
        n_union.cast("bigint").alias("n_union"),
        (
            F.abs(F.col("_est_i") - F.col("n_common"))
            <= F.lit(0.10) * n_union
        ).alias("estimate_ok"),
    )


# --------------------------------------------------------------------------
# q8x — join-size estimation via the CMS inner product (the AMS
# second-moment estimator): |lineitem ⋈ lineitem on l_partkey| =
# Σ_p c(p)², estimated as min over sketch rows of Σ_b counter[r,b]² —
# the classic sketch answer to "how big will this join be?" that a
# cost-based planner asks BEFORE running the join. Colliding keys
# only ADD cross terms, so the estimate never undercounts; the
# overcount is ≤ (e/width)·N² with the sketch guarantee. 32 KB of
# counters regardless of key cardinality; the estimate is a
# dimension-bounded fold of the broadcast sketch.
# Envelope oracle: exact size recomputed in SQL + the two guarantee
# booleans (Spark computes them from the real sketch).
# --------------------------------------------------------------------------


@query(
    "q8x_join_size_estimate",
    oracle="""
    WITH c AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
    SELECT CAST(SUM(n * n) AS BIGINT) AS exact_size,
           TRUE AS never_undercounts,
           TRUE AS within_eps
    FROM c
    """,
)
def q8x_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from fcs_etl_reactor_spark.operators.countmin import cms_build

    l = load(spark, sf_dir, "lineitem")
    depth, width = 4, 1024
    sketch = cms_build(l, "l_partkey", depth, width)
    est = (
        sketch.groupBy("r")
        .agg(F.sum(F.col("counter") * F.col("counter")).alias("row_est"))
        .agg(F.min("row_est").alias("est"))
    )
    exact = (
        l.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).cast("bigint").alias("exact_size"))
    )
    n_total = l.agg(F.count(F.lit(1)).alias("nt"))
    eps = math.e / width
    return (
        exact.join(F.broadcast(est))
        .join(F.broadcast(n_total))
        .select(
            "exact_size",
            (F.col("est") >= F.col("exact_size")).alias("never_undercounts"),
            (
                F.col("est")
                <= F.col("exact_size")
                + F.ceil(F.lit(eps) * F.col("nt") * F.col("nt"))
            ).alias("within_eps"),
        )
    )


# --------------------------------------------------------------------------
# q8y — Misra–Gries heavy hitters over the document term stream
# (operators/misra_gries.py): the deterministic counter sketch beside
# count-min (q8h) and HLL (q8l) — k counters per partition, key-wise
# merge, and the classic guarantee: every term with frequency > N/k
# IS in the summary, and estimates undercount by at most N/k. Both
# booleans are theory-guaranteed deterministic (any partitioning),
# and the comparisons run on exact integers (freq·k > N, not
# fractions). The oracle recomputes the exact heavy-hitter set.
# --------------------------------------------------------------------------

_MG_K = 64


@query(
    "q8y_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents),
    n AS (SELECT COUNT(*) AS n FROM t),
    c AS (SELECT w, COUNT(*) AS freq FROM t GROUP BY w)
    SELECT w AS term, freq, TRUE AS in_summary, TRUE AS within_bound
    FROM c, n WHERE freq * {_MG_K} > n
    """,
)
def q8y_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.misra_gries import mg_merged

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w"))
    merged = mg_merged(toks, "w", _MG_K)
    exact = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    n = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        exact.join(F.broadcast(n))
        .filter(F.col("freq") * _MG_K > F.col("n"))
        .join(merged, "w", "left")
        .select(
            F.col("w").alias("term"),
            "freq",
            F.col("mg_est").isNotNull().alias("in_summary"),
            (
                F.col("mg_est").isNotNull()
                & (F.col("mg_est") <= F.col("freq"))
                & ((F.col("freq") - F.col("mg_est")) * _MG_K <= F.col("n"))
            ).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
# q1q — mergeable quantile sketch (operators/quantile_sketch.py): the
# rank member of the sketch family (q8h count-min = counts, q8l HLL =
# distincts, q8n Misra-Gries = heavy hitters). Bounded-memory
# per-partition compactor summaries, two-stage tree merge, quantile
# probe by cumulative weight — percentiles without a global sort.
# Envelope: the exact interpolated percentiles (oracle-recomputable)
# plus booleans asserting the sketch's observed rank error ≤ 2%·N
# (deterministic compaction phase → reproducible runs; the 2% bound
# holds with wide margin at every fixture partitioning — observed
# ~0.1%) and that the merged summary stayed within its size cap. The
# exact-rank audit is one scan with a 5-row broadcast combine.
# --------------------------------------------------------------------------

_QS_SKETCH = [0.1, 0.25, 0.5, 0.75, 0.9]


@query(
    "q1q_quantile_sketch",
    oracle="""
    WITH e AS (SELECT l_extendedprice AS x FROM lineitem)
    SELECT q, ROUND(ex, 6) AS exact_pctl,
           TRUE AS rank_err_ok, TRUE AS size_ok
    FROM (
      SELECT CAST(0.1 AS DOUBLE) AS q, QUANTILE_CONT(x, 0.1) AS ex FROM e
      UNION ALL SELECT 0.25, QUANTILE_CONT(x, 0.25) FROM e
      UNION ALL SELECT 0.5, QUANTILE_CONT(x, 0.5) FROM e
      UNION ALL SELECT 0.75, QUANTILE_CONT(x, 0.75) FROM e
      UNION ALL SELECT 0.9, QUANTILE_CONT(x, 0.9) FROM e
    )
    """,
)
def q1q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.quantile_sketch import (
        SUMMARY_CAP_DEFAULT,
        sketch_build,
        sketch_merge,
        sketch_quantiles,
    )

    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    merged = sketch_merge(sketch_build(l, "x"))
    est = sketch_quantiles(merged, _QS_SKETCH)

    exact = l.agg(
        F.percentile("x", F.array(*[F.lit(q) for q in _QS_SKETCH])).alias("ex"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).select(
        F.posexplode("ex").alias("pos", "exact_raw"), "n"
    ).select(
        F.element_at(
            F.array(*[F.lit(q) for q in _QS_SKETCH]), F.col("pos") + 1
        ).alias("q"),
        "exact_raw",
        "n",
    )

    # observed rank of each estimate: one scan, 5-row broadcast
    # combine. With ties the estimate's rank is the INTERVAL
    # [count(x<est), count(x<=est)]; the guarantee is that the
    # interval comes within eps*N of q*N.
    ranks = (
        l.crossJoin(F.broadcast(est))
        .groupBy("q", "est")
        .agg(
            F.sum(F.when(F.col("x") < F.col("est"), 1).otherwise(0)).alias("rk_lo"),
            F.sum(F.when(F.col("x") <= F.col("est"), 1).otherwise(0)).alias("rk_hi"),
        )
    )
    sz = merged.agg(F.count(F.lit(1)).alias("sketch_rows"))
    return (
        exact.join(F.broadcast(ranks), "q")
        .crossJoin(F.broadcast(sz))
        .select(
            "q",
            F.round("exact_raw", 6).alias("exact_pctl"),
            (
                (F.col("rk_lo") - F.lit(0.02) * F.col("n")
                 <= F.col("q") * F.col("n"))
                & (F.col("q") * F.col("n")
                   <= F.col("rk_hi") + F.lit(0.02) * F.col("n"))
            ).alias("rank_err_ok"),
            (F.col("sketch_rows") <= F.lit(SUMMARY_CAP_DEFAULT // 2)).alias(
                "size_ok"
            ),
        )
    )


# --------------------------------------------------------------------------
# q3w — HLL sketch ROLLUP across a hierarchy (nation -> region). q8l
# proves flat mergeability; this proves the property that makes
# sketches the 100 TB answer for hierarchical distinct counts: build
# the per-LEAF sketches ONCE, then answer every ancestor level by
# merging sketches — never rescanning the fact table. The leaf sets
# OVERLAP (the same part is supplied from many nations), so the region
# count is NOT the sum of nation counts and the union is doing real
# work. Envelope: exact distincts at both levels (oracle-recomputed)
# plus booleans that each nation sketch and each region merge land
# within 5% of exact (lgK=12 → ~0.8% expected rel. error).
# --------------------------------------------------------------------------


@query(
    "q3w_hll_rollup",
    oracle="""
    WITH fact AS (
      SELECT n.n_name AS nation, r.r_name AS region, l.l_partkey AS pk
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), per_nation AS (
      SELECT nation, region, COUNT(DISTINCT pk) AS n_parts_nation
      FROM fact GROUP BY nation, region
    ), per_region AS (
      SELECT region, COUNT(DISTINCT pk) AS n_parts_region
      FROM fact GROUP BY region
    )
    SELECT per_nation.nation, per_nation.region,
           per_nation.n_parts_nation, per_region.n_parts_region,
           TRUE AS nation_ok, TRUE AS region_ok
    FROM per_nation JOIN per_region USING (region)
    """,
)
def q3w_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    fact = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == reg["r_regionkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.col("l_partkey").alias("pk"),
        )
    )
    # ONE pass builds the leaf sketches; the region level is pure
    # sketch merge (hll_union_agg over ≤|nations| rows) — the exact
    # arms exist only to verify the envelope.
    per_nation = fact.groupBy("nation", "region").agg(
        F.count_distinct("pk").alias("n_parts_nation"),
        F.hll_sketch_agg("pk").alias("_sk"),
    )
    per_region = per_nation.groupBy("region").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est_region")
    ).join(
        fact.groupBy("region").agg(
            F.count_distinct("pk").alias("n_parts_region")
        ),
        "region",
    )

    def within(approx, exact):
        return F.abs(approx.cast("double") - exact.cast("double")) <= F.lit(
            0.05
        ) * exact.cast("double")

    return (
        per_nation.withColumn(
            "_est_nation", F.hll_sketch_estimate(F.col("_sk"))
        )
        .join(F.broadcast(per_region), "region")
        .select(
            "nation",
            "region",
            "n_parts_nation",
            "n_parts_region",
            within(F.col("_est_nation"), F.col("n_parts_nation")).alias(
                "nation_ok"
            ),
            within(F.col("_est_region"), F.col("n_parts_region")).alias(
                "region_ok"
            ),
        )
    )
