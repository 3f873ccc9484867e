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

from fcs_etl_reactor_spark.functions.exact import o_fsum
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
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUFFLE_SEED)))
    # DISTRIBUTED total order (operators/ordering.global_rank): range
    # partition + per-partition offsets, never a single-reducer global
    # window — so the driver's hash check verifies the scale-path
    # implementation itself against the window-based SQL oracle.
    ranked = global_rank(
        d.select("doc_id", h.alias("_h")), ["_h", "doc_id"], rank_col="train_order"
    )
    return ranked.select("doc_id", "train_order")


# --------------------------------------------------------------------------
# q6c — context-window packing: greedy sequential fill of 4096-token
# windows in a deterministic document order. chunk = floor(cumulative
# tokens BEFORE this doc / capacity) — the streaming-friendly
# approximation of first-fit packing (a doc may straddle a boundary;
# exact bin packing is NP-hard and needs no more fidelity here).
# Expressed as a running-sum window — one shuffle, no Python.
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# q6e — the END-TO-END corpus-cleaning plan (plans/corpus_pipeline.py):
# quality gate → near-dup dedup (LSH → Jaccard → connected components →
# keep canonical) → md5 split, composed lazily so Catalyst optimizes
# across stage boundaries. The oracle replays every stage in SQL —
# quality rule, shingle-Jaccard pair set over the SAME filtered
# corpus, recursive-CTE clustering, md5 bucketing.
# --------------------------------------------------------------------------


@query(
    "q6e_clean_corpus",
    oracle="""
    WITH RECURSIVE q AS (
      SELECT doc_id, lang, text,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens
      FROM documents
      WHERE LEN(STRING_SPLIT(text, ' ')) BETWEEN 20 AND 1000
        AND CAST(n_chars AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')) BETWEEN 3 AND 12
    ), toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM q
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM (SELECT doc_id, w, UNNEST(RANGE(1, GREATEST(LEN(w) - 2, 0) + 1)) AS i
            FROM toks)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), neardup AS (
      SELECT doc_a, doc_b FROM pairs
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM neardup
      UNION SELECT doc_b, doc_a FROM neardup
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), losers AS (
      SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT q.doc_id, q.lang, CAST(q.n_tokens AS BIGINT) AS n_tokens,
           CASE WHEN CAST(('0x' || SUBSTR(MD5(CAST(q.doc_id AS VARCHAR) || 'split-v1'), 1, 8))
                     AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(('0x' || SUBSTR(MD5(CAST(q.doc_id AS VARCHAR) || 'split-v1'), 1, 8))
                     AS BIGINT) % 100 < 90 THEN 'val' ELSE 'test' END AS split
    FROM q
    LEFT JOIN losers USING (doc_id)
    WHERE losers.doc_id IS NULL
    """,
)
def q6e_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.plans.corpus_pipeline import clean_corpus

    return clean_corpus(spark, sf_dir)


# --------------------------------------------------------------------------
# q6d — decontamination: flag training docs sharing any word 8-gram
# with a benchmark/eval set (here: doc_id % 10 == 0 stands in for the
# held-out benchmark). The canonical eval-leakage check: benchmark
# shingles are a broadcast-sized set (benchmarks are small by nature),
# so the probe is a broadcast semi-join over the corpus — one scan, no
# shuffle of the training side at any scale.
# --------------------------------------------------------------------------

_DECONTAM_N = 8


@query(
    "q6d_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             ARRAY_TO_STRING(w[i:i+{_DECONTAM_N - 1}], ' ') AS shingle
      FROM (SELECT doc_id, w,
                   UNNEST(RANGE(1, GREATEST(LEN(w) - {_DECONTAM_N - 1}, 0) + 1)) AS i
            FROM toks)
    ), bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0
    )
    SELECT s.doc_id, COUNT(*) AS n_leaked_ngrams
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % 10 != 0
    GROUP BY s.doc_id
    """,
)
def q6d_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.dedup import shingles

    d = load(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", n=_DECONTAM_N)
    bench = (
        sh.filter(F.col("doc_id") % 10 == 0).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_leaked_ngrams"))
    )


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
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM c
    GROUP BY 1
    """,
)
def q6c_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_cumsum

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    # DISTRIBUTED prefix sum (operators/ordering.global_cumsum): a
    # `SUM() OVER (ORDER BY doc_id)` with no PARTITION BY moves the
    # whole corpus through one reducer — the driver's hash check here
    # verifies the two-pass scale path against the window-SQL oracle.
    c = global_cumsum(
        t, ["doc_id"], "n_tokens", out_col="tokens_before", exclusive=True
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


# --------------------------------------------------------------------------
# q6f — temperature-scaled domain mixing: re-weight an imbalanced
# corpus so head domains shrink and tail domains keep coverage.
# Target share q_i ∝ p_i^τ with τ = 0.5 — computed as SQRT, which is
# correctly-rounded IEEE in every engine (POWER(x, 0.5) is not
# guaranteed bit-identical across libm implementations, and the
# oracle hash-compares). Per-domain keep rate r_i = min(1,
# q_i·S/n_i) for a target sample of S = N/2 rows; the per-row keep
# decision is the same md5 fraction as q6a — deterministic,
# shard-stable, no RNG state.
#
# Scale shape: domain stats are a tiny aggregate (|domains| rows) —
# broadcast back onto the corpus; the keep decision is a per-row
# expression. One corpus scan for stats, one for selection, no
# corpus-sized shuffle. A rate boundary hit would need the md5
# fraction to land within ~1 ulp of r_i (p ≈ 2^-32 per domain), so
# the float-sum order across |domains| terms cannot flip the hash.
# --------------------------------------------------------------------------

_MIX_SALT = "mix-v1"
_MIX_TARGET_FRAC = 0.5  # S = N * this


@query(
    "q6f_domain_mixture",
    oracle=f"""
    WITH stats AS (
      SELECT lang, COUNT(*) AS n_i FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n_i) AS n, SUM(SQRT(CAST(n_i AS DOUBLE))) AS z FROM stats
    ), rates AS (
      SELECT s.lang, s.n_i,
             LEAST(1.0,
               (SQRT(CAST(s.n_i AS DOUBLE)) / t.z)
               * (CAST(t.n AS DOUBLE) * {_MIX_TARGET_FRAC}) / s.n_i) AS r
      FROM stats s CROSS JOIN tot t
    )
    SELECT d.lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (
             WHERE CAST(('0x' || SUBSTR(MD5(CAST(d.doc_id AS VARCHAR) || '{_MIX_SALT}'), 1, 8))
                        AS BIGINT) / 4294967296.0 < r.r
           ) AS n_sampled
    FROM documents d JOIN rates r USING (lang)
    GROUP BY d.lang
    """,
)
def q6f_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_i"))
    tot = stats.agg(
        F.sum("n_i").alias("n"),
        F.sum(F.sqrt(F.col("n_i").cast("double"))).alias("z"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            (F.sqrt(F.col("n_i").cast("double")) / F.col("z"))
            * (F.col("n").cast("double") * F.lit(_MIX_TARGET_FRAC))
            / F.col("n_i"),
        ).alias("r"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SALT))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(frac < F.col("r"), 1)).alias("n_sampled"),
        )
    )


# --------------------------------------------------------------------------
# q6g — exact stratified sampling: a FIXED k rows per stratum (not a
# Bernoulli rate), selection = lowest-k md5(id||salt) within the
# stratum. Hash-rank sampling is the 100 TB version of "ORDER BY
# random() LIMIT k per group": deterministic, re-runnable, and
# incremental (a new shard can only displace rows whose hash is
# higher). One shuffle on the stratum key; per-stratum heaps would
# replace the sort if strata were pathologically hot (same escape as
# q44_topk_per_group).
# --------------------------------------------------------------------------

_STRAT_SALT = "strat-v1"
_STRAT_K = 10


@query(
    "q6g_stratified_sample",
    oracle=f"""
    SELECT source, doc_id, CAST(smp_rank AS INTEGER) AS smp_rank FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5(CAST(doc_id AS VARCHAR) || '{_STRAT_SALT}'), doc_id
             ) AS smp_rank
      FROM documents
    ) WHERE smp_rank <= {_STRAT_K}
    """,
)
def q6g_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_STRAT_SALT)))
    w = Window.partitionBy("source").orderBy(F.col("_h"), F.col("doc_id"))
    return (
        d.select("source", "doc_id", h.alias("_h"))
        .withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= _STRAT_K)
        .select("source", "doc_id", "smp_rank")
    )



# --------------------------------------------------------------------------
# q6j — domain-shift diagnostic: per-source KL divergence of the token
# distribution against the whole-corpus distribution. The mixing
# counterpart to q6f: before re-weighting domains you measure how far
# each domain's unigram distribution sits from the corpus mixture
# (data-selection / importance-resampling pipelines score domains
# exactly this way).
#
# Scale shape: one explode → (source, term) count (partial-agg
# collapses repeats map-side), corpus term totals derived from the
# SAME aggregate by a whole-partition window on term (corpus exploded
# once — the q81 pattern), totals as a 1-row broadcast. The KL sum
# uses scaled-long accumulation (functions/exact.py) so the per-source
# sum is order-independent; terms absent from a source contribute 0
# (the 0·log0 limit), so the inner join over observed (source, term)
# pairs is exact, not an approximation.
# --------------------------------------------------------------------------


@query(
    "q6j_domain_kl",
    oracle=f"""
    WITH st AS (
      SELECT source, term, COUNT(*) AS c_st FROM (
        SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
      ) WHERE term <> '' GROUP BY source, term
    ),
    wide AS (
      SELECT source, term, c_st,
             SUM(c_st) OVER (PARTITION BY source) AS c_s,
             SUM(c_st) OVER (PARTITION BY term) AS c_t,
             SUM(c_st) OVER () AS c
      FROM st
    ),
    contrib AS (
      SELECT source, c_s,
             (CAST(c_st AS DOUBLE) / c_s)
             * LN((CAST(c_st AS DOUBLE) / c_s) / (CAST(c_t AS DOUBLE) / c))
               AS kterm
      FROM wide
    )
    SELECT source,
           {o_fsum("kterm", "kl_nats", "1000000000.0")},
           CAST(MIN(c_s) AS BIGINT) AS n_tokens
    FROM contrib GROUP BY source
    """,
)
def q6j_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import fsum

    d = load(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    c_s = F.sum("c_st").over(Window.partitionBy("source"))
    c_t = F.sum("c_st").over(Window.partitionBy("term"))
    # corpus total as a 1-row broadcast cross, NOT a global window —
    # an empty-partition window over the (source, term) table would
    # funnel the whole vocabulary through one task
    tot = st.agg(F.sum("c_st").alias("c"))
    p = F.col("c_st").cast("double") / F.col("c_s")
    q = F.col("c_t").cast("double") / F.col("c")
    contrib = (
        st.select(
            "source",
            F.col("c_st"),
            c_s.alias("c_s"),
            c_t.alias("c_t"),
        )
        .crossJoin(F.broadcast(tot))
        .select("source", "c_s", (p * F.log(p / q)).alias("kterm"))
    )
    return contrib.groupBy("source").agg(
        fsum(F.col("kterm"), "kl_nats", scale=1e9),
        F.min("c_s").cast("bigint").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# q6k — weighted reservoir sampling (A-Res, Efraimidis–Spirakis):
# exactly k docs per source, selection probability proportional to a
# weight (n_chars here — in production a quality score). Per-row key
# u^(1/w) with u a deterministic md5-uniform; the k largest keys per
# stratum win. This is the weighted counterpart of q6g's unweighted
# lowest-k-hash sampling, and like it runs as one window rank per
# stratum (WindowGroupLimit pushes the k-filter below the sort at
# scale).
#
# Determinism: ordering by a raw double key risks last-ulp rank flips
# between engines (LN differs in the last ulp across libm builds), so
# the rank orders by the key ROUNDED to 12 dp with doc_id as the
# tie-break — identical rounding both sides, ties impossible to
# mis-order.
# --------------------------------------------------------------------------

_WRS_SALT = "wrs-v1"
_WRS_K = 10


@query(
    "q6k_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ROUND(
               LN((CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '{_WRS_SALT}'), 1, 8))
                        AS BIGINT) + 0.5) / 4294967296.0)
               / n_chars, 12) AS k
      FROM documents
      WHERE n_chars > 0
    ),
    ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY k DESC, doc_id)
               AS smp_rank
      FROM keyed
    )
    SELECT source, doc_id, n_chars, CAST(smp_rank AS INTEGER) AS smp_rank
    FROM ranked WHERE smp_rank <= {_WRS_K}
    """,
)
def q6k_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_WRS_SALT))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    # ln(u)/w is monotone in u^(1/w) for w>0: rank by it directly
    keyed = d.filter(F.col("n_chars") > 0).select(
        "source",
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 12).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("smp_rank"))
        .filter(F.col("smp_rank") <= _WRS_K)
    )


# --------------------------------------------------------------------------
# q6l — k-fold cross-validation assignment: fold = md5(id‖salt) mod k,
# the CV counterpart of q6a's fixed 80/10/10 split. Reproducible from
# (id, salt, k) alone — re-runnable on any engine/resharding, folds
# are disjoint and exhaustive BY CONSTRUCTION (a property the oracle
# re-checks: per-fold counts sum to the corpus and each doc appears
# once). Emits per-fold sizes + byte volume so a training loop can
# verify fold balance without a second scan.
# --------------------------------------------------------------------------

_KFOLD_SALT = "cv-v1"
_KFOLD_K = 5


@query(
    "q6l_kfold",
    oracle=f"""
    SELECT
      CAST(CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '{_KFOLD_SALT}'), 1, 8))
                AS BIGINT) % {_KFOLD_K} AS INTEGER) AS fold,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      COUNT(DISTINCT doc_id) AS n_distinct
    FROM documents
    GROUP BY 1
    """,
)
def q6l_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_KFOLD_SALT))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        % _KFOLD_K
    ).cast("int")
    return (
        d.select(fold.alias("fold"), "doc_id", "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.countDistinct("doc_id").alias("n_distinct"),
        )
    )


# --------------------------------------------------------------------------
# q6m — curriculum packing: q6c's context packing with a QUALITY-FIRST
# global order (easy/clean docs first — curriculum learning's data
# order). Composes q83's quality signal (stopword-free length ratio
# proxy: here, tokens-per-char density ordered descending) with the
# distributed prefix sum over THAT order. Demonstrates that
# ordering.global_cumsum is order-key-generic — the same two-pass
# range-partition shape, no single-reducer window, with a float
# order key reduced to a deterministic integer (scaled-long density)
# so range boundaries are engine-exact.
# --------------------------------------------------------------------------


@query(
    "q6m_curriculum_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(FLOOR(CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
                        / GREATEST(n_chars, 1) * 1000000.0) AS BIGINT)
               AS density_key
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY density_key DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tokens_before
      FROM t
    )
    SELECT CAST(FLOOR(tokens_before / {_CTX_TOKENS}) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc
    FROM c GROUP BY 1
    """,
)
def q6m_curriculum_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_cumsum

    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    t = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.floor(
            n_tokens.cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
            * 1_000_000.0
        )
        .cast("bigint")
        .alias("density_key"),
    )
    c = global_cumsum(
        t,
        [("density_key", "desc"), F.col("doc_id")],
        "n_tokens",
        out_col="tokens_before",
        exclusive=True,
    )
    return (
        c.groupBy(F.floor(F.col("tokens_before") / _CTX_TOKENS).alias("pack_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# --------------------------------------------------------------------------
# q6o — first-fit-decreasing bin packing of the oversized-document
# tail into 4 shards: the classic scheduling answer to "balance the
# big files", distinct from q6c's sequence packing (which preserves
# order) — FFD sorts by size and places each item in the FIRST bin
# it fits. Bin state across items is sequential (like q4p/q4q), so
# the operator is a bounded applyInPandas scan over the TOP-500
# largest documents (TakeOrderedAndProject — at 100 TB you FFD the
# oversized tail and round-robin the rest; the tail is what skews
# shards). Capacity = ceil(total·1.1/4). The oracle replays the
# identical integer cascade as a recursive CTE carrying the 4 bin
# loads as columns — depth-bounded at 500 by construction.
# Everything is BIGINT; no floats anywhere but the capacity ceil.
# --------------------------------------------------------------------------

_FFD_TOP = 500
_FFD_BINS = 4


@query(
    "q6o_bin_packing",
    oracle=f"""
    WITH RECURSIVE items AS (
      SELECT ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
             CAST(n_chars AS BIGINT) AS sz
      FROM documents
      ORDER BY n_chars DESC, doc_id LIMIT {_FFD_TOP}
    ),
    cap AS (SELECT CAST(CEIL(SUM(sz) * 1.1 / {_FFD_BINS}.0) AS BIGINT)
                   AS cap FROM items),
    st AS (
      SELECT 0 AS rn,
             CAST(0 AS BIGINT) AS b1, CAST(0 AS BIGINT) AS b2,
             CAST(0 AS BIGINT) AS b3, CAST(0 AS BIGINT) AS b4,
             CAST(0 AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2,
             CAST(0 AS BIGINT) AS n3, CAST(0 AS BIGINT) AS n4,
             CAST(0 AS BIGINT) AS ovf, CAST(0 AS BIGINT) AS ovn
      UNION ALL
      SELECT i.rn,
        CASE WHEN st.b1 + i.sz <= cap.cap THEN st.b1 + i.sz ELSE st.b1 END,
        CASE WHEN st.b1 + i.sz <= cap.cap THEN st.b2
             WHEN st.b2 + i.sz <= cap.cap THEN st.b2 + i.sz ELSE st.b2 END,
        CASE WHEN st.b1 + i.sz <= cap.cap OR st.b2 + i.sz <= cap.cap
             THEN st.b3
             WHEN st.b3 + i.sz <= cap.cap THEN st.b3 + i.sz ELSE st.b3 END,
        CASE WHEN st.b1 + i.sz <= cap.cap OR st.b2 + i.sz <= cap.cap
                  OR st.b3 + i.sz <= cap.cap THEN st.b4
             WHEN st.b4 + i.sz <= cap.cap THEN st.b4 + i.sz ELSE st.b4 END,
        st.n1 + CASE WHEN st.b1 + i.sz <= cap.cap THEN 1 ELSE 0 END,
        st.n2 + CASE WHEN st.b1 + i.sz > cap.cap
                      AND st.b2 + i.sz <= cap.cap THEN 1 ELSE 0 END,
        st.n3 + CASE WHEN st.b1 + i.sz > cap.cap
                      AND st.b2 + i.sz > cap.cap
                      AND st.b3 + i.sz <= cap.cap THEN 1 ELSE 0 END,
        st.n4 + CASE WHEN st.b1 + i.sz > cap.cap
                      AND st.b2 + i.sz > cap.cap
                      AND st.b3 + i.sz > cap.cap
                      AND st.b4 + i.sz <= cap.cap THEN 1 ELSE 0 END,
        st.ovf + CASE WHEN st.b1 + i.sz > cap.cap
                       AND st.b2 + i.sz > cap.cap
                       AND st.b3 + i.sz > cap.cap
                       AND st.b4 + i.sz > cap.cap THEN i.sz ELSE 0 END,
        st.ovn + CASE WHEN st.b1 + i.sz > cap.cap
                       AND st.b2 + i.sz > cap.cap
                       AND st.b3 + i.sz > cap.cap
                       AND st.b4 + i.sz > cap.cap THEN 1 ELSE 0 END
      FROM st JOIN items i ON i.rn = st.rn + 1, cap
    ),
    fin AS (SELECT * FROM st WHERE rn = (SELECT MAX(rn) FROM st))
    SELECT e.bin_id, e.bin_load, e.n_items FROM fin, LATERAL (
      VALUES (1, fin.b1, fin.n1), (2, fin.b2, fin.n2),
             (3, fin.b3, fin.n3), (4, fin.b4, fin.n4),
             (-1, fin.ovf, fin.ovn)
    ) AS e(bin_id, bin_load, n_items)
    """,
)
def q6o_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    top = (
        d.select("doc_id", F.col("n_chars").cast("long").alias("sz"))
        .orderBy(F.col("sz").desc(), "doc_id")
        .limit(_FFD_TOP)
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["sz", "doc_id"], ascending=[False, True],
                              kind="mergesort")
        total = int(pdf["sz"].sum())
        import math

        cap = math.ceil(total * 1.1 / _FFD_BINS)
        loads = [0] * _FFD_BINS
        counts = [0] * _FFD_BINS
        ovf, ovn = 0, 0
        for sz in pdf["sz"].astype("int64"):
            placed = False
            for b in range(_FFD_BINS):
                if loads[b] + sz <= cap:
                    loads[b] += int(sz)
                    counts[b] += 1
                    placed = True
                    break
            if not placed:
                ovf += int(sz)
                ovn += 1
        return pd.DataFrame(
            {
                "bin_id": list(range(1, _FFD_BINS + 1)) + [-1],
                "bin_load": loads + [ovf],
                "n_items": counts + [ovn],
            }
        )

    return (
        top.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(ffd, schema="bin_id int, bin_load long, n_items long")
    )



# --------------------------------------------------------------------------
# q6p — cumulative gain chart (the decile lift table a targeting /
# data-selection pipeline reads before spending budget): users scored
# by total event value, responders = any high-value purchase, deciles
# assigned by ceil(rank·10/n) over the DISTRIBUTED rank
# (ordering.global_rank — no single-reducer NTILE window), then the
# 10-row decile table carries cumulative responder counts through a
# bounded window. All counts are exact integers; rank·10 ≤ 10n < 2^53
# so the decile boundary division is exact where it matters, and the
# gain ratios divide exact integers.
# --------------------------------------------------------------------------


@query(
    "q6p_gain_chart",
    oracle="""
    WITH scored AS (
      SELECT user_id,
             SUM(value) AS raw_score,
             CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS score_cents,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                      THEN 1 ELSE 0 END) AS resp
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT score_cents, resp,
             ROW_NUMBER() OVER (ORDER BY score_cents DESC, user_id) AS rk,
             COUNT(*) OVER () AS n
      FROM scored
    ),
    deciles AS (
      SELECT CAST(CEIL(rk * 10.0 / n) AS INTEGER) AS decile,
             COUNT(*) AS n_users,
             CAST(SUM(resp) AS BIGINT) AS responders
      FROM ranked GROUP BY 1
    )
    SELECT decile, n_users, responders,
           CAST(SUM(responders) OVER (ORDER BY decile) AS BIGINT)
             AS cum_responders,
           CAST(SUM(responders) OVER (ORDER BY decile) AS DOUBLE)
             / CAST((SELECT SUM(resp) FROM scored) AS DOUBLE) AS gain
    FROM deciles
    """,
)
def q6p_gain_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fcs_etl_reactor_spark.operators.ordering import global_rank

    e = load(spark, sf_dir, "events")
    scored = e.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150.0),
                1,
            ).otherwise(0)
        ).alias("resp"),
    )
    ranked = global_rank(
        scored, [("score_cents", "desc"), "user_id"], rank_col="rk"
    )
    n = scored.agg(F.count(F.lit(1)).alias("n"))
    total = scored.agg(F.sum("resp").alias("total_resp"))
    deciles = (
        ranked.crossJoin(F.broadcast(n))
        .groupBy(
            F.ceil(F.col("rk") * F.lit(10.0) / F.col("n"))
            .cast("int")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("resp").cast("bigint").alias("responders"),
        )
    )
    # the decile table is 10 rows — the cumulative window is bounded
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deciles.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_users",
            "responders",
            F.sum("responders").over(w).cast("bigint").alias("cum_responders"),
            (
                F.sum("responders").over(w).cast("double")
                / F.col("total_resp").cast("double")
            ).alias("gain"),
        )
    )


# --------------------------------------------------------------------------
# q6q — k-anonymity / l-diversity audit: before a corpus ships, every
# quasi-identifier combination must hide each row among ≥ k peers,
# and each group must carry ≥ l distinct sensitive values. QI here =
# (lang, source); "sensitive" = the character-count band. One groupBy
# builds the QI table (|groups| ≪ |rows|, map-side combinable); the
# audit rollup is group-bounded. All integers — exact at any
# partitioning.
# --------------------------------------------------------------------------

_KANON_K = 5
_KANON_L = 2


@query(
    "q6q_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT lang, source,
             COUNT(*) AS n,
             COUNT(DISTINCT CAST(FLOOR(n_chars / 500.0) AS INTEGER)) AS l_div
      FROM documents GROUP BY lang, source
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS k_violating_groups,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN l_div < {_KANON_L} THEN 1 ELSE 0 END) AS BIGINT)
             AS l_violating_groups
    FROM g
    """,
)
def q6q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(
            F.floor(F.col("n_chars") / 500.0).cast("int")
        ).alias("l_div"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") < _KANON_K, 1).otherwise(0))
        .cast("bigint")
        .alias("k_violating_groups"),
        F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("n").cast("bigint").alias("min_group_size"),
        F.sum(F.when(F.col("l_div") < _KANON_L, 1).otherwise(0))
        .cast("bigint")
        .alias("l_violating_groups"),
    )


# --------------------------------------------------------------------------
# q6r — differentially-private release shape: per-type counts with
# Laplace(b = 1/ε) noise drawn from a SEEDED md5-uniform (u ∈
# (−1/2, 1/2) from the first 6 hex chars, noise = −b·sign(u)·
# ln(1 − 2|u|) — the standard inverse-CDF draw). A production release
# uses a real RNG; the seeded draw keeps the mechanism VERIFIABLE —
# both engines derive the identical noise from the identical hash, so
# the whole release is oracle-checked. Per-group expression work on a
# map-side-combined count; the final ln is rounded to 6 dp to absorb
# engine trig/log last-ulp differences.
# --------------------------------------------------------------------------

_DP_B = 20.0  # Laplace scale = 1/epsilon, epsilon = 0.05
_DP_SEED = "dp-v1"


@query(
    "q6r_dp_noisy_counts",
    oracle=f"""
    WITH c AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n,
             (CAST(('0x' || SUBSTR(MD5(event_type || '{_DP_SEED}'), 1, 6))
                   AS BIGINT) + 0.5) / 16777216.0 - 0.5 AS u
      FROM c
    )
    SELECT event_type, CAST(n AS BIGINT) AS true_count,
           ROUND(CAST(n AS DOUBLE)
                 - {_DP_B} * SIGN(u) * LN(1.0 - 2.0 * ABS(u)), 6)
             AS noisy_count
    FROM u
    """,
)
def q6r_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    c = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("event_type"), F.lit(_DP_SEED))), 1, 6
                ),
                16,
                10,
            ).cast("bigint")
            + F.lit(0.5)
        )
        / F.lit(16777216.0)
        - F.lit(0.5)
    )
    noise = (
        F.lit(-_DP_B)
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    return c.select(
        "event_type",
        F.col("n").cast("bigint").alias("true_count"),
        F.round(F.col("n").cast("double") + noise, 6).alias("noisy_count"),
    )


# --------------------------------------------------------------------------
# q6s — feature hashing (the hashing trick): tokens mapped to a fixed
# _FH_DIM-bucket space by a cross-engine hash (md5 prefix), the
# featurization step that turns unbounded vocabulary into bounded
# model input with no dictionary to ship. Reports the per-bucket mass
# of the top buckets plus the collision profile (distinct terms per
# bucket) — the quantity you audit before trusting hashed features.
# One explode→groupBy pass, map-side combinable; the bucket table is
# _FH_DIM rows regardless of corpus size.
# --------------------------------------------------------------------------

_FH_DIM = 1024


@query(
    "q6s_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    hashed AS (
      SELECT CAST(('0x' || SUBSTR(MD5(term), 1, 8)) AS BIGINT) % {_FH_DIM}
               AS bucket,
             term
      FROM toks WHERE term <> ''
    ),
    b AS (
      SELECT bucket, COUNT(*) AS mass, COUNT(DISTINCT term) AS n_terms
      FROM hashed GROUP BY bucket
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(mass AS BIGINT) AS mass,
           CAST(n_terms AS BIGINT) AS n_terms
    FROM b ORDER BY mass DESC, bucket LIMIT 20
    """,
)
def q6s_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint")
        % _FH_DIM
    )
    b = toks.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("mass"),
        F.count_distinct("term").alias("n_terms"),
    )
    return (
        b.select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("mass").cast("bigint").alias("mass"),
            F.col("n_terms").cast("bigint").alias("n_terms"),
        )
        .orderBy(F.col("mass").desc(), "bucket")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q6u — synthetic data by inverse-ECDF sampling: draw K synthetic
# values from the EMPIRICAL distribution of purchase values by
# mapping seeded md5 uniforms through the order statistics (rank =
# 1 + ⌊u·n⌋, value = the rank-th smallest). Deterministic end to end
# — the same draws on any engine — which is what makes a synthetic
# corpus auditable; production swaps the seed stream for a real RNG
# with the identical topology. Ranks are selected distributed
# (ordering.global_rank); the K-row draw table broadcasts. Output
# compares real vs synthetic moments (exact scaled sums).
# --------------------------------------------------------------------------

_SYN_K = 1000
_SYN_SEED = "synth-v1"


@query(
    "q6u_synthetic_sample",
    oracle=f"""
    WITH v AS (SELECT value FROM events WHERE event_type = 'purchase'),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    draws AS (
      SELECT i,
             (CAST(('0x' || SUBSTR(MD5(CAST(i AS VARCHAR) || '{_SYN_SEED}'), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 AS u
      FROM (SELECT UNNEST(RANGE(0, {_SYN_K})) AS i)
    ),
    ranks AS (
      SELECT i, CAST(1 + FLOOR(u * n) AS BIGINT) AS rk
      FROM draws, n_
    ),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rk FROM v
    ),
    synth AS (
      SELECT ranks.i, ranked.value FROM ranks JOIN ranked USING (rk)
    )
    SELECT (SELECT n FROM n_) AS n_real,
           CAST(COUNT(*) AS BIGINT) AS n_synth,
           (SELECT CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 100.0 / COUNT(*) FROM v) AS mean_real,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*) AS mean_synth,
           MIN(value) AS min_synth,
           MAX(value) AS max_synth
    FROM synth
    """,
)
def q6u_synthetic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "purchase").select("value")
    n_ = v.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    draws = spark.range(_SYN_K).select(
        F.col("id").alias("i"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("id").cast("string"), F.lit(_SYN_SEED))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                + F.lit(0.5)
            )
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    ranks = draws.crossJoin(F.broadcast(n_)).select(
        "i",
        (F.lit(1) + F.floor(F.col("u") * F.col("n"))).cast("bigint").alias("rk"),
    )
    ranked = global_rank(v, ["value"], rank_col="rk")
    synth = ranked.join(F.broadcast(ranks), "rk").select("i", "value")
    cents = F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"))
    mean_real = v.agg(
        (cents.cast("double") / F.lit(100.0) / F.count(F.lit(1))).alias(
            "mean_real"
        )
    )
    return (
        synth.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_synth"),
            (cents.cast("double") / F.lit(100.0) / F.count(F.lit(1))).alias(
                "mean_synth"
            ),
            F.min("value").alias("min_synth"),
            F.max("value").alias("max_synth"),
        )
        .crossJoin(F.broadcast(n_.select(F.col("n").alias("n_real"))))
        .crossJoin(F.broadcast(mean_real))
        .select(
            "n_real", "n_synth", "mean_real", "mean_synth",
            "min_synth", "max_synth",
        )
    )


# --------------------------------------------------------------------------
# q6x — mixture reweighting to a target distribution: given the
# DECLARED target share per source (the training-mix spec), compute
# each source's importance weight w = target/current and the
# effective sample size (Σn·w)²/Σn·w² — the number that tells you
# whether reweighting is viable or the corpus must be re-collected
# (complements q6f's acceptance-sampling mixer). Current shares are
# exact integer counts; targets are shared literals; every ratio is
# the identical expression on both engines, rounded at 9 dp.
# --------------------------------------------------------------------------

_MIX_TARGET = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}


def _mix_case(col: str) -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in _MIX_TARGET.items()
    )
    return f"CASE {col} {arms} ELSE CAST(0.0 AS DOUBLE) END"


@query(
    "q6x_mixture_reweight",
    oracle=f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c),
    w AS (
      SELECT source, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) / t AS share,
             {_mix_case("source")} AS target,
             {_mix_case("source")} / (CAST(n AS DOUBLE) / t) AS wt
      FROM c, tot
    )
    SELECT source, n, ROUND(share, 9) AS share, target,
           ROUND(wt, 9) AS weight,
           ROUND((SELECT (SUM(n * wt) * SUM(n * wt)) / SUM(n * wt * wt)
                  FROM w), 3) AS effective_n
    FROM w
    """,
)
def q6x_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("t"))
    target = F.lit(0.0)
    tcase = F.when(F.col("source") == list(_MIX_TARGET)[0], F.lit(_MIX_TARGET[list(_MIX_TARGET)[0]]))
    for k, v in list(_MIX_TARGET.items())[1:]:
        tcase = tcase.when(F.col("source") == k, F.lit(v))
    tcase = tcase.otherwise(target)
    w = c.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("t")).alias("share"),
        tcase.alias("target"),
        (tcase / (F.col("n").cast("double") / F.col("t"))).alias("wt"),
    )
    ess = w.agg(
        (
            (F.sum(F.col("n") * F.col("wt")) * F.sum(F.col("n") * F.col("wt")))
            / F.sum(F.col("n") * F.col("wt") * F.col("wt"))
        ).alias("e")
    )
    return (
        w.crossJoin(F.broadcast(ess))
        .select(
            "source",
            "n",
            F.round("share", 9).alias("share"),
            "target",
            F.round("wt", 9).alias("weight"),
            F.round("e", 3).alias("effective_n"),
        )
    )
