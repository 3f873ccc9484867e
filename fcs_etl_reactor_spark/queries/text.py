"""Text-analysis operators for LLM-corpus pipelines
(SURVEY.md §2.11 L4/L5 + north-star text ops: language-ID, quality
scoring, token counting, fingerprinting, n-gram Jaccard near-dup).

Scale shapes:
- token pipelines are explode → groupBy(term): shuffle volume is the
  token count, partial agg collapses per-partition duplicates first;
- doc⨯doc similarity is NEVER materialized — candidate pairs come from
  an inverted-index join (shared shingle) so cost is Σ posting² not n²;
- everything is JVM built-ins (split/explode/agg) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import o_dsum, o_fsum
from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q80 — tokenize + term frequencies (L4): global top terms. Exercises
# split/explode/agg; deterministic (integer counts, full output).
# --------------------------------------------------------------------------


@query(
    "q80_term_counts",
    oracle="""
    SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    )
    WHERE term <> ''
    GROUP BY term
    """,
)
def q80_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
    )


# --------------------------------------------------------------------------
# q81 — TF-IDF (L4): doc-term counts × inverse document frequency.
# df is computed as COUNT(*) OVER (PARTITION BY term) on the tf rows
# (each tf row is one distinct doc-term), so the corpus is exploded
# and aggregated exactly ONCE — a join against a derived df table
# would re-execute the explode+agg subtree for the build side. The
# window has no ORDER BY (whole-partition frame), so it is a hash
# shuffle on term + per-group count, no sort.
# --------------------------------------------------------------------------


@query(
    "q81_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE)
                            / (COUNT(*) OVER (PARTITION BY term))), 9) AS tfidf
    FROM tf CROSS JOIN n
    """,
)
def q81_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # corpus size as a 1-row broadcast, not a driver-side count() —
    # keeps the whole query one lazy plan (no extra job)
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = F.count(F.lit(1)).over(Window.partitionBy("term"))
    return tf.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.col("n_docs") / df), 9).alias("tfidf"),
    )


# --------------------------------------------------------------------------
# q82 — lexicon tagging (L5): token ⋈ broadcast sentiment lexicon →
# per-doc score. The PAPERS.md "dictionary join" pattern: the lexicon
# is constant-sized, so this is a broadcast hash join at any corpus
# size.
# --------------------------------------------------------------------------

_LEXICON = {
    "fast": 2, "big": 1, "small": -1, "slow": -2, "error": -3, "value": 1,
}


@query(
    "q82_lexicon_score",
    oracle=f"""
    WITH lex(term, score) AS (VALUES
      {", ".join(f"('{t}', {s})" for t, s in sorted(_LEXICON.items()))}
    ), toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    )
    SELECT t.doc_id,
           CAST(COALESCE(SUM(l.score), 0) AS BIGINT) AS sentiment,
           CAST(COUNT(l.term) AS BIGINT) AS n_matched
    FROM toks t LEFT JOIN lex l USING (term)
    GROUP BY t.doc_id
    """,
)
def q82_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lex = d.sparkSession.createDataFrame(
        sorted(_LEXICON.items()), "term STRING, score INT"
    )
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        toks.join(F.broadcast(lex), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum("score"), F.lit(0)).cast("bigint").alias("sentiment"),
            F.count("score").alias("n_matched"),
        )
    )


# --------------------------------------------------------------------------
# q83 — quality scoring (north-star): length / word-length / stopword
# ratio — pure expression arithmetic, deterministic.
# --------------------------------------------------------------------------

_STOPWORDS = ["a", "the", "of", "and", "to"]


@query(
    "q83_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars, STRING_SPLIT(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
      CAST(LENGTH(toks) AS BIGINT) AS n_tokens,
      CAST(n_chars AS DOUBLE) / LENGTH(toks) AS avg_token_len,
      CAST(LENGTH(LIST_FILTER(toks, t -> LIST_CONTAINS({_STOPWORDS!r}, t))) AS DOUBLE)
        / LENGTH(toks) AS stopword_ratio,
      CASE WHEN LENGTH(toks) BETWEEN 20 AND 1000
            AND CAST(n_chars AS DOUBLE) / LENGTH(toks) BETWEEN 3 AND 12
           THEN 1 ELSE 0 END AS quality_pass
    FROM t
    """,
)
def q83_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    avg_len = F.col("n_chars").cast("double") / F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(F.lit(_STOPWORDS), t))).cast(
            "double"
        )
        / F.size(toks)
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        F.when((n_tokens.between(20, 1000)) & (avg_len.between(3, 12)), 1)
        .otherwise(0)
        .alias("quality_pass"),
    )


# --------------------------------------------------------------------------
# q84 — language-ID heuristic (north-star): stopword-profile match
# rate. (Fixture text is synthetic so the interesting part is the
# operator shape: higher-order array ops, no UDF.)
# --------------------------------------------------------------------------


@query(
    "q84_language_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents
    )
    SELECT doc_id, lang,
      CAST(LENGTH(LIST_FILTER(toks, x -> LIST_CONTAINS({_STOPWORDS!r}, x))) AS DOUBLE)
        / LENGTH(toks) AS en_score,
      CASE WHEN CAST(LENGTH(LIST_FILTER(toks, x -> LIST_CONTAINS({_STOPWORDS!r}, x))) AS DOUBLE)
        / LENGTH(toks) > 0.05 THEN 'en' ELSE 'other' END AS lang_pred
    FROM t
    """,
)
def q84_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    score = F.size(
        F.filter(toks, lambda x: F.array_contains(F.lit(_STOPWORDS), x))
    ).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        score.alias("en_score"),
        F.when(score > 0.05, "en").otherwise("other").alias("lang_pred"),
    )


# --------------------------------------------------------------------------
# q85 — document fingerprint (north-star): canonicalize (lower, trim,
# collapse whitespace) → MD5. The dedup-join key for exact matching
# across formatting variants.
# --------------------------------------------------------------------------


@query(
    "q85_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def q85_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias(
            "fingerprint"
        ),
    )


# --------------------------------------------------------------------------
# q86 — n-gram Jaccard near-dup (north-star dedup family): 3-shingle
# sets, candidate pairs via inverted-index self-join (only docs sharing
# a shingle are ever paired — the LSH-free exact variant), Jaccard =
# |∩| / |∪|. Restricted to doc_id < 200 to bound the demo; the operator
# itself scales as Σ posting-list².
# --------------------------------------------------------------------------

_JACCARD_MAX_DOC = 200
_JACCARD_THRESHOLD = 0.2


@query(
    "q86_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
      WHERE doc_id < {_JACCARD_MAX_DOC}
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(w) - 2, 0))) AS g(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common)
          >= {_JACCARD_THRESHOLD}
    """,
)
def q86_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _JACCARD_MAX_DOC)
    return ngram_jaccard_pairs(
        d, id_col="doc_id", text_col="text", n=3, threshold=_JACCARD_THRESHOLD
    )


# --------------------------------------------------------------------------
# q87 — token counting (north-star): whitespace tokens plus a BPE-ish
# subword estimate — greedy ≤4-char alpha/digit chunks via regex, the
# shape of a byte-pair piece count without a vocab. Both engines run
# the same greedy leftmost match, so counts agree exactly; the
# chars/4 heuristic is included as the third estimator.
# --------------------------------------------------------------------------

_BPEISH = "[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]"


@query(
    "q87_token_counts",
    oracle=f"""
    SELECT doc_id,
      CAST(LENGTH(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS BIGINT)
        AS n_ws_tokens,
      CAST(LENGTH(REGEXP_EXTRACT_ALL(LOWER(text), '{_BPEISH}')) AS BIGINT)
        AS n_bpeish,
      CAST(CEIL(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS n_chars_div4
    FROM documents
    """,
)
def q87_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda t: t != "")
    return d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPEISH), F.lit(0))
        ).cast("bigint").alias("n_bpeish"),
        F.ceil(F.col("n_chars").cast("double") / F.lit(4.0)).cast("bigint").alias(
            "n_chars_div4"
        ),
    )


# --------------------------------------------------------------------------
# q78 — content redaction (north-star: PII scrubbing before training):
# regex-redact email-shaped and long-digit spans, flag docs whose text
# changed. Fixture text is synthetic so hits are rare — the operator
# shape (chained regexp_replace in one codegen projection) is the
# point; patterns are RE2-safe so both engines agree exactly.
# --------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_DIGITS_RE = "[0-9]{6,}"


@query(
    "q78_redaction",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             REGEXP_REPLACE(REGEXP_REPLACE(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_DIGITS_RE}', '<NUM>', 'g') AS redacted,
             text
      FROM documents
    )
    SELECT doc_id,
           MD5(redacted) AS redacted_md5,
           CAST(CASE WHEN redacted <> text THEN 1 ELSE 0 END AS INTEGER) AS was_redacted
    FROM r
    """,
)
def q78_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _DIGITS_RE, "<NUM>"
    )
    return d.select(
        "doc_id",
        F.md5(redacted).alias("redacted_md5"),
        (redacted != F.col("text")).cast("int").alias("was_redacted"),
    )


# --------------------------------------------------------------------------
# q79 — repetition scoring (north-star quality filter): the share of a
# document occupied by its single most frequent token — the classic
# "repeated boilerplate" signal. One explode + grouped count, then a
# per-doc argmax; filter threshold marks low-quality docs.
# --------------------------------------------------------------------------


@query(
    "q79_repetition",
    oracle="""
    WITH tf AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ), counts AS (
      SELECT doc_id, term, COUNT(*) AS n FROM tf WHERE term <> ''
      GROUP BY doc_id, term
    ), agg AS (
      SELECT doc_id, MAX(n) AS max_tf, CAST(SUM(n) AS BIGINT) AS n_tokens
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, max_tf, n_tokens,
           ROUND(CAST(max_tf AS DOUBLE) / n_tokens, 9) AS top_token_share,
           CAST(CASE WHEN CAST(max_tf AS DOUBLE) / n_tokens > 0.2
                THEN 1 ELSE 0 END AS INTEGER) AS is_repetitive
    FROM agg
    """,
)
def q79_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = F.col("max_tf").cast("double") / F.col("n_tokens")
    return (
        counts.groupBy("doc_id")
        .agg(F.max("n").alias("max_tf"), F.sum("n").alias("n_tokens"))
        .select(
            "doc_id",
            "max_tf",
            "n_tokens",
            F.round(share, 9).alias("top_token_share"),
            (share > 0.2).cast("int").alias("is_repetitive"),
        )
    )


# --------------------------------------------------------------------------
# q8a — corpus profile (the first query every training-data pipeline
# runs): per-language doc counts, exact length percentiles, source
# cardinality, token totals. One pass, groups bounded by |langs|.
# --------------------------------------------------------------------------


@query(
    "q8a_corpus_profile",
    oracle="""
    SELECT
      lang,
      COUNT(*) AS n_docs,
      COUNT(DISTINCT source) AS n_sources,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      ROUND(QUANTILE_CONT(n_chars, 0.5), 6) AS p50_chars,
      ROUND(QUANTILE_CONT(n_chars, 0.95), 6) AS p95_chars,
      CAST(SUM(LENGTH(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> ''))) AS BIGINT)
        AS total_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q8a_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias("p95_chars"),
        F.sum(n_toks).cast("bigint").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# q8c — char-trigram LM familiarity (L4 quality scoring, the KenLM-ish
# shape): train a per-language character-trigram frequency model over
# the corpus in one pass, then score every document by the fraction of
# its trigram tokens whose (lang, trigram) corpus frequency clears a
# threshold. Low familiarity = out-of-distribution text (wrong
# language, mojibake, boilerplate markup) — the standard cheap LM
# quality gate before an actual perplexity model.
#
# Integer counts and a single final divide keep it engine-exact (no
# log-sum float drift), so the oracle replays the whole thing.
#
# Scale: one explode of the corpus (shuffle = trigram token count with
# map-side partial agg); the trained model is bounded by
# |langs|·|charset|³ — a broadcast-join build side by construction,
# so scoring is a map-only pass over the exploded tokens.
# --------------------------------------------------------------------------

_LM_MIN_COUNT = 10


@query(
    "q8c_lm_familiarity",
    oracle=f"""
    WITH tri AS (
      SELECT doc_id, lang, SUBSTR(text, i, 3) AS tri
      FROM (SELECT doc_id, lang, text,
                   UNNEST(RANGE(1, GREATEST(LEN(text) - 2, 0) + 1)) AS i
            FROM documents)
    ), model AS (
      SELECT lang, tri, COUNT(*) AS n FROM tri GROUP BY lang, tri
    )
    SELECT t.doc_id,
           t.lang,
           COUNT(*) AS n_tri,
           ROUND(CAST(SUM(CASE WHEN m.n >= {_LM_MIN_COUNT} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 9) AS familiarity
    FROM tri t
    JOIN model m ON t.lang = m.lang AND t.tri = m.tri
    GROUP BY t.doc_id, t.lang
    """,
)
def q8c_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    idx = F.when(
        F.length("text") >= 3, F.sequence(F.lit(1), F.length("text") - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri = d.select(
        "doc_id",
        "lang",
        F.explode(F.transform(idx, lambda i: F.col("text").substr(i, F.lit(3)))).alias(
            "tri"
        ),
    )
    # Pre-aggregate to per-(doc, lang, tri) COUNTS first (round 12):
    # both the model and the doc scores are sums over these counts, so
    # the trigram explode now feeds ONE exchange that both consumers
    # reuse (the raw form planned the explode into the model subtree
    # AND the probe side — two executions) and the broadcast-join probe
    # shrinks from every trigram occurrence (1.48M rows at sf0.1) to
    # the distinct (doc, tri) pairs (~4×). Integer counts sum exactly,
    # so n_tri and the familiarity ratio are bit-identical (Σc =
    # count(*), Σ c·[n≥t] = Σ [n≥t] over occurrences). Measured
    # 9.5→4.7 s cold / 4.7→3.7 s warm; the Arrow counts-kernel variant
    # re-measured as a negative (7.6 s — Python trigram loops lose to
    # codegen even with the count-shrunken boundary, confirming r11).
    dt = tri.groupBy("doc_id", "lang", "tri").agg(F.count(F.lit(1)).alias("c"))
    model = dt.groupBy("lang", "tri").agg(F.sum("c").alias("n"))
    scored = dt.join(F.broadcast(model), ["lang", "tri"])
    return scored.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n_tri"),
        F.round(
            F.sum(
                F.when(F.col("n") >= _LM_MIN_COUNT, F.col("c")).otherwise(0)
            ).cast("double")
            / F.sum("c"),
            9,
        ).alias("familiarity"),
    )


# --------------------------------------------------------------------------
# q8g — vocabulary building + OOV rate (the tokenizer-training
# precursor): top-100 corpus vocabulary by frequency (deterministic
# (count DESC, term ASC) tie-break), then per-language OOV token
# rates against it. The vocab top-k is TakeOrderedAndProject
# (per-partition heads + a k-row merge — asserted in test_plans),
# bounded-size by construction, and broadcast back against the token
# stream — at 100 TB the vocab is the only thing that ever leaves the
# token-shuffle stage.
# --------------------------------------------------------------------------


@query(
    "q8g_vocab_oov",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ), counts AS (
      SELECT term, COUNT(*) AS n FROM toks WHERE term <> '' GROUP BY term
    ), vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rk FROM counts
      ) WHERE rk <= 100
    )
    SELECT t.lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(SUM(CASE WHEN v.term IS NULL THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 9) AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (term)
    WHERE t.term <> ''
    GROUP BY t.lang
    """,
)
def q8g_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit → TakeOrderedAndProject (per-partition heads, then
    # a k-row merge) — NOT a global row_number window, which would
    # sort the whole vocabulary candidate set on one partition
    vocab = (
        counts.orderBy(F.col("n").desc(), F.col("term"))
        .limit(100)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
            F.round(
                F.sum(F.col("in_vocab").isNull().cast("double")) / F.count(F.lit(1)), 9
            ).alias("oov_rate"),
        )
    )


# --------------------------------------------------------------------------
# q8i — sliding-window document chunking (the RAG/context-window prep
# op q5c's non-overlapping spans don't cover): width-6 stride-4 token
# windows per document, each chunk addressed (doc_id, chunk_idx) and
# content-fingerprinted. Pure expression pipeline (sequence →
# transform → posexplode): chunking 100 TB is one narrow map stage,
# no shuffle at all until something downstream aggregates.
# --------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 6, 4


@query(
    "q8i_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(s AS INT) AS chunk_idx,
             ARRAY_TO_STRING(w[s*{_CHUNK_S}+1 : s*{_CHUNK_S}+{_CHUNK_W}], ' ') AS chunk
      FROM (SELECT doc_id, w,
                   UNNEST(RANGE(0, GREATEST(CAST(CEIL((LEN(w) - {_CHUNK_W}) / {_CHUNK_S}.0)
                                            AS BIGINT) + 1, 1))) AS s
            FROM toks)
    )
    SELECT doc_id, chunk_idx,
           CAST(LEN(STRING_SPLIT(chunk, ' ')) AS INTEGER) AS n_tokens,
           MD5(chunk) AS chunk_digest
    FROM chunks
    """,
)
def q8i_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # chunk starts: 0, S, 2S, ... covering the tail (last window may be
    # short); ceil((len-W)/S)+1 windows, minimum 1
    n_chunks = F.greatest(
        (F.ceil((F.size(toks) - _CHUNK_W) / F.lit(float(_CHUNK_S)))).cast("long") + 1,
        F.lit(1).cast("long"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda s: F.concat_ws(" ", F.slice(toks, (s * _CHUNK_S + 1).cast("int"), _CHUNK_W)),
    )
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(F.split(F.col("chunk"), " ")).alias("n_tokens"),
        F.md5(F.col("chunk")).alias("chunk_digest"),
    )


# --------------------------------------------------------------------------
# q8j — BPE merge-step pair counts (tokenizer training's inner loop):
# the most frequent adjacent symbol pairs, counted over the DISTINCT
# word table weighted by word frequency — the classic BPE efficiency
# trick (pair extraction touches |vocab| rows, not |corpus| tokens;
# at 100 TB the distinct-word table is orders of magnitude smaller).
# Top-20 via TakeOrderedAndProject with a total tie-break. A full BPE
# trainer iterates this step re-segmenting after each merge; each
# iteration is this same bounded-output job.
# --------------------------------------------------------------------------


@query(
    "q8j_bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ), wc AS (
      SELECT term, COUNT(*) AS n FROM toks WHERE term <> '' GROUP BY term
    ), pairs AS (
      SELECT SUBSTR(term, CAST(i AS INT), 2) AS pair, n
      FROM (SELECT term, n, UNNEST(RANGE(1, LENGTH(term))) AS i
            FROM wc WHERE LENGTH(term) >= 2)
    )
    SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def q8j_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        wc.filter(F.length("term") >= 2)
        .select(
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("term") - 1),
                    lambda i: F.substring(F.col("term"), i, 2),
                )
            ).alias("_", "pair"),
            "n",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q8k — count-based n-gram language model training (L4 scale-up): the
# classic distributed-LM estimation pass — trigram counts, context
# marginals, MLE conditional probabilities — restricted to the top-100
# contexts (deterministic (count DESC, context) cutoff) so the result
# is reviewable. One explode produces all trigram occurrences; both
# count layers are map-side-combinable hash aggregations; the top-100
# cutoff is TakeOrderedAndProject (per-partition heads + k-row merge,
# never a single-partition window); the 100-row context table joins
# back by broadcast. At 100 TB this is exactly the Google-ngrams /
# KenLM counting topology: nothing materializes except the two count
# tables, both shuffled on their own keys once.
# --------------------------------------------------------------------------


@query(
    "q8k_trigram_lm",
    oracle="""
    WITH toks AS (
      SELECT STRING_SPLIT(text, ' ') AS w FROM documents
    ), tri AS (
      SELECT ARRAY_TO_STRING(w[i:i+1], ' ') AS context, w[i+2] AS next_tok
      FROM (SELECT w, UNNEST(RANGE(1, GREATEST(LEN(w) - 2, 0) + 1)) AS i
            FROM toks)
    ), c3 AS (
      SELECT context, next_tok, COUNT(*) AS n_trigram
      FROM tri GROUP BY context, next_tok
    ), c2 AS (
      SELECT context, CAST(SUM(n_trigram) AS BIGINT) AS n_context
      FROM c3 GROUP BY context
    ), top AS (
      SELECT context, n_context,
             ROW_NUMBER() OVER (ORDER BY n_context DESC, context) AS rk
      FROM c2
    )
    SELECT c3.context, c3.next_tok, c3.n_trigram, t.n_context,
           ROUND(c3.n_trigram / CAST(t.n_context AS DOUBLE), 9) AS prob
    FROM c3 JOIN top t ON c3.context = t.context
    WHERE t.rk <= 100
    """,
)
def q8k_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tri = (
        d.select(F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)  # sequence(1,0) would run DOWNWARD
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda i: F.struct(
                        F.concat_ws(" ", F.slice("w", i, 2)).alias("context"),
                        F.element_at("w", (i + 2).cast("int")).alias("next_tok"),
                    ),
                )
            ).alias("t")
        )
        .select("t.context", "t.next_tok")
    )
    c3 = tri.groupBy("context", "next_tok").agg(
        F.count(F.lit(1)).alias("n_trigram")
    )
    c2 = c3.groupBy("context").agg(F.sum("n_trigram").alias("n_context"))
    top = c2.orderBy(F.desc("n_context"), "context").limit(100)
    return c3.join(F.broadcast(top), "context").select(
        "context",
        "next_tok",
        "n_trigram",
        "n_context",
        F.round(F.col("n_trigram") / F.col("n_context").cast("double"), 9).alias(
            "prob"
        ),
    )


# --------------------------------------------------------------------------
# q8m — BPE ENCODING with a frozen tokenizer (the production-side
# counterpart of the train_bpe trainer): apply a ranked merge list to
# every word of every document. The Spark side runs the REAL
# operator — operators/bpe._merge_symbols, a pure-expression
# aggregate() left-fold per merge, chained in rank order, no Python.
# The oracle replays the SAME leftmost-nonoverlapping semantics in a
# completely different formulation: each word rendered "(c)(c)..."
# and each merge a REPLACE('(a)(b)' → '(ab)') — string REPLACE scans
# left-to-right without overlap, exactly the fold's contract (the
# bracket wrapping prevents boundary-sharing between matches). Two
# independent formulations hashing identically is the strongest
# equivalence evidence in the text family. Merges include a 2-level
# chain ((t,a)→(ta,b)→(tab,le)) so rank order provably matters.
# --------------------------------------------------------------------------

_BPE_MERGES = [("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"), ("a", "s"), ("h", "a")]


def _bpe_oracle() -> str:
    s = "'(' || ARRAY_TO_STRING(STRING_SPLIT(w, ''), ')(') || ')'"
    for a, b in _BPE_MERGES:
        s = f"REPLACE({s}, '({a})({b})', '({a}{b})')"
    return f"""
    WITH words AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ), enc AS (
      SELECT doc_id, w, {s} AS s FROM words WHERE w <> ''
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(LEN(w)) AS BIGINT) AS n_chars,
           CAST(CAST(SUM(LEN(s) - LEN(REPLACE(s, ')(', ''))) AS BIGINT) // 2
                + COUNT(*) AS BIGINT) AS n_tokens
    FROM enc GROUP BY doc_id
    """


@query("q8m_bpe_encode", oracle=_bpe_oracle())
def q8m_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.bpe import _merge_symbols

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    # Encode the DISTINCT vocabulary, not every occurrence: identical
    # words encode identically, so the O(len²)-ish fold runs once per
    # vocab entry (thousands) instead of once per corpus token
    # (trillions at 100 TB), and the tiny (word → token count) map
    # broadcast-joins back to the occurrences. Measured 10.3 s →
    # ~0.3 s at sf0.1.
    vocab = words.select("w").distinct().select(
        "w", F.array_remove(F.split("w", "(?!^)"), "").alias("symbols")
    )
    for a, b in _BPE_MERGES:
        vocab = vocab.withColumn("symbols", _merge_symbols(a, b))
    encoded = vocab.select("w", F.size("symbols").alias("w_tokens"))
    return (
        words.join(F.broadcast(encoded), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("w_tokens").cast("bigint").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# q8o — BM25 retrieval scoring (north-star: search over the training
# corpus; the ranking function behind Lucene/Elasticsearch retrieval
# and the retrieval half of dedup-by-retrieval pipelines).
#
# Scale shape: one explode→(doc,term) agg for tf, df via a
# whole-partition window on term (the q81 pattern: the corpus is
# exploded exactly once), corpus stats (N, avgdl) as a 1-row
# broadcast. The query-term filter is pushed below the explode-side
# aggregation, so shuffle volume is |matching postings|, not the
# corpus token count. Per-doc score = exact scaled-long sum of
# per-term partials (functions/exact.py) — order-independent, so the
# hash survives any partitioning.
# --------------------------------------------------------------------------

_BM25_QUERY = ["spark", "join", "vector", "stream"]
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in _BM25_QUERY)
    return f"""
    WITH q(term) AS (VALUES {terms}),
    toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks WHERE term <> '' GROUP BY doc_id
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
      SELECT t.doc_id, t.term, COUNT(*) AS tf
      FROM toks t JOIN q USING (term) GROUP BY t.doc_id, t.term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             LN(1.0 + (n_docs - COUNT(*) OVER (PARTITION BY tf.term) + 0.5)
                      / (COUNT(*) OVER (PARTITION BY tf.term) + 0.5))
             * (tf.tf * ({_BM25_K1} + 1.0))
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl))
             AS s
      FROM tf JOIN dl USING (doc_id) CROSS JOIN stats
    )
    SELECT doc_id, {o_fsum("s", "bm25", "1000000000.0")}, COUNT(*) AS n_terms
    FROM scored GROUP BY doc_id
    """


@query("q8o_bm25", oracle=_bm25_oracle())
def q8o_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import fsum

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = F.count(F.lit(1)).over(Window.partitionBy("term"))
    idf = F.log(
        1.0 + (F.col("n_docs") - df_ + F.lit(0.5)) / (df_ + F.lit(0.5))
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        fsum(F.col("s"), "bm25", scale=1e9), F.count(F.lit(1)).alias("n_terms")
    )


# --------------------------------------------------------------------------
# q8p — inverted-index build (north-star: index export for retrieval;
# the posting-list materialization step after the q80 pair
# representation). Postings are doc_ids sorted ascending and
# serialized to a string — the driver canonicalizer rejects top-level
# arrays, and an index shard on disk is byte-oriented anyway.
#
# Scale note: at 100 TB the (term, doc_id) PAIR table (q80) is the
# working representation — collect_set materializes one term's whole
# posting list in executor memory, so this export is gated to
# df ≤ _POSTING_CAP terms (head terms ship as pair shards instead;
# the cap is a real filter in-plan, not a silent truncation). The
# fixture vocabulary is 31 synthetic terms appearing in nearly every
# doc (max df 3.9k at sf0.1), so the cap is sized to keep every
# fixture term under it while still exercising the gate.
# --------------------------------------------------------------------------

_POSTING_CAP = 5000


@query(
    "q8p_inverted_index",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
      ) WHERE term <> ''
    ),
    sized AS (
      SELECT term, COUNT(*) AS df FROM pairs GROUP BY term
      HAVING COUNT(*) <= {_POSTING_CAP}
    )
    SELECT p.term, s.df,
           STRING_AGG(CAST(p.doc_id AS VARCHAR), ',' ORDER BY p.doc_id)
             AS postings
    FROM pairs p JOIN sized s USING (term)
    GROUP BY p.term, s.df
    """,
)
def q8p_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .select("term", "doc_id")
        .distinct()
    )
    lists = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(F.collect_list("doc_id")).alias("ids"),
    )
    return (
        lists.filter(F.col("df") <= _POSTING_CAP)
        .select(
            "term",
            "df",
            F.array_join(F.transform("ids", lambda x: x.cast("string")), ",").alias(
                "postings"
            ),
        )
    )


# --------------------------------------------------------------------------
# q8r — Zipf-law fit over the term-frequency spectrum: OLS slope of
# ln(freq) on ln(rank) (rank by frequency, deterministic term
# tie-break). The standard corpus-health diagnostic — natural text
# sits near slope −1; synthetic/templated corpora flatten. Shape: one
# explode→term agg (the q80 pattern), a single whole-table window for
# the rank (|vocab| rows, not |corpus| — fine even at 100 TB since
# vocabularies are bounded), then one closed-form OLS over scaled-long
# exact sums (the q8q pattern).
# --------------------------------------------------------------------------


@query(
    "q8r_zipf_fit",
    oracle=f"""
    WITH tf AS (
      SELECT term, COUNT(*) AS tf FROM (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
      ) WHERE term <> '' GROUP BY term
    ),
    ranked AS (
      SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS DOUBLE)) AS x,
             LN(CAST(tf AS DOUBLE)) AS y
      FROM tf
    ),
    s AS (
      SELECT COUNT(*) AS n,
             {o_fsum("x", "sx", "1000000000.0")},
             {o_fsum("y", "sy", "1000000000.0")},
             {o_fsum("x * x", "sxx", "1000000000.0")},
             {o_fsum("x * y", "sxy", "1000000000.0")}
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9)
             AS zipf_intercept
    FROM s
    """,
)
def q8r_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import fsum
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # term rank over the VOCABULARY — Heaps-sublinear but still
    # data-derived (10^8+ terms at corpus scale), so the rank comes
    # from ordering.global_rank (bucket-keyed two-pass), never a
    # single-reducer global window.
    ranked = global_rank(tf, [("tf", "desc"), "term"], rank_col="_rk").select(
        F.log(F.col("_rk").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        fsum(F.col("x"), "sx", scale=1e9),
        fsum(F.col("y"), "sy", scale=1e9),
        fsum(F.col("x") * F.col("x"), "sxx", scale=1e9),
        fsum(F.col("x") * F.col("y"), "sxy", scale=1e9),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 9).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias(
            "zipf_intercept"
        ),
    )


# --------------------------------------------------------------------------
# q8u — per-document PERPLEXITY under an add-one-smoothed word-bigram
# LM trained on the corpus itself: the CCNet-style quality filter
# (docs whose text the corpus LM finds surprising score high and get
# dropped). Distinct from q8c, which measures the fraction of KNOWN
# character trigrams — this is the actual log-probability score.
#
# Shape: ONE posexplode → lag gives the bigram stream; the model's
# c(prev,w) and c(prev) come from windows OVER THE SAME bigram rows
# (the q81 explode-once pattern — no model join, no second corpus
# pass); vocabulary size is a 1-row broadcast. Per-doc Σ ln p runs
# through the scaled-long exact sum; the final EXP is a correctly-
# rounded-class libm call rounded to 6 dp (the q71 precedent).
# --------------------------------------------------------------------------


@query(
    "q8u_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, i, w FROM (
        SELECT doc_id,
               GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS i,
               UNNEST(STRING_SPLIT(text, ' ')) AS w
        FROM documents
      ) WHERE w <> ''
    ),
    bg AS (
      SELECT doc_id, w,
             LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM toks
    ),
    v AS (SELECT COUNT(DISTINCT w) AS vocab FROM toks),
    scored AS (
      SELECT doc_id,
             LN((COUNT(*) OVER (PARTITION BY prev, w) + 1.0)
                / (COUNT(*) OVER (PARTITION BY prev) + vocab)) AS logp
      FROM bg CROSS JOIN v
      WHERE prev IS NOT NULL
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(EXP(-(CAST(SUM(CAST(FLOOR(logp * 1000000000.0) AS HUGEINT))
                            AS DOUBLE) / 1000000000.0) / COUNT(*)), 6)
             AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def q8u_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import fsum

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    ).filter(F.col("w") != "")
    wdoc = Window.partitionBy("doc_id").orderBy("i")
    bg = toks.select(
        "doc_id", "w", F.lag("w").over(wdoc).alias("prev")
    ).filter(F.col("prev").isNotNull())
    v = toks.agg(F.countDistinct("w").alias("vocab"))
    c2 = F.count(F.lit(1)).over(Window.partitionBy("prev", "w"))
    c1 = F.count(F.lit(1)).over(Window.partitionBy("prev"))
    scored = bg.crossJoin(F.broadcast(v)).select(
        "doc_id",
        F.log((c2 + F.lit(1.0)) / (c1 + F.col("vocab"))).alias("logp"),
    )
    s = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        fsum(F.col("logp"), "s", scale=1e9),
    )
    return s.select(
        "doc_id",
        "n_bigrams",
        F.round(F.exp(-F.col("s") / F.col("n_bigrams")), 6).alias("ppl"),
    )


# --------------------------------------------------------------------------
# q5p — prefix-filtered exact Jaccard join (AllPairs/PPJoin family):
# the SCALE PATH for q86's exact set-similarity join. Candidates come
# only from joining per-doc PREFIXES under a rarest-shingle-first
# global order (the prefix-filter theorem guarantees no false
# negatives at J ≥ t), and the verify is an array_intersect over the
# candidate pair's shingle arrays — per-candidate work instead of the
# corpus-wide token join. The oracle is the plain exact pair set, so
# a hash match PROVES the filter loses nothing.
# --------------------------------------------------------------------------

_PPJ_THRESHOLD = 0.5


@query(
    "q5p_prefix_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
      WHERE doc_id < {_JACCARD_MAX_DOC}
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(w) - 2, 0))) AS g(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.n_common)
          >= {_PPJ_THRESHOLD}
    """,
)
def q5p_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.dedup import prefix_filter_jaccard_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _JACCARD_MAX_DOC)
    return prefix_filter_jaccard_pairs(
        d, id_col="doc_id", text_col="text", n=3, threshold=_PPJ_THRESHOLD
    )


# --------------------------------------------------------------------------
# q6n — dataset card: the one-row corpus summary a release ships with
# (HuggingFace dataset-card numbers): doc/token/vocab counts, language
# spread (top language + share + entropy), mean doc length. One
# explode pass feeds token+vocab counts; doc and language stats are
# dimension-sized aggregates; everything meets in 1-row broadcast
# combines. The language entropy runs through the scaled-long sum
# (|langs| addends — tiny, but the hash contract is uniform).
# --------------------------------------------------------------------------


@query(
    "q6n_dataset_card",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ), tok_stats AS (
      SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_vocab
      FROM toks WHERE w <> ''
    ), doc_stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
    ), langs AS (
      SELECT lang, COUNT(*) AS n_i FROM documents GROUP BY lang
    ), lang_stats AS (
      SELECT COUNT(*) AS n_langs,
             {o_fsum("-(CAST(n_i AS DOUBLE) / (SELECT n_docs FROM doc_stats)) * LN(CAST(n_i AS DOUBLE) / (SELECT n_docs FROM doc_stats))", "lang_entropy", "1000000000.0")}
      FROM langs
    ), top_lang AS (
      SELECT lang AS top_lang, n_i AS top_n
      FROM langs ORDER BY n_i DESC, lang LIMIT 1
    )
    SELECT d.n_docs, t.n_tokens, t.n_vocab, d.total_chars,
           l.n_langs, tl.top_lang,
           ROUND(CAST(tl.top_n AS DOUBLE) / d.n_docs, 9) AS top_lang_frac,
           ROUND(l.lang_entropy, 9) AS lang_entropy,
           ROUND(CAST(t.n_tokens AS DOUBLE) / d.n_docs, 9) AS mean_doc_tokens
    FROM doc_stats d CROSS JOIN tok_stats t
    CROSS JOIN lang_stats l CROSS JOIN top_lang tl
    """,
)
def q6n_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import fsum

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    tok_stats = toks.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_vocab"),
    )
    doc_stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_i"))
    p = F.col("n_i").cast("double") / F.col("n_docs")
    lang_stats = (
        langs.crossJoin(F.broadcast(doc_stats.select("n_docs")))
        .select((-p * F.log(p)).alias("h"))
        .agg(F.count(F.lit(1)).alias("n_langs"), fsum(F.col("h"), "lang_entropy", scale=1e9))
    )
    top_lang = (
        langs.orderBy(F.col("n_i").desc(), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("n_i").alias("top_n"))
    )
    return (
        doc_stats.crossJoin(F.broadcast(tok_stats))
        .crossJoin(F.broadcast(lang_stats))
        .crossJoin(F.broadcast(top_lang))
        .select(
            "n_docs",
            "n_tokens",
            "n_vocab",
            "total_chars",
            "n_langs",
            "top_lang",
            F.round(F.col("top_n").cast("double") / F.col("n_docs"), 9).alias(
                "top_lang_frac"
            ),
            F.round("lang_entropy", 9).alias("lang_entropy"),
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 9
            ).alias("mean_doc_tokens"),
        )
    )


# --------------------------------------------------------------------------
# q8w — PMI collocation mining: pointwise mutual information over
# adjacent-token bigrams, the classic collocation statistic
# (Church & Hanks 1990). Bigrams come from a pure-expression
# transform over the token array (no per-doc shuffle); unigram and
# bigram counts are exact integers; PMI's log argument is a ratio of
# exact-integer products evaluated in the same association on both
# engines, and the output PMI is rounded to 6 dp (libm-vs-libm last
# ulp discipline). The ranking key is (count, bigram) — integers and
# strings only, so the top-20 set never depends on float order.
# Scale: explode→count with map-side partials; the unigram join
# sides are vocabulary-bounded broadcasts; totals are 1-row
# broadcasts. TakeOrderedAndProject handles the top-20.
# --------------------------------------------------------------------------


@query(
    "q8w_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS i
      FROM documents
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    nu AS (SELECT COUNT(*) AS n_uni FROM toks),
    bg AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS cxy
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      GROUP BY a.w, b.w
    ),
    nb AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n_bg FROM bg)
    SELECT w1 || ' ' || w2 AS bigram,
           cxy,
           ROUND(LN((CAST(cxy AS DOUBLE) * CAST(n_uni AS DOUBLE)
                     * CAST(n_uni AS DOUBLE))
                    / (CAST(n_bg AS DOUBLE) * CAST(u1.c AS DOUBLE)
                       * CAST(u2.c AS DOUBLE))), 6) AS pmi
    FROM bg JOIN uni u1 ON bg.w1 = u1.w
            JOIN uni u2 ON bg.w2 = u2.w, nu, nb
    ORDER BY cxy DESC, bigram LIMIT 20
    """,
)
def q8w_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = toks.agg(F.count(F.lit(1)).alias("n_uni"))
    t = d.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bg = (
        t.select(
            F.expr(
                "explode(transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))) AS p"
            )
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    nb = bg.agg(F.sum("cxy").cast("bigint").alias("n_bg"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (
                F.col("cxy").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
            )
            / (
                F.col("n_bg").cast("double")
                * F.col("c1").cast("double")
                * F.col("c2").cast("double")
            )
        ),
        6,
    )
    return (
        bg.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .select(
            F.concat(F.col("w1"), F.lit(" "), F.col("w2")).alias("bigram"),
            "cxy",
            pmi.alias("pmi"),
        )
        .orderBy(F.col("cxy").desc(), "bigram")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q8z — Heaps'-law fit (vocabulary growth V = K·N^β), the companion
# corpus statistic to the Zipf fit (q8r): split the corpus into 10
# doc-id deciles, compute cumulative token count N_k and cumulative
# vocabulary V_k (terms by FIRST-occurrence decile — a min-aggregate,
# not a re-scan per prefix), then fit β by OLS on (ln N_k, ln V_k)
# with scaled-long sums. Every count is an exact integer; the ln
# chain is identical on both engines; β rounds to 6 dp.
# Scale: one explode pass; first-occurrence is a per-term MIN; the
# fit runs over 10 rows.
# --------------------------------------------------------------------------


@query(
    "q8z_heaps_law",
    oracle="""
    WITH t AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ),
    dmax AS (SELECT MAX(doc_id) + 1 AS md FROM documents),
    tk AS (
      SELECT CAST(doc_id * 10 // md AS INTEGER) AS dec_, w FROM t, dmax
    ),
    toks AS (SELECT dec_, COUNT(*) AS nt FROM tk GROUP BY dec_),
    first_occ AS (SELECT w, MIN(dec_) AS fd FROM tk GROUP BY w),
    vocab AS (SELECT fd AS dec_, COUNT(*) AS nv FROM first_occ GROUP BY fd),
    cum AS (
      SELECT t1.dec_,
             SUM(t2.nt) AS cum_tokens,
             (SELECT SUM(nv) FROM vocab v WHERE v.dec_ <= t1.dec_) AS cum_vocab
      FROM toks t1 JOIN toks t2 ON t2.dec_ <= t1.dec_
      GROUP BY t1.dec_
    ),
    pts AS (
      SELECT LN(CAST(cum_tokens AS DOUBLE)) AS x,
             LN(CAST(cum_vocab AS DOUBLE)) AS y
      FROM cum
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(FLOOR(x * 1000000000.0 + 0.5) AS BIGINT)) AS sx,
             SUM(CAST(FLOOR(y * 1000000000.0 + 0.5) AS BIGINT)) AS sy,
             SUM(CAST(FLOOR(x * y * 1000000000.0 + 0.5) AS BIGINT)) AS sxy,
             SUM(CAST(FLOOR(x * x * 1000000000.0 + 0.5) AS BIGINT)) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1000000000.0)
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1000000000.0),
                 6) AS heaps_beta
    FROM s
    """,
)
def q8z_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    md = d.agg((F.max("doc_id") + 1).alias("md"))
    tk = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .join(F.broadcast(md))
        .select(F.expr("cast(doc_id * 10 div md as int)").alias("dec_"), "w")
    )
    toks = tk.groupBy("dec_").agg(F.count(F.lit(1)).alias("nt"))
    vocab = (
        tk.groupBy("w")
        .agg(F.min("dec_").alias("fd"))
        .groupBy(F.col("fd").alias("dec_"))
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    w_cum = Window.orderBy("dec_").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        toks.join(vocab, "dec_", "outer")
        .select(
            "dec_",
            F.sum(F.coalesce("nt", F.lit(0))).over(w_cum).alias("cum_tokens"),
            F.sum(F.coalesce("nv", F.lit(0))).over(w_cum).alias("cum_vocab"),
        )
    )
    x = F.log(F.col("cum_tokens").cast("double"))
    y = F.log(F.col("cum_vocab").cast("double"))
    sc = lambda c: F.sum(  # noqa: E731
        F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("long")
    )
    s = cum.agg(
        F.count(F.lit(1)).alias("n"),
        sc(x).alias("sx"),
        sc(y).alias("sy"),
        sc(x * y).alias("sxy"),
        sc(x * x).alias("sxx"),
    )
    beta = F.round(
        (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double") / F.lit(1e9)
        )
        / (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double") / F.lit(1e9)
        ),
        6,
    )
    return s.select(F.col("n").cast("bigint").alias("n_points"), beta.alias("heaps_beta"))


# --------------------------------------------------------------------------
# q5u — end-to-end multinomial Naive Bayes language classifier:
# TRAIN (doc_id % 5 != 0) → per-lang priors and add-one word
# likelihoods → PREDICT the held-out split → EVALUATE accuracy, all
# as ONE lazy plan. Every log term is floor-scaled to BIGINT from an
# identical ln chain, so per-(doc, lang) scores are exact integers
# and the argmax (score DESC, lang ASC) can never flip engines.
# Add-one smoothing makes unseen-word terms ln(1) = 0, so the
# missing-join case is an exact COALESCE(0), not an approximation.
# Scale: model tables are vocabulary- and class-bounded broadcasts;
# the eval side explodes once and joins at token granularity —
# the standard distributed NB scoring topology.
# Fixture note: the synthetic corpus shares one vocabulary across
# langs, so absolute accuracy (~0.42 at sf0.01, vs a 0.44
# majority-class baseline) reflects the DATA's separability, not the
# estimator; the verified artifact is the exact train/predict/eval
# pipeline parity.
# --------------------------------------------------------------------------


@query(
    "q5u_naive_bayes",
    oracle="""
    WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    ev AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    ttoks AS (
      SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM train
    ),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM ttoks),
    tl AS (SELECT lang, COUNT(*) AS t FROM ttoks GROUP BY lang),
    priors AS (
      SELECT lang, COUNT(*) AS dl,
             (SELECT COUNT(*) FROM train) AS dt
      FROM train GROUP BY lang
    ),
    langstats AS (
      SELECT p.lang,
             CAST(FLOOR(LN(CAST(p.dl AS DOUBLE) / CAST(p.dt AS DOUBLE))
                        * 1000000000.0 + 0.5) AS BIGINT) AS lnprior_s,
             CAST(FLOOR(LN(CAST(tl.t + v.v AS DOUBLE))
                        * 1000000000.0 + 0.5) AS BIGINT) AS lntv_s
      FROM priors p JOIN tl ON p.lang = tl.lang, v
    ),
    wl AS (
      SELECT w, lang,
             CAST(FLOOR(LN(CAST(COUNT(*) + 1 AS DOUBLE))
                        * 1000000000.0 + 0.5) AS BIGINT) AS lnc1_s
      FROM ttoks GROUP BY w, lang
    ),
    etoks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM ev
    ),
    scored AS (
      SELECT e.doc_id, ls.lang,
             ls.lnprior_s
               + SUM(COALESCE(wl.lnc1_s, 0))
               - COUNT(*) * ls.lntv_s AS score_s
      FROM etoks e CROSS JOIN langstats ls
      LEFT JOIN wl ON wl.w = e.w AND wl.lang = ls.lang
      GROUP BY e.doc_id, ls.lang, ls.lnprior_s, ls.lntv_s
    ),
    pred AS (
      SELECT doc_id, lang AS predicted FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_s DESC, lang) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT COUNT(*) AS n_eval,
           CAST(SUM(CASE WHEN p.predicted = ev.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN p.predicted = ev.lang THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy
    FROM pred p JOIN ev ON p.doc_id = ev.doc_id
    """,
)
def q5u_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    ev = d.filter(F.col("doc_id") % 5 == 0)
    sc9 = lambda c: F.floor(F.log(c) * F.lit(1e9) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    ttoks = train.select("lang", F.explode(F.split("text", " ")).alias("w"))
    v = ttoks.agg(F.count_distinct("w").alias("v"))
    tl = ttoks.groupBy("lang").agg(F.count(F.lit(1)).alias("t"))
    priors = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("dl"))
        .join(F.broadcast(train.agg(F.count(F.lit(1)).alias("dt"))))
    )
    langstats = (
        priors.join(tl, "lang")
        .join(F.broadcast(v))
        .select(
            "lang",
            sc9(F.col("dl").cast("double") / F.col("dt").cast("double")).alias(
                "lnprior_s"
            ),
            sc9((F.col("t") + F.col("v")).cast("double")).alias("lntv_s"),
        )
    )
    wl = (
        ttoks.groupBy("w", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("w").alias("m_w"),
            F.col("lang").alias("m_lang"),
            sc9((F.col("c") + 1).cast("double")).alias("lnc1_s"),
        )
    )
    etoks = ev.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    scored = (
        etoks.crossJoin(F.broadcast(langstats))
        .join(
            F.broadcast(wl),
            (F.col("w") == F.col("m_w")) & (F.col("lang") == F.col("m_lang")),
            "left",
        )
        .groupBy("doc_id", "lang", "lnprior_s", "lntv_s")
        .agg(
            (
                F.col("lnprior_s")
                + F.sum(F.coalesce("lnc1_s", F.lit(0)))
                - F.count(F.lit(1)) * F.col("lntv_s")
            ).alias("score_s")
        )
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("score_s").desc(), F.col("lang")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted"))
    )
    return (
        pred.join(ev.select("doc_id", "lang"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            (
                F.sum(
                    F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("accuracy"),
        )
    )


# --------------------------------------------------------------------------
# q5z — reciprocal-rank fusion (RRF) of two retrieval rankings: the
# standard way a search stack merges lexical and secondary rankings
# (RRF(d) = Σ_q 1/(k + rank_q(d)), k=60). Each query term's candidate
# list is cut to a bounded top-N by (tf DESC, doc_id) BEFORE ranking,
# so the fused table is |queries|·N rows — broadcastable — and the
# full-outer fuse plus final top-20 never touch the corpus again.
# The fused score is a fixed-order two-term expression on exact
# integer ranks (no reduction), identical on both engines.
# --------------------------------------------------------------------------

_RRF_TERMS = ("hash", "join")
_RRF_K = 60
_RRF_TOPN = 100


@query(
    "q5z_rrf_fusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term IN ('{_RRF_TERMS[0]}', '{_RRF_TERMS[1]}')
      GROUP BY doc_id, term
    ),
    ranked AS (
      SELECT doc_id, term,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r
      FROM tf
    ),
    topn AS (SELECT * FROM ranked WHERE r <= {_RRF_TOPN}),
    a AS (SELECT doc_id, r FROM topn WHERE term = '{_RRF_TERMS[0]}'),
    b AS (SELECT doc_id, r FROM topn WHERE term = '{_RRF_TERMS[1]}'),
    fused AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CAST(a.r AS BIGINT) AS rank_a,
             CAST(b.r AS BIGINT) AS rank_b,
             COALESCE(1.0 / ({_RRF_K} + a.r), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + b.r), 0.0) AS rrf
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rank_a, rank_b, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def q5z_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(*_RRF_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), "doc_id")
    topn = tf.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _RRF_TOPN
    )
    a = topn.filter(F.col("term") == _RRF_TERMS[0]).select(
        F.col("doc_id").alias("da"), F.col("r").alias("ra")
    )
    b = topn.filter(F.col("term") == _RRF_TERMS[1]).select(
        F.col("doc_id").alias("db"), F.col("r").alias("rb")
    )
    fused = a.join(b, F.col("da") == F.col("db"), "full_outer").select(
        F.coalesce("da", "db").alias("doc_id"),
        F.col("ra").cast("bigint").alias("rank_a"),
        F.col("rb").cast("bigint").alias("rank_b"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("ra")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)


# --------------------------------------------------------------------------
# q6w — intra-document repetition filter (the Gopher/Dolma repetition
# rules the length/stopword gates in q83 do NOT cover): per doc, the
# mass of the most frequent bigram and the total mass of duplicated
# bigrams, as fractions of all bigrams. Highly repetitive docs
# (boilerplate, keyword stuffing, generation loops) fail the gate.
# Shape: bigrams are built JVM-side as zip_with(slice, slice) — no
# UDF, no explode of anything bigger than the token stream — then two
# doc-keyed aggregations (combine-friendly, doc_id is a wide key, so
# nothing serializes at corpus scale). Pass flags are PURE INTEGER
# comparisons (100·max_c ≤ 8·n etc.), so no float boundary can flip
# between engines; the reported fractions are single exact-int
# divisions, IEEE-identical cross-engine.
# --------------------------------------------------------------------------


@query(
    "q6w_repetition_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks, UNNEST(RANGE(1, LENGTH(toks))) AS g FROM t
    ),
    bg AS (
      SELECT doc_id, toks[g] || ' ' || toks[g+1] AS bg FROM idx
    ),
    c AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
             AS dup_bigram_frac,
           CASE WHEN 100 * MAX(c) <= 8 * SUM(c)
                 AND 10 * SUM(CASE WHEN c > 1 THEN c ELSE 0 END) <= SUM(c)
                THEN 1 ELSE 0 END AS repetition_pass
    FROM c GROUP BY doc_id
    """,
)
def q6w_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("bg"))
    c = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    dup_mass = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
    return c.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac"),
        (dup_mass.cast("double") / F.sum("c")).alias("dup_bigram_frac"),
        F.when(
            (F.lit(100) * F.max("c") <= F.lit(8) * F.sum("c"))
            & (F.lit(10) * dup_mass <= F.sum("c")),
            1,
        )
        .otherwise(0)
        .alias("repetition_pass"),
    )


# --------------------------------------------------------------------------
# q6y — lexical diversity profile: type-token ratio, Gini-Simpson
# diversity 1 − Σc²/n², and hapax fraction per doc. The
# log-free counterpart of unigram entropy — Σc² is an exact BIGINT,
# so unlike a Shannon-entropy Σ c·ln c (order-dependent float sum +
# libm parity risk, see the q5v caveat) every reported value is a
# single division of exact integers, bit-identical across engines
# and partitionings. Same scale shape as q6w: explode → two
# doc-keyed combine-friendly aggregations.
# --------------------------------------------------------------------------


@query(
    "q6y_lexical_diversity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    c AS (
      SELECT doc_id, term, COUNT(*) AS c FROM toks WHERE term <> ''
      GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS DOUBLE) / SUM(c) AS type_token_ratio,
           1.0 - CAST(SUM(c * c) AS DOUBLE) / (SUM(c) * SUM(c)) AS simpson,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS hapax_frac
    FROM c GROUP BY doc_id
    """,
)
def q6y_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    c = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    return c.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("type_token_ratio"),
        (
            F.lit(1.0)
            - F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c") * F.sum("c"))
        ).alias("simpson"),
        (
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("hapax_frac"),
    )


# --------------------------------------------------------------------------
# q1u — sparse cosine similarity JOIN via inverted index: the IR-side
# counterpart of q91's dense-embedding cosine. Documents as sparse
# integer TF vectors; candidate pairs come ONLY from co-occurrence in
# a posting list (join on term), with a df ≤ 50 cap pruning
# stop-terms — the standard index-pruning lever that bounds every
# posting's pair fanout to C(df,2) and keeps the join linear in the
# index size, never |docs|². All dot products and norms are exact
# BIGINT sums of integer tf products (no transcendental weighting in
# the join path — q81 proves the idf scalar separately), so the final
# cosine is one correctly-rounded double expression, identical across
# engines. Top-50 pairs by (cosine DESC, doc_a, doc_b).
# --------------------------------------------------------------------------


@query(
    "q1u_sparse_cosine_join",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), kept AS (
      SELECT tf.doc_id, tf.term, tf.tf
      FROM tf JOIN (
        SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= 50
      ) rare USING (term)
    ), norms AS (
      SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
      FROM kept GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
      FROM kept a JOIN kept b
        ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT da AS doc_a, db AS doc_b,
           ROUND(CAST(dot AS DOUBLE)
                 / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))),
                 9) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = da
    JOIN norms nb ON nb.doc_id = db
    ORDER BY cosine DESC, doc_a, doc_b
    LIMIT 50
    """,
)
def q1u_sparse_cosine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    rare = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") <= 50
    )
    kept = tf.join(rare.select("term"), "term")
    norms = kept.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    a, b = kept.alias("a"), kept.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("n2").alias("n2b"))
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2a").cast("double"))
                    * F.sqrt(F.col("n2b").cast("double"))
                ),
                9,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(50)
    )
