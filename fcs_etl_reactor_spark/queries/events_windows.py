"""Batch twins of the streaming windowed operators (SURVEY.md §2.10).

Each Structured Streaming op in fcs_etl_reactor_spark.streaming has a
batch-equivalent here using the SAME window arithmetic, so the oracle
can verify the windowing math (the streaming forms themselves get
memory-sink tests — no SQL oracle exists for incremental execution).

Time-bucket arithmetic is done in epoch seconds (floor(epoch/width)*width)
in the oracle so there is no reliance on engine-specific bucket-origin
conventions; Spark's window() aligns to the Unix epoch, which the
explicit arithmetic reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import dsum, o_dsum
from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q95 — tumbling window (T1 twin): events per 10-minute bucket per type.
# --------------------------------------------------------------------------


@query(
    "q95_tumbling_window",
    # MAKE_TIMESTAMP(µs), not TO_TIMESTAMP: DuckDB's TO_TIMESTAMP
    # returns TIMESTAMPTZ, which fails the driver's type-strict schema
    # check against Spark's (naive, UTC-session) TimestampType — and
    # casting TIMESTAMPTZ→TIMESTAMP would shift by the oracle's session
    # tz. MAKE_TIMESTAMP is naive and tz-independent.
    oracle=f"""
    SELECT
      MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600000000 AS BIGINT)) AS win_start,
      event_type,
      COUNT(*) AS n,
      {o_dsum("value", "sum_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def q95_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )


# --------------------------------------------------------------------------
# q96 — sliding window (T2 twin): 10-minute window sliding every 5.
# Every event lands in exactly two windows: starts floor5(ts) and
# floor5(ts) − 5 min — the oracle materializes both assignments.
# --------------------------------------------------------------------------


@query(
    "q96_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 300) * 300000000 AS BIGINT))
               AS win_start, event_type
      FROM events
      UNION ALL
      SELECT MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 300) * 300000000
                                 - 300000000 AS BIGINT)),
             event_type
      FROM events
    )
    SELECT win_start, event_type, COUNT(*) AS n
    FROM assigned
    GROUP BY win_start, event_type
    """,
)
def q96_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


# --------------------------------------------------------------------------
# q97 — sessionization (T3 twin): 30-minute-gap sessions per user via
# lag → gap flag → running sum (the window-function sessionizer). The
# streaming twin uses session_window(ts, '30 minutes'); session bounds
# agree because both define a session break as gap > 30 min.
# --------------------------------------------------------------------------


@query(
    "q97_sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           {o_dsum("value", "session_value")}
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q97_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "ts", "value", F.sum("new_sess").over(w2).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "session_value"),
    )


# --------------------------------------------------------------------------
# q98 — TRUE Structured Streaming execution inside the harness
# (T1+T4+T8, rows-only): events replayed through readStream →
# watermarked tumbling aggregation → availableNow trigger → memory
# sink; the returned DataFrame reads the sink table. COMPLETE output
# mode: append would (correctly) withhold windows the final watermark
# hasn't closed — the trailing hour — but this entry wants the full,
# reproducible result, which equals q95's batch twin counts.
# --------------------------------------------------------------------------

_STREAM_DIRS: dict[str, str] = {}


def _events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """The file-stream source needs a DIRECTORY of micros-timestamp
    parquet; materialize the converted events table once per sf_dir
    (same ingest-copy pattern as the io layout cache). The cache key
    includes the source file's (mtime, size) so regenerated fixtures
    never serve a stale copy (the round-2 fixture-drift lesson)."""
    import os

    from fcs_etl_reactor_spark.io import source_fingerprint

    key = sf_dir.rstrip("/")
    if key not in _STREAM_DIRS:
        dest = os.path.join(
            "/tmp/spark_graft_stream_src",
            key.strip("/").replace("/", "_")
            + "_"
            + source_fingerprint(sf_dir, "events"),
        )
        if not os.path.exists(os.path.join(dest, "_SUCCESS")):
            # ONE file ⇒ availableNow runs exactly one micro-batch ⇒ the
            # watermark (initialized to -inf) drops nothing and the
            # result equals the batch twin; with several files the
            # per-batch watermark advance makes late-file rows
            # legitimately droppable — correct semantics, but not the
            # reproducible full-result this harness entry wants.
            # pid-tmp + atomic rename (the io.py/storage.py pattern):
            # a concurrent process must observe the spool
            # complete-or-absent, never mid-write
            tmp = f"{dest}.build.{os.getpid()}"
            load(spark, sf_dir, "events").repartition(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            try:
                os.rename(tmp, dest)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
            assert os.path.exists(os.path.join(dest, "_SUCCESS")), dest
        _STREAM_DIRS[key] = dest
    return _STREAM_DIRS[key]


@query(
    "q98_streaming_tumbling",
    # the stream replays the full events table in ONE availableNow
    # micro-batch with COMPLETE output, so its result is exactly the
    # batch tumbling aggregation — which SQL can state directly. This
    # turns "the streaming engine ran" from a rows-only check into a
    # value-hash check of the stateful operator's output.
    oracle="""
    SELECT
      MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600000000 AS BIGINT)) AS win_start,
      event_type,
      COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q98_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
        tumbling_counts,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q98_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    stream = read_events_stream(spark, src)
    q = to_memory_sink(tumbling_counts(stream), sink, output_mode="complete")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q99 — session windows executed as a TRUE stream (T3+T8): the
# session_window state operator over the replayed events directory,
# complete mode (same availableNow/memory-sink shape as q98). The
# oracle restates session_window's semantics as gaps-and-islands SQL:
# a session breaks when the gap is ≥ 30 min (session_window merges on
# strict overlap), start = MIN(ts), end = MAX(ts) + gap.
# --------------------------------------------------------------------------


@query(
    "q99_streaming_sessions",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {o_dsum("value", "session_value")}
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q99_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        session_aggregate,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q99_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    stream = read_events_stream(spark, src)
    q = to_memory_sink(session_aggregate(stream, gap="30 minutes"), sink, "complete")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q3a — conversion funnel (product-analytics staple): users whose
# first click precedes a later purchase; per-user stage timestamps +
# conversion lag. Expressed as conditional MIN aggregates — one
# hash aggregation, no self-join.
# --------------------------------------------------------------------------


@query(
    "q3a_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, first_click, first_purchase,
           EPOCH_US(first_purchase) - EPOCH_US(first_click) AS lag_micros
    FROM stages
    WHERE first_click IS NOT NULL
      AND first_purchase IS NOT NULL
      AND first_purchase > first_click
    """,
)
def q3a_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return stages.filter(
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_click"))
    ).select(
        "user_id",
        "first_click",
        "first_purchase",
        (F.unix_micros("first_purchase") - F.unix_micros("first_click")).alias(
            "lag_micros"
        ),
    )


# --------------------------------------------------------------------------
# q3b — retention cohort matrix: users cohorted by the week of their
# first event; each (cohort, week-offset) cell counts distinct users
# still active that week and their share of the cohort. The classic
# product-analytics rollup, and a two-level distinct-aggregation
# exercise (first-touch min, then per-cell countDistinct).
#
# Scale: both groupBys key on user_id first, so the second reuses the
# first's partitioning; the cohort-sizes frame is bounded by the
# number of calendar weeks — broadcast side by construction.
# --------------------------------------------------------------------------


@query(
    "q3b_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS DATE) AS w
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(w) AS cohort_week FROM wk GROUP BY user_id
    ), sizes AS (
      SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_week
    ), cells AS (
      SELECT f.cohort_week,
             CAST(DATE_DIFF('day', f.cohort_week, a.w) / 7 AS INTEGER)
               AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM wk a JOIN firsts f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT c.cohort_week, c.week_offset, c.n_active, s.n_cohort,
           ROUND(CAST(c.n_active AS DOUBLE) / s.n_cohort, 9) AS retention
    FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
    """,
)
def q3b_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    firsts = wk.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    cells = (
        wk.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active").cast("double") / F.col("n_cohort"), 9).alias(
            "retention"
        ),
    )


# --------------------------------------------------------------------------
# q4d — time-bucket gap-fill + LOCF (the hypertable "gapfill"
# continuous-aggregate shape): hourly buckets per event_type, a dense
# bucket grid spanning [min, max] per key, missing buckets filled with
# n=0 and last-observation-carried-forward value. The grid is
# sequence+explode (rows ∝ key_cardinality × hours — metadata-sized
# next to the fact table); LOCF is one ordered window per key, no
# self-join. Exact davg arithmetic keeps the carried values
# hash-identical to the SQL twin.
# --------------------------------------------------------------------------


@query(
    "q4d_gapfill",
    oracle="""
    WITH b AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS bucket,
             COUNT(*) AS n_obs,
             (CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
              / 1000000.0) / COUNT(value) AS avg_value
      FROM events GROUP BY 1, 2
    ), ext AS (
      SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM ext
    )
    SELECT g.event_type, g.bucket,
           COALESCE(b.n_obs, 0) AS n_obs,
           ROUND(LAST_VALUE(b.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9) AS value_locf
    FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.bucket = b.bucket
    """,
)
def q4d_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import davg

    e = load(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_obs"), davg("value", "avg_value"))
    grid = (
        b.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(b, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.round(F.last("avg_value", ignorenulls=True).over(w), 9).alias("value_locf"),
    )


# --------------------------------------------------------------------------
# q41 — lag/lead offsets (W2): inter-event gap per user — the classic
# sessionization primitive.
# --------------------------------------------------------------------------


@query(
    "q41_event_gaps",
    oracle="""
    SELECT
      user_id, event_id, ts,
      LAG(event_id) OVER w AS prev_event_id,
      EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS gap_micros,
      LEAD(event_type) OVER w AS next_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q41_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_micros"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


# --------------------------------------------------------------------------
# q3c — windowed rate anomaly detection (ops analytics): per-type
# 10-minute event counts, each compared to the mean/stddev of the SIX
# preceding windows (ROWS frame); |z| > 3 flags the anomaly. The
# trailing stats are exact integer sums (counts), so z-scores are
# bit-identical across engines; windows with an undefined baseline
# (fewer than 2 predecessors or zero variance) report z = NULL and
# never flag. One shuffle (the bucket agg) + one ordered window per
# key — the streaming twin would be the same arithmetic under a
# watermark.
# --------------------------------------------------------------------------


@query(
    "q3c_rate_anomaly",
    oracle="""
    WITH w AS (
      SELECT event_type,
             MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600000000 AS BIGINT))
               AS win_start,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, win_start, n,
             COUNT(*) OVER f AS n_base,
             SUM(n) OVER f AS base_sum,
             SUM(n * n) OVER f AS base_sum2
      FROM w
      WINDOW f AS (PARTITION BY event_type ORDER BY win_start
                   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, win_start, n,
           CAST(n_base AS BIGINT) AS n_base,
           ROUND(CASE WHEN n_base >= 2
                       AND n_base * base_sum2 > base_sum * base_sum
                 THEN (n - CAST(base_sum AS DOUBLE) / n_base)
                      / SQRT((base_sum2 - CAST(base_sum AS DOUBLE) * base_sum / n_base)
                             / (n_base - 1))
                 END, 9) AS z,
           COALESCE(ABS(CASE WHEN n_base >= 2
                              AND n_base * base_sum2 > base_sum * base_sum
                        THEN (n - CAST(base_sum AS DOUBLE) / n_base)
                             / SQRT((base_sum2 - CAST(base_sum AS DOUBLE) * base_sum / n_base)
                                    / (n_base - 1))
                        END) > 3, FALSE) AS is_anomaly
    FROM s
    """,
)
def q3c_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.unix_timestamp("ts") / 600).cast("long") * 600
        ).alias("win_start"),
    ).agg(F.count(F.lit(1)).alias("n"))
    f = (
        Window.partitionBy("event_type")
        .orderBy("win_start")
        .rowsBetween(-6, -1)
    )
    n_base = F.count(F.lit(1)).over(f)
    base_sum = F.sum("n").over(f)
    base_sum2 = F.sum(F.col("n") * F.col("n")).over(f)
    defined = (n_base >= 2) & (n_base * base_sum2 > base_sum * base_sum)
    z = F.when(
        defined,
        (F.col("n") - base_sum.cast("double") / n_base)
        / F.sqrt(
            (base_sum2 - base_sum.cast("double") * base_sum / n_base) / (n_base - 1)
        ),
    )
    return w.select(
        "event_type",
        "win_start",
        "n",
        n_base.alias("n_base"),
        F.round(z, 9).alias("z"),
        F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# q4f — gap-fill with LINEAR INTERPOLATION (q4d's sibling; the other
# hypertable fill mode): missing hourly buckets get the straight-line
# value between the surrounding observations instead of carrying the
# last one forward. Two ordered windows per key (last-non-null before,
# first-non-null after) — still no self-join, grid still
# metadata-sized. The interpolation expression is written identically
# on both engines (bigint micros ratio → double), so the only float
# ops are one divide, one multiply, one add — IEEE-identical,
# ROUND(…, 9) absorbs nothing but representation.
# --------------------------------------------------------------------------


@query(
    "q4f_interpolate",
    oracle="""
    WITH b AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS bucket,
             COUNT(*) AS n_obs,
             (CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
              / 1000000.0) / COUNT(value) AS avg_value
      FROM events GROUP BY 1, 2
    ), ext AS (
      SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM ext
    ), j AS (
      SELECT g.event_type, g.bucket, b.n_obs, b.avg_value,
             LAST_VALUE(b.avg_value IGNORE NULLS) OVER wp AS prev_v,
             LAST_VALUE(CASE WHEN b.avg_value IS NOT NULL THEN g.bucket END
                        IGNORE NULLS) OVER wp AS prev_t,
             FIRST_VALUE(b.avg_value IGNORE NULLS) OVER wn AS next_v,
             FIRST_VALUE(CASE WHEN b.avg_value IS NOT NULL THEN g.bucket END
                         IGNORE NULLS) OVER wn AS next_t
      FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.bucket = b.bucket
      WINDOW
        wp AS (PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
           COALESCE(n_obs, 0) AS n_obs,
           ROUND(CASE
             WHEN avg_value IS NOT NULL THEN avg_value
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * (CAST(EPOCH_US(bucket) - EPOCH_US(prev_t) AS DOUBLE)
                     / CAST(EPOCH_US(next_t) - EPOCH_US(prev_t) AS DOUBLE))
           END, 9) AS value_interp
    FROM j
    """,
)
def q4f_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import davg

    e = load(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_obs"), davg("value", "avg_value"))
    grid = (
        b.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    j = grid.join(b, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        "n_obs",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_bucket, ignorenulls=True).over(wp).alias("prev_t"),
        F.first("avg_value", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_bucket, ignorenulls=True).over(wn).alias("next_t"),
    )
    ratio = (
        F.unix_micros("bucket") - F.unix_micros("prev_t")
    ).cast("double") / (
        F.unix_micros("next_t") - F.unix_micros("prev_t")
    ).cast("double")
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * ratio
        )
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.round(interp, 9).alias("value_interp"),
    )


# --------------------------------------------------------------------------
# q4g — truncated EWMA per user (feature engineering: exponentially
# weighted moving average of the value series, window K=8). The exact
# recursive EWMA y_i = a*x_i + (1-a)*y_{i-1} needs either per-row
# recursion (applyInPandas) or a (1-a)^{-i} rescaling trick that
# overflows doubles beyond a few hundred rows; the production feature
# is the K-truncated form — weights below (1-a)^K are negligible —
# which is a PURE EXPRESSION over K lags: zero Python, one shuffle on
# user_id, and bit-identical across engines because the weight
# literals are emitted by the same Python float repr into both plans
# and the K-term dot product is written in the same association order.
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_K = 8
_EWMA_W = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_K)]


def _ewma_oracle() -> str:
    lags = ",\n             ".join(
        f"LAG(value, {k}) OVER w AS x{k}" for k in range(1, _EWMA_K)
    )
    num = " + ".join(
        f"{w!r} * COALESCE(x{k}, 0.0)" for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"{w!r} * CASE WHEN x{k} IS NULL THEN 0.0 ELSE 1.0 END"
        for k, w in enumerate(_EWMA_W)
    )
    return f"""
    WITH lagged AS (
      SELECT event_id, user_id, value AS x0,
             {lags}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ROUND(({num}) / ({den}), 9) AS ewma
    FROM lagged
    """


@query("q4g_ewma", oracle=_ewma_oracle())
def q4g_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "event_id",
        "user_id",
        F.col("value").alias("x0"),
        *[F.lag("value", k).over(w).alias(f"x{k}") for k in range(1, _EWMA_K)],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    # identical left-to-right association as the oracle text
    for k, wt in enumerate(_EWMA_W):
        num = num + F.lit(wt) * F.coalesce(F.col(f"x{k}"), F.lit(0.0))
        den = den + F.lit(wt) * F.when(F.col(f"x{k}").isNull(), 0.0).otherwise(1.0)
    return lagged.select(
        "event_id", "user_id", F.round(num / den, 9).alias("ewma")
    )


# --------------------------------------------------------------------------
# q3d — debounce: collapse bursts of the same event_type per user,
# keeping an event only if the previous same-user event was a
# different type OR more than 5 minutes older (gap-based debounce —
# the sensor/clickstream de-noising primitive; distinct from q97
# sessionization, which groups rather than drops). One lag pass, one
# shuffle on user_id; the filter is a pure integer comparison on
# unix_micros so the output carries no timestamp column.
# --------------------------------------------------------------------------


@query(
    "q3d_debounce",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(event_type) OVER w AS prev_type,
             LAG(ts) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, event_type
    FROM seq
    WHERE prev_type IS NULL
       OR prev_type <> event_type
       OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 300000000
    """,
)
def q3d_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return seq.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
        | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 300_000_000)
    ).select("event_id", "user_id", "event_type")


# --------------------------------------------------------------------------
# q3e — longest same-type streak per user (gaps-and-islands): the
# run-length analytics primitive (max consecutive purchases, error
# streaks for alerting). lag → change flag → running-sum island id →
# per-island size → per-user max; ALL FOUR window/agg passes share the
# one shuffle on user_id (Catalyst collapses same-key windows), so the
# op costs a single exchange regardless of corpus size.
# --------------------------------------------------------------------------


@query(
    "q3e_longest_streak",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER w = event_type THEN 0 ELSE 1 END
               AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    isl AS (
      SELECT user_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS island
      FROM seq
    ),
    runs AS (
      SELECT user_id, event_type, island, COUNT(*) AS run_len
      FROM isl GROUP BY user_id, event_type, island
    ),
    best AS (
      SELECT user_id, run_len, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY run_len DESC, island, event_type)
               AS rn
      FROM runs
    )
    SELECT user_id, run_len AS longest_streak, event_type AS streak_type
    FROM best WHERE rn = 1
    """,
)
def q3e_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(F.lag("event_type").over(w) == F.col("event_type"), 0)
        .otherwise(1)
        .alias("brk"),
    )
    isl = seq.select(
        "user_id", "event_type", F.sum("brk").over(w).alias("island")
    )
    runs = isl.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("run_len").desc(), "island", "event_type"
    )
    return (
        runs.select(
            "user_id",
            "run_len",
            "event_type",
            F.row_number().over(wb).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("run_len").alias("longest_streak"),
            F.col("event_type").alias("streak_type"),
        )
    )


# --------------------------------------------------------------------------
# q4i — rolling median per user over the trailing 5-row frame: the
# robust-smoothing counterpart of q48's moving average (medians shrug
# off the spikes q3c hunts). Spark has no percentile window function,
# but a SMALL FIXED frame makes the exact median a pure expression:
# collect_list over the frame → array_sort → middle element(s). The
# frame is K=5 values, so the per-row array work is O(K log K) with
# zero extra shuffle — same single user_id exchange as every lag
# query. (An unbounded-frame median is a different op: that's q23's
# sorted-aggregate territory.) Even-count frames (the first rows of
# each user) average the two middles, matching DuckDB's MEDIAN.
# --------------------------------------------------------------------------


@query(
    "q4i_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           ROUND(MEDIAN(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                 9) AS med5
    FROM events
    """,
)
def q4i_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    mid_hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    return e.select(
        "event_id",
        "user_id",
        F.round((mid_lo + mid_hi) / 2.0, 9).alias("med5"),
    )


# --------------------------------------------------------------------------
# q9i — streaming windowed TOP-K: top-3 event types per 10-minute
# tumbling window, executed as a TRUE stream. The split of labor is
# the production shape: the STREAMING stage maintains only the
# bounded per-(window, type) counts (watermarked state, complete
# sink); the RANK is a batch window over the materialized sink —
# ranking is not a streaming-stateful op and never needs to be. The
# oracle restates the whole composite as batch SQL, so the hash
# verifies the streamed counts AND the rank cut together.
# --------------------------------------------------------------------------


@query(
    "q9i_streaming_topk",
    oracle="""
    WITH counts AS (
      SELECT
        MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600000000 AS BIGINT))
          AS win_start,
        event_type,
        COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT win_start, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY win_start
                                ORDER BY n DESC, event_type) AS rk
      FROM counts
    )
    SELECT win_start, event_type, n, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def q9i_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
        tumbling_counts,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q9i_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    stream = read_events_stream(spark, src)
    q = to_memory_sink(tumbling_counts(stream), sink, output_mode="complete")
    q.awaitTermination()
    w = Window.partitionBy("win_start").orderBy(F.col("n").desc(), "event_type")
    return (
        spark.table(sink)
        .select("win_start", "event_type", "n", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# q3f — RFM segmentation: per-user Recency (last event), Frequency
# (event count), Monetary (exact value sum) → quartile codes → one
# segment label per user. The classic engagement-analytics composite:
# one groupBy pass for the three metrics, then NTILE(4) computed the
# DISTRIBUTED way — the user-level table is data-sized (one row per
# user), so instead of global NTILE windows (single reducer ×3) each
# quartile comes from ordering.global_rank + NTILE's closed form over
# (rank, n). Deterministic tie-breaks on user_id. Recency is emitted
# as unix_micros so the output carries no timestamp column
# (OS-tz-proof).
# --------------------------------------------------------------------------


@query(
    "q3f_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             EPOCH_US(MAX(ts)) AS last_us,
             COUNT(*) AS freq,
             {o_dsum("value", "monetary")}
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, last_us, freq, monetary,
             NTILE(4) OVER (ORDER BY last_us DESC, user_id) AS r_q,
             NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
             NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
      FROM base
    )
    SELECT user_id, last_us, freq, monetary,
           CAST(r_q AS INTEGER) AS r_q,
           CAST(f_q AS INTEGER) AS f_q,
           CAST(m_q AS INTEGER) AS m_q,
           CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS rfm_code
    FROM scored
    """,
)
def q3f_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The user-level table is DATA-sized (one row per user — billions
    # at 100 TB), so a global NTILE window would funnel every user
    # through one reducer, three times. Scale path: exact distributed
    # rank via ordering.global_rank (bucket-keyed two-pass, no single
    # reducer), then NTILE(4)'s closed form from (rank, n): with
    # q = n//4, r = n%4, the first r buckets hold q+1 rows —
    #   bucket(rk) = (rk-1)//(q+1) + 1           if rk <= r*(q+1)
    #              = r + (rk - r*(q+1) - 1)//q + 1 otherwise.
    # n attaches as a 1-row broadcast cross. Bit-identical to the
    # oracle's NTILE by construction (exact integer arithmetic).
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    e = load(spark, sf_dir, "events")
    base = e.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("freq"),
        dsum("value", "monetary"),
    )
    ranked = global_rank(base, [("last_us", "desc"), "user_id"], rank_col="_rk_r")
    ranked = global_rank(ranked, [("freq", "desc"), "user_id"], rank_col="_rk_f")
    ranked = global_rank(ranked, [("monetary", "desc"), "user_id"], rank_col="_rk_m")
    n1 = base.agg(F.count(F.lit(1)).alias("_n"))
    # BIGINT `div` (not floor-of-double) keeps the closed form exact
    # at ANY n — float division flips only past ~4e15 rows, but the
    # stated invariant is bit-exactness, so integer arithmetic it is
    # (ADVICE r7; matches the HITS idiom in operators/graphs.py).
    scored = (
        ranked.crossJoin(F.broadcast(n1))
        .withColumn("_q", F.expr("_n div 4"))
        .withColumn("_r", F.col("_n") % 4)
        .withColumn("_head", F.col("_r") * (F.col("_q") + 1))
    )

    def ntile4(rk_name: str) -> F.Column:
        rk = F.col(rk_name)
        # _q==0 makes the otherwise-branch unreachable (_head == _n);
        # greatest(_q,1) keeps its divisor nonzero under ANSI eval
        return (
            F.when(rk <= F.col("_head"), F.expr(f"({rk_name} - 1) div (_q + 1)") + 1)
            .otherwise(
                F.col("_r")
                + F.expr(f"({rk_name} - _head - 1) div greatest(_q, 1)")
                + 1
            )
            .cast("int")
        )

    return scored.select(
        "user_id",
        "last_us",
        "freq",
        "monetary",
        ntile4("_rk_r").alias("r_q"),
        ntile4("_rk_f").alias("f_q"),
        ntile4("_rk_m").alias("m_q"),
    ).select(
        "*",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).alias("rfm_code"),
    )


# --------------------------------------------------------------------------
# q4k — seasonal decomposition of the daily event series (classical
# additive decompose): trend = centered 7-day moving average over the
# daily counts, seasonal index = mean detrended deviation per ISO
# day-of-week. The deviation is kept EXACT by cross-multiplying
# (dev = 7*c - sum7, a BIGINT) — only the final per-dow index divides,
# and both engines divide the same exact integers, so the doubles are
# bit-identical.
# Scale: the groupBy collapses the raw stream to ONE row per day
# before any window — the ordered window runs over a calendar-bounded
# series (|days|, not |events|), so the single-partition window is
# bounded regardless of corpus size; the heavy reduction is the
# map-side partial-aggregated daily count.
# --------------------------------------------------------------------------


@query(
    "q4k_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT day, c,
             SUM(c) OVER w AS s7,
             COUNT(c) OVER w AS n7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT CAST(EXTRACT(ISODOW FROM day) AS INTEGER) AS dow,
           COUNT(*) AS n_days,
           CAST(SUM(7 * c - s7) AS DOUBLE) / (7.0 * COUNT(*))
             AS seasonal_index,
           CAST(SUM(s7) AS DOUBLE) / (7.0 * COUNT(*)) AS trend_mean
    FROM t WHERE n7 = 7
    GROUP BY 1
    """,
)
def q4k_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = (
        daily.withColumn("s7", F.sum("c").over(w))
        .withColumn("n7", F.count("c").over(w))
        .filter(F.col("n7") == 7)
    )
    return (
        t.groupBy((F.weekday("day") + 1).cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (
                F.sum(F.lit(7) * F.col("c") - F.col("s7")).cast("double")
                / (F.lit(7.0) * F.count(F.lit(1)))
            ).alias("seasonal_index"),
            (
                F.sum("s7").cast("double") / (F.lit(7.0) * F.count(F.lit(1)))
            ).alias("trend_mean"),
        )
    )


# --------------------------------------------------------------------------
# q3g — multi-touch attribution (first-touch vs last-touch): each
# purchase's value is attributed to the touch channel (view / click /
# signup) that opened the user's path and the one that most recently
# preceded the purchase. One pass: two IGNORE NULLS window functions
# over (user_id, ts, event_id) order — the frame excludes the current
# row so a purchase never attributes to itself — then a purchase-only
# filter and a per-(model, channel) rollup.
# Scale: single shuffle on user_id for the window; revenue sums are
# scaled-long exact; event_id breaks ts ties so the frame content is
# deterministic in both engines.
# --------------------------------------------------------------------------

_TOUCH = "('view', 'click', 'signup')"


@query(
    "q3g_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, value,
             FIRST_VALUE(CASE WHEN event_type IN {_TOUCH}
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch,
             LAST_VALUE(CASE WHEN event_type IN {_TOUCH}
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    )
    SELECT 'first_touch' AS model, first_touch AS channel,
           COUNT(*) AS n_purchases,
           {o_dsum("value", "attributed_revenue", "100.0")}
    FROM seq WHERE event_type = 'purchase' AND first_touch IS NOT NULL
    GROUP BY 2
    UNION ALL
    SELECT 'last_touch', last_touch, COUNT(*),
           {o_dsum("value", "attributed_revenue", "100.0")}
    FROM seq WHERE event_type = 'purchase' AND last_touch IS NOT NULL
    GROUP BY 2
    """,
)
def q3g_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin("view", "click", "signup"), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "user_id",
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    ).filter(F.col("event_type") == "purchase")

    def rollup(model: str, channel_col: str) -> DataFrame:
        return (
            seq.filter(F.col(channel_col).isNotNull())
            .groupBy(F.col(channel_col).alias("channel"))
            .agg(
                F.count(F.lit(1)).alias("n_purchases"),
                dsum("value", "attributed_revenue", scale=100.0),
            )
            .select(
                F.lit(model).alias("model"),
                "channel",
                "n_purchases",
                "attributed_revenue",
            )
        )

    return rollup("first_touch", "first_touch").unionAll(
        rollup("last_touch", "last_touch")
    )


# --------------------------------------------------------------------------
# q3h — robust outlier detection via MAD (median absolute deviation):
# the dispersion-robust alternative to the z-score family (q46/q3c).
# med and MAD are exact interpolated medians (both engines compute
# quantile_cont(0.5) over the same doubles); the outlier gate
# |x − med| > 3·1.4826·MAD multiplies the same constants in the same
# order, so the boolean never flips cross-engine.
# Scale: two grouped exact medians + a broadcast join of the 5-row
# stats table; the raw table streams through the final count pass.
# At 100 TB the exact median is the documented bottleneck — the
# sketch path is q36's approx_percentile envelope.
# --------------------------------------------------------------------------


@query(
    "q3h_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS dv, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, MEDIAN(dv) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           MIN(d.med) AS med,
           MIN(a.mad) AS mad,
           CAST(SUM(CASE WHEN d.dv > 3.0 * 1.4826 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY 1
    """,
)
def q3h_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("dv"),
        "med",
    )
    mad = dev.groupBy("event_type").agg(F.median("dv").alias("mad"))
    gate = F.col("dv") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(F.when(gate, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# q4l — bootstrap confidence interval for the mean daily event count,
# with a DETERMINISTIC hash-weighted resampling scheme: replicate b
# weights day d by md5(day||b) % 3 (mean-1 integer weights — a
# Bayesian-bootstrap-style surrogate for multinomial resampling that
# every engine reproduces bit-for-bit). Replicate means are ratios of
# exact BIGINT sums; the CI bounds are exact order statistics of the
# 100 replicate means with (mean, b) tie-breaks.
# Scale: the base series is the calendar-bounded daily aggregate, so
# the 100x replicate blow-up is bounded by |days|*B, not |events|*B.
# --------------------------------------------------------------------------

_BOOT_B = 100


@query(
    "q4l_bootstrap_ci",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    reps AS (
      SELECT b.range AS b,
             CAST(SUM(w * c) AS DOUBLE) / SUM(w) AS rep_mean
      FROM daily, range(1, {_BOOT_B + 1}) b,
           LATERAL (SELECT CAST(('0x' || SUBSTR(MD5(CAST(day AS VARCHAR)
                      || '-' || CAST(b.range AS VARCHAR) || 'boot'), 1, 8))
                      AS BIGINT) % 3 AS w) s
      GROUP BY 1
    ),
    ranked AS (
      SELECT rep_mean, ROW_NUMBER() OVER (ORDER BY rep_mean, b) AS rn
      FROM reps
    )
    SELECT (SELECT COUNT(*) FROM reps) AS n_reps,
           (SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) FROM daily)
             AS point_estimate,
           MIN(CASE WHEN rn = 5 THEN rep_mean END) AS ci_lo,
           MAX(CASE WHEN rn = 96 THEN rep_mean END) AS ci_hi
    FROM ranked
    """,
)
def q4l_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    b = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    w = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("day").cast("string"),
                        F.lit("-"),
                        F.col("b").cast("string"),
                        F.lit("boot"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 3
    )
    reps = (
        daily.crossJoin(F.broadcast(b))
        .withColumn("w", w)
        .groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("c")).cast("double") / F.sum("w")).alias(
                "rep_mean"
            )
        )
    )
    ranked = reps.withColumn(
        "rn", F.row_number().over(Window.orderBy("rep_mean", "b"))
    )
    point = daily.agg(
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("point_estimate")
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_reps"),
            F.min(F.when(F.col("rn") == 5, F.col("rep_mean"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == 96, F.col("rep_mean"))).alias("ci_hi"),
        )
        .join(F.broadcast(point))
        .select("n_reps", "point_estimate", "ci_lo", "ci_hi")
    )


# --------------------------------------------------------------------------
# q4m — chi-square test of independence (event_type × ISO dow
# contingency table): the classic categorical-association statistic.
# Observed counts are exact integers; expected counts and per-cell
# terms are identical IEEE expressions on both engines; the chi2 SUM
# goes through the scaled-long trick (floor(term*1e9+0.5)) so the
# 35-term reduction is order-independent.
# Scale: one groupBy for the table, row/col margins via broadcast
# joins of the 5- and 7-row margin tables; everything after the first
# aggregation is dimension-bounded.
# --------------------------------------------------------------------------


@query(
    "q4m_chi_square",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(EXTRACT(ISODOW FROM ts) AS INTEGER) AS dow,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY 1),
    cols_ AS (SELECT dow, SUM(o) AS ct FROM cells GROUP BY 1),
    n_ AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
      SELECT (CAST(o AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             AS term
      FROM cells JOIN rows_ USING (event_type) JOIN cols_ USING (dow), n_
    )
    SELECT CAST(SUM(CAST(FLOOR(term * 1000000000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000000.0 AS chi2,
           (SELECT CAST((COUNT(DISTINCT event_type) - 1)
                        * (COUNT(DISTINCT dow) - 1) AS INTEGER)
            FROM cells) AS dof,
           (SELECT CAST(n AS BIGINT) FROM n_) AS n
    FROM terms
    """,
)
def q4m_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    n_ = cells.agg(F.sum("o").alias("n"))
    exp = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col(
        "n"
    ).cast("double")
    term = (F.col("o").cast("double") - exp) * (
        F.col("o").cast("double") - exp
    ) / exp
    dof = cells.agg(
        (
            (F.count_distinct("event_type") - 1) * (F.count_distinct("dow") - 1)
        )
        .cast("int")
        .alias("dof")
    )
    return (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "dow")
        .join(F.broadcast(n_))
        .agg(
            (
                F.sum(F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")).cast(
                    "double"
                )
                / F.lit(1e9)
            ).alias("chi2")
        )
        .join(F.broadcast(dof))
        .join(F.broadcast(n_.select(F.col("n").cast("bigint").alias("n"))))
        .select("chi2", "dof", "n")
    )


# --------------------------------------------------------------------------
# q3i — top event paths (path mining): the most frequent 3-step
# event-type sequences per user session stream, via two LEADs over
# (user_id, ts, event_id) order — one shuffle, integer counts, and a
# (count, path) ranking key with no floats anywhere.
# --------------------------------------------------------------------------


@query(
    "q3i_top_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
)
def q3i_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q4n — A/B test evaluation: deterministic md5 bucketing of users
# into variants (the same engine-independent assignment a real
# experimentation system uses), conversion = any HIGH-VALUE purchase
# (value >= 150, a ~47% rate at every SF — nearly every fixture user has SOME purchase, which
# would put the pooled rate at exactly 1.0 and the z denominator at
# 0), and a two-proportion pooled z-score. All counts are exact integers;
# the z expression is written with identical association on both
# sides and rounded to 9 dp. One groupBy(user) + one global fold.
# --------------------------------------------------------------------------


@query(
    "q4n_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR) || 'ab1'),
                   1, 8)) AS BIGINT) % 2 AS v,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / SQRT(CAST(conv_a + conv_b AS DOUBLE)
                        / CAST(n_a + n_b AS DOUBLE)
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                           / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / CAST(n_a AS DOUBLE)
                           + 1.0 / CAST(n_b AS DOUBLE))), 9) AS z_score
    FROM s
    """,
)
def q4n_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab1"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150.0), 1
            ).otherwise(0)
        ).alias("conv")
    ).withColumn("v", v)
    s = u.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = F.round(
        (pa - pb)
        / F.sqrt(
            pp
            * (F.lit(1.0) - pp)
            * (
                F.lit(1.0) / F.col("n_a").cast("double")
                + F.lit(1.0) / F.col("n_b").cast("double")
            )
        ),
        9,
    )
    return s.select("n_a", "conv_a", "n_b", "conv_b", z.alias("z_score"))


# --------------------------------------------------------------------------
# q4p — clamped running balance (operators/clamped.py): per-user
# account where purchases credit and errors debit, floored at zero —
# bal_i = max(0, bal_{i-1} + delta_i). The clamp makes the recurrence
# NON-LINEAR in prefix sums, so no window function can express it;
# this is the canonical per-key sequential scan (U3 applyInPandas,
# integer arithmetic on 2-decimal-scaled deltas, total (ts, event_id)
# order). The oracle replays the identical recurrence as a DuckDB
# recursive CTE over the same row numbering — a rows-faithful replay
# of a stateful operator, not an envelope.
# --------------------------------------------------------------------------


@query(
    "q4p_clamped_balance",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                  ELSE -CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
             END AS delta
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    bal AS (
      SELECT user_id, rn,
             GREATEST(CAST(0 AS BIGINT), delta) AS b,
             CASE WHEN delta < 0 THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS clamps,
             GREATEST(CAST(0 AS BIGINT), delta) AS maxb
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.user_id, d.rn,
             GREATEST(CAST(0 AS BIGINT), bal.b + d.delta),
             bal.clamps + CASE WHEN bal.b + d.delta < 0 THEN 1 ELSE 0 END,
             GREATEST(bal.maxb, GREATEST(CAST(0 AS BIGINT), bal.b + d.delta))
      FROM bal JOIN d ON d.user_id = bal.user_id AND d.rn = bal.rn + 1
    )
    SELECT CAST(b.user_id AS BIGINT) AS user_id,
           CAST(b.b AS BIGINT) AS final_scaled,
           CAST(b.maxb AS BIGINT) AS max_scaled,
           CAST(b.clamps AS BIGINT) AS n_clamps
    FROM bal b JOIN (SELECT user_id, MAX(rn) AS mr FROM bal GROUP BY 1) m
      ON b.user_id = m.user_id AND b.rn = m.mr
    """,
)
def q4p_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.clamped import clamped_balance

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    scaled = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    d = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", scaled)
        .otherwise(-scaled)
        .alias("delta"),
    )
    return clamped_balance(d, "user_id", ["ts", "event_id"], "delta")


# --------------------------------------------------------------------------
# q4o — Kaplan–Meier time-to-conversion curve: "survival" = a user
# has not yet made their first purchase, measured in whole hours from
# their first event (exact integer epoch-microsecond division). Users
# with no purchase are right-CENSORED at their last observed hour —
# they stay in the at-risk set but never count as events, the
# defining feature of KM vs a naive conversion fraction.
# S(t) = Π_{t_i≤t} (1 − d_i/n_i) via EXP(SUM(LN(...)) OVER
# (ORDER BY t)) — identical transcendental chain on both engines,
# rounded 6 dp; d and n are exact integers and rows with d = n are
# excluded identically (Spark ln(0) is NULL, DuckDB -inf).
# Scale: the per-user collapse is the only corpus-sized aggregation;
# the curve is hour-cardinality-bounded, so the ordered window runs
# over a tiny series (the q4k calendar-bound argument).
# --------------------------------------------------------------------------


@query(
    "q4o_kaplan_meier",
    oracle="""
    WITH ud AS (
      SELECT user_id,
             MIN(epoch_us(ts)) AS f_us,
             MAX(epoch_us(ts)) AS l_us,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS p_us
      FROM events GROUP BY 1
    ),
    u AS (
      SELECT user_id,
             CAST(COALESCE((p_us - f_us) // 3600000000,
                           (l_us - f_us) // 3600000000) AS INTEGER) AS t_obs,
             CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS converted
      FROM ud
    ),
    ucnt AS (SELECT t_obs, COUNT(*) AS c FROM u GROUP BY t_obs),
    atrisk AS (
      SELECT t_obs, SUM(c) OVER (ORDER BY t_obs DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS n_ge
      FROM ucnt
    ),
    ev AS (
      SELECT t_obs AS t, CAST(SUM(converted) AS BIGINT) AS d
      FROM u GROUP BY t_obs HAVING SUM(converted) > 0
    ),
    curve AS (
      SELECT e.t, e.d, CAST(a.n_ge AS BIGINT) AS n_at_risk
      FROM ev e JOIN atrisk a ON e.t = a.t_obs
      WHERE e.d < a.n_ge
    )
    SELECT t, d, n_at_risk,
           ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE)))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)), 6) AS survival
    FROM curve
    """,
)
def q4o_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    ud = e.groupBy("user_id").agg(
        F.min(us).alias("f_us"),
        F.max(us).alias("l_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    u = ud.select(
        F.coalesce(
            F.expr("(p_us - f_us) div 3600000000"),
            F.expr("(l_us - f_us) div 3600000000"),
        )
        .cast("int")
        .alias("t_obs"),
        F.when(F.col("p_us").isNotNull(), 1).otherwise(0).alias("converted"),
    )
    ucnt = u.groupBy("t_obs").agg(F.count(F.lit(1)).alias("c"))
    w_desc = (
        Window.orderBy(F.col("t_obs").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    atrisk = ucnt.select("t_obs", F.sum("c").over(w_desc).alias("n_ge"))
    ev = (
        u.groupBy(F.col("t_obs").alias("t"))
        .agg(F.sum("converted").cast("bigint").alias("d"))
        .filter(F.col("d") > 0)
    )
    curve = (
        ev.join(atrisk, F.col("t") == F.col("t_obs"))
        .filter(F.col("d") < F.col("n_ge"))
        .select("t", "d", F.col("n_ge").cast("bigint").alias("n_at_risk"))
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = F.round(
        F.exp(
            F.sum(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
                )
            ).over(w_asc)
        ),
        6,
    )
    return curve.select("t", "d", "n_at_risk", surv.alias("survival"))


# --------------------------------------------------------------------------
# q4q — Holt's linear-trend exponential smoothing over the daily
# event series, forecast 7 days ahead: level/trend state is a
# SEQUENTIAL recurrence (like q4p's clamp, inexpressible by
# windows) — l_i = α·y_i + (1−α)(l_{i−1}+b_{i−1}),
# b_i = β(l_i−l_{i−1}) + (1−β)b_{i−1}. Both engines execute the
# IDENTICAL IEEE double expression sequence (pandas loop vs
# recursive CTE, same literals, same association), so the state is
# bit-identical; forecasts are rounded 6 dp. The scan runs over the
# calendar-bounded daily aggregate (the q4k argument): the heavy
# reduction is the map-side daily count, the recurrence is O(|days|).
# --------------------------------------------------------------------------

_HW_ALPHA, _HW_BETA = 0.5, 0.3


@query(
    "q4q_holt_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    d AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn, y FROM daily),
    hw AS (
      SELECT rn, y AS l, 0.0e0 AS b FROM d WHERE rn = 1
      UNION ALL
      SELECT d.rn,
             {_HW_ALPHA} * d.y + {1 - _HW_ALPHA} * (hw.l + hw.b),
             {_HW_BETA} * ({_HW_ALPHA} * d.y
                           + {1 - _HW_ALPHA} * (hw.l + hw.b) - hw.l)
               + {1 - _HW_BETA} * hw.b
      FROM hw JOIN d ON d.rn = hw.rn + 1
    ),
    fin AS (SELECT l, b FROM hw WHERE rn = (SELECT MAX(rn) FROM hw))
    SELECT CAST(h.range AS INTEGER) AS h,
           ROUND(l + h.range * b, 6) AS forecast
    FROM fin, range(1, 8) h
    """,
)
def q4q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    a, bt = _HW_ALPHA, _HW_BETA

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day", kind="mergesort")
        ys = list(pdf["y"])
        l, b = ys[0], 0.0
        for y in ys[1:]:
            l_new = a * y + (1 - a) * (l + b)
            b = bt * (l_new - l) + (1 - bt) * b
            l = l_new
        return pd.DataFrame(
            {"h": list(range(1, 8)), "forecast": [l + h * b for h in range(1, 8)]}
        )

    return (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fit, schema="h int, forecast double")
        .select("h", F.round("forecast", 6).alias("forecast"))
    )


# --------------------------------------------------------------------------
# q3j — time-decayed popularity scoring: each event contributes
# 0.5^(age_weeks) to its type's score (half-life one week). The decay
# weight is EXACT: 0.5^k for integer k is a power of two, computed as
# the integer shift (2^20 >> k) — so the whole aggregation is BIGINT
# arithmetic and only the final /2^20 is float. No libm pow in the
# pipeline, no last-ulp drift, map-side-combinable at any scale.
# The freshness anchor (max event time) is a 1-row broadcast.
# --------------------------------------------------------------------------


@query(
    "q3j_decayed_counts",
    oracle="""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
    w AS (
      SELECT event_type,
             CASE WHEN (m - epoch_us(ts)) // 604800000000 < 20
                  THEN 1048576 >> CAST((m - epoch_us(ts)) // 604800000000
                                       AS INTEGER)
                  ELSE 0 END AS ws
      FROM events, mx
    )
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(ws) AS DOUBLE) / 1048576.0 AS decayed_count
    FROM w GROUP BY event_type
    """,
)
def q3j_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    mx = e.agg(F.max(F.unix_micros("ts")).alias("m"))
    # pyspark's F.shiftright takes a literal bit count, so the
    # column-shift goes through expr()
    ws = F.expr(
        "CASE WHEN (m - unix_micros(ts)) div 604800000000 < 20"
        " THEN shiftright(1048576,"
        "      cast((m - unix_micros(ts)) div 604800000000 as int))"
        " ELSE 0 END"
    )
    return (
        e.join(F.broadcast(mx))
        .select("event_type", ws.cast("long").alias("ws"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("ws").cast("double") / F.lit(1048576.0)).alias("decayed_count"),
        )
    )


# --------------------------------------------------------------------------
# q4s — CUSUM change-point detection over the daily event series:
# S_i = max(0, S_{i-1} + (x_i − 1.05·mean)) — the one-sided cumulative
# sum drift detector. The deviation is cross-multiplied to exact
# BIGINTs (20·n·c_i − 21·Σc puts both the mean and the 5% slack on a
# common integer denominator), and the clamp recurrence REUSES
# operators/clamped.clamped_balance — the same stateful-scan operator
# behind q4p, demonstrating it as a library primitive, not a one-off.
# Outputs: final CUSUM, its running max (the drift peak), and the
# number of resets. Oracle: recursive-CTE replay of the identical
# integer recurrence.
# --------------------------------------------------------------------------


@query(
    "q4s_cusum",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    g AS (SELECT COUNT(*) AS n, SUM(c) AS tot FROM daily),
    d AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn,
             20 * g.n * daily.c - 21 * g.tot AS delta
      FROM daily, g
    ),
    s AS (
      SELECT rn,
             GREATEST(CAST(0 AS BIGINT), delta) AS b,
             CASE WHEN delta < 0 THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS clamps,
             GREATEST(CAST(0 AS BIGINT), delta) AS maxb
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.rn,
             GREATEST(CAST(0 AS BIGINT), s.b + d.delta),
             s.clamps + CASE WHEN s.b + d.delta < 0 THEN 1 ELSE 0 END,
             GREATEST(s.maxb, GREATEST(CAST(0 AS BIGINT), s.b + d.delta))
      FROM s JOIN d ON d.rn = s.rn + 1
    )
    SELECT CAST(s.b AS BIGINT) AS cusum_final,
           CAST(s.maxb AS BIGINT) AS cusum_max,
           CAST(s.clamps AS BIGINT) AS n_resets
    FROM s WHERE rn = (SELECT MAX(rn) FROM s)
    """,
)
def q4s_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.clamped import clamped_balance

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    g = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("tot")
    )
    d = daily.join(F.broadcast(g)).select(
        F.lit(1).alias("k"),
        "day",
        (F.lit(20) * F.col("n") * F.col("c") - F.lit(21) * F.col("tot")).alias(
            "delta"
        ),
    )
    return clamped_balance(d, "k", ["day"], "delta").select(
        F.col("final_scaled").alias("cusum_final"),
        F.col("max_scaled").alias("cusum_max"),
        "n_clamps",
    ).withColumnRenamed("n_clamps", "n_resets")


# --------------------------------------------------------------------------
# q4u — autocorrelation function (ACF) of the hourly event-count
# series, per event type, at lags 1 and 24 (the hour-over-hour and
# day-over-day signals a seasonality detector reads). Series = counts
# of the OBSERVED hourly buckets in time order; lag is by row over
# that sequence (documented: no zero-fill — both engines use the
# identical row-lag semantics, and q4d is the gap-fill operator).
#
# Pearson r over (x = lagged count, y = count): every aggregate
# (n, Sx, Sy, Sxy, Sxx, Syy) is a BIGINT sum of exact integers, so
# both engines divide the SAME integers; the one float expression is
# the final ratio, rounded to 9 dp. Scale: one shuffle to the hourly
# buckets (map-side combinable), a per-type window lag, and a
# (type x lag)-cell aggregate — counts-bound after the first pass.
# --------------------------------------------------------------------------


@query(
    "q4u_autocorrelation",
    oracle="""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, c,
             LAG(c, 1) OVER (PARTITION BY event_type ORDER BY hr) AS x1,
             LAG(c, 24) OVER (PARTITION BY event_type ORDER BY hr) AS x24
      FROM hourly
    ),
    pairs AS (
      SELECT event_type, 1 AS lag, x1 AS x, c AS y FROM lagged WHERE x1 IS NOT NULL
      UNION ALL
      SELECT event_type, 24 AS lag, x24 AS x, c AS y FROM lagged WHERE x24 IS NOT NULL
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag,
           COUNT(*) AS n_pairs,
           ROUND(
             CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
             / NULLIF(SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
                           * CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)),
                      0),
             9) AS acf
    FROM pairs
    GROUP BY event_type, lag
    """,
)
def q4u_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("x1"),
        F.lag("c", 24).over(w).alias("x24"),
    )
    pairs = lagged.select(
        "event_type",
        "c",
        F.expr("stack(2, 1, x1, 24, x24) AS (lag, x)"),
    ).filter(F.col("x").isNotNull())
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("c")
    sxy = F.sum(F.col("x") * F.col("c"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("c") * F.col("c"))
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt(
        (n * sxx - sx * sx).cast("double") * (n * syy - sy * sy).cast("double")
    )
    return pairs.groupBy("event_type", F.col("lag").cast("int").alias("lag")).agg(
        n.alias("n_pairs"),
        F.round(num / F.nullif(den, F.lit(0.0)), 9).alias("acf"),
    )


# --------------------------------------------------------------------------
# q4v — Mann-Whitney U (Wilcoxon rank-sum) test: purchase vs view
# event values. The nonparametric two-sample location test every
# experimentation pipeline reaches for when values are skewed.
# Average ranks with ties are computed WITHOUT a single-reducer
# window: per distinct value the strictly-below count comes from the
# distributed prefix sum (operators/ordering.global_cumsum — range
# repartition + driver offsets of #partitions integers), and
# 2·avg_rank = 2·below + c + 1 keeps the whole rank-sum in exact
# BIGINT arithmetic (2R_A is integral even when ties make R_A a
# half-integer). Only the final z expression touches doubles, shaped
# identically on both engines. One groupBy(value) shuffle + one
# range shuffle; the per-value table is |distinct values|, never
# materialized on the driver.
# --------------------------------------------------------------------------


@query(
    "q4v_mann_whitney",
    oracle="""
    WITH v AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY value
    ),
    cum AS (
      SELECT ca, c,
             COALESCE(SUM(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM v
    ),
    s AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(c - ca) AS BIGINT) AS n_b,
             CAST(SUM(ca * (2 * below + c + 1)) AS BIGINT) AS two_ra
      FROM cum
    )
    SELECT n_a, n_b,
           (CAST(two_ra AS DOUBLE)
            - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0)) / 2.0 AS u_a,
           ROUND(((CAST(two_ra AS DOUBLE)
                   - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0)) / 2.0
                  - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                 / SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                        * (CAST(n_a + n_b AS DOUBLE) + 1.0) / 12.0),
                 9) AS z_score
    FROM s
    """,
)
def q4v_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_cumsum

    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("ca"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    cum = global_cumsum(v, ["value"], "c", out_col="below", exclusive=True)
    s = cum.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("n_b"),
        F.sum(
            F.col("ca") * (F.lit(2) * F.col("below") + F.col("c") + F.lit(1))
        )
        .cast("bigint")
        .alias("two_ra"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    u_a = (F.col("two_ra").cast("double") - na * (na + F.lit(1.0))) / F.lit(2.0)
    z = (u_a - na * nb / F.lit(2.0)) / F.sqrt(
        na * nb * ((F.col("n_a") + F.col("n_b")).cast("double") + F.lit(1.0))
        / F.lit(12.0)
    )
    return s.select("n_a", "n_b", u_a.alias("u_a"), F.round(z, 9).alias("z_score"))


# --------------------------------------------------------------------------
# q4w — two-sample Kolmogorov-Smirnov statistic (purchase vs view):
# D = max |ECDF_a − ECDF_b| over the pooled support, kept EXACT by
# maximizing the integer numerator |cum_a·n_b − cum_b·n_a| instead of
# the float ratio. Both running counts ride ONE distributed prefix
# sum by packing (cum_a, cum_b) into a single long (cum_a·2^31 +
# cum_b — exact while each side stays under 2^31 rows; beyond that,
# run two prefix passes). The max of BIGINTs is order-independent, so
# the statistic is partition-invariant by construction; the final
# d_stat is one integer division, bit-identical on both engines.
# --------------------------------------------------------------------------


@query(
    "q4w_ks_test",
    oracle="""
    WITH v AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY value
    ),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY value) AS cum_a,
             SUM(cb) OVER (ORDER BY value) AS cum_b
      FROM v
    ),
    n AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
          FROM v)
    SELECT n_a, n_b,
           CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num,
           CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat
    FROM cum, n
    GROUP BY n_a, n_b
    """,
)
def q4w_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_cumsum

    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("ca"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "cb"
            ),
        )
    )
    pack = F.lit(2147483648)  # 2^31
    packed = v.withColumn("packed", F.col("ca") * pack + F.col("cb"))
    cum = global_cumsum(packed, ["value"], "packed", out_col="cum")
    cum = cum.select(
        F.floor(F.col("cum") / pack).cast("bigint").alias("cum_a"),
        (F.col("cum") % pack).cast("bigint").alias("cum_b"),
    )
    n = v.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            )
            .cast("bigint")
            .alias("d_num")
        )
        .select(
            "n_a",
            "n_b",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("d_stat"),
        )
    )


# --------------------------------------------------------------------------
# q4x — mutual information + marginal entropies of the event_type ×
# ISO-dow contingency table (the feature-selection / drift-detection
# companion to q4m's chi-square, same table topology: one groupBy for
# the cells, broadcast 5- and 7-row margins, everything after the
# first aggregation dimension-bounded). Each LN term is rounded to
# 9 dp via the half-up scaled-long trick before summing, so the
# 35-term (and 5-/7-term) reductions are order-independent and the
# engines' last-ulp LN differences are absorbed.
# --------------------------------------------------------------------------


@query(
    "q4x_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(EXTRACT(ISODOW FROM ts) AS INTEGER) AS dow,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY 1),
    cols_ AS (SELECT dow, SUM(o) AS ct FROM cells GROUP BY 1),
    n_ AS (SELECT SUM(o) AS n FROM cells),
    mi AS (
      SELECT CAST(SUM(CAST(FLOOR(
               (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
               * LN(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 AS mi_nats
      FROM cells JOIN rows_ USING (event_type) JOIN cols_ USING (dow), n_
    ),
    hr AS (
      SELECT CAST(SUM(CAST(FLOOR(
               -(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
               * LN(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 AS h_rows
      FROM rows_, n_
    ),
    hc AS (
      SELECT CAST(SUM(CAST(FLOOR(
               -(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * LN(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 AS h_cols
      FROM cols_, n_
    )
    SELECT mi_nats, h_rows, h_cols,
           ROUND(mi_nats / LEAST(h_rows, h_cols), 9) AS nmi
    FROM mi, hr, hc
    """,
)
def q4x_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    n_ = cells.agg(F.sum("o").alias("n"))

    def rsum(term, name):
        return (
            F.sum(F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")).cast(
                "double"
            )
            / F.lit(1e9)
        ).alias(name)

    nd = F.col("n").cast("double")
    mi_term = (F.col("o").cast("double") / nd) * F.log(
        F.col("o").cast("double") * nd
        / (F.col("rt").cast("double") * F.col("ct").cast("double"))
    )
    mi = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "dow")
        .join(F.broadcast(n_))
        .agg(rsum(mi_term, "mi_nats"))
    )
    hr_term = -(F.col("rt").cast("double") / nd) * F.log(
        F.col("rt").cast("double") / nd
    )
    hr = rows_.join(F.broadcast(n_)).agg(rsum(hr_term, "h_rows"))
    hc_term = -(F.col("ct").cast("double") / nd) * F.log(
        F.col("ct").cast("double") / nd
    )
    hc = cols_.join(F.broadcast(n_)).agg(rsum(hc_term, "h_cols"))
    return (
        mi.join(F.broadcast(hr))
        .join(F.broadcast(hc))
        .select(
            "mi_nats",
            "h_rows",
            "h_cols",
            F.round(
                F.col("mi_nats") / F.least(F.col("h_rows"), F.col("h_cols")), 9
            ).alias("nmi"),
        )
    )


# --------------------------------------------------------------------------
# q3k — MATCH_RECOGNIZE-style sequence pattern (CEP): count V-shapes
# (a strictly-falling run of ≥2 steps immediately followed by a
# strictly-rising run of ≥2 steps) in each user's value series. The
# standard SQL MATCH_RECOGNIZE / Flink CEP `DOWN{2,} UP{2,}` pattern,
# compiled to relational form: step direction via lag, gaps-and-
# islands run encoding (change-flag prefix sum), then one lead over
# the per-user RUN table (|runs| ≤ |events|, usually ≪). Everything
# is integer; one shuffle on user_id, run compare is window-local.
# Plateaus (equal consecutive values) form direction-0 runs and
# break patterns on both engines identically.
# --------------------------------------------------------------------------


@query(
    "q3k_pattern_vshape",
    oracle="""
    WITH steps AS (
      SELECT user_id, ts, event_id,
             CAST(SIGN(value - LAG(value) OVER w) AS INTEGER) AS d
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, ts, event_id, d,
             CASE WHEN d IS DISTINCT FROM LAG(d) OVER w2 THEN 1 ELSE 0 END AS chg
      FROM steps WHERE d IS NOT NULL
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id,
             d
      FROM flagged
    ),
    run_tab AS (
      SELECT user_id, run_id, MIN(d) AS dir, COUNT(*) AS len
      FROM runs GROUP BY user_id, run_id
    ),
    paired AS (
      SELECT user_id, dir, len,
             LEAD(dir) OVER w3 AS dir2, LEAD(len) OVER w3 AS len2
      FROM run_tab
      WINDOW w3 AS (PARTITION BY user_id ORDER BY run_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_patterns,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paired
    WHERE dir = -1 AND len >= 2 AND dir2 = 1 AND len2 >= 2
    """,
)
def q3k_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = e.select(
        "user_id",
        "ts",
        "event_id",
        F.signum(F.col("value") - F.lag("value").over(w)).cast("int").alias("d"),
    ).filter(F.col("d").isNotNull())
    flagged = steps.withColumn(
        "chg",
        F.when(
            ~F.col("d").eqNullSafe(F.lag("d").over(w)), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn("run_id", F.sum("chg").over(w))
    run_tab = runs.groupBy("user_id", "run_id").agg(
        F.min("d").alias("dir"), F.count(F.lit(1)).alias("len")
    )
    w3 = Window.partitionBy("user_id").orderBy("run_id")
    paired = run_tab.select(
        "user_id",
        "dir",
        "len",
        F.lead("dir").over(w3).alias("dir2"),
        F.lead("len").over(w3).alias("len2"),
    )
    hit = paired.filter(
        (F.col("dir") == -1)
        & (F.col("len") >= 2)
        & (F.col("dir2") == 1)
        & (F.col("len2") >= 2)
    )
    return hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------------
# q4y — DFT power spectrum of the hourly event-count series at the
# daily / half-daily / weekly periods: the periodicity probe a
# seasonality detector runs before fitting (complements q4k's fixed
# decomposition and q4u's ACF). One bucket agg builds the series;
# each period's cos/sin projections are scaled-long sums of per-term
# rounded products — the engines' last-ulp trig differences are
# absorbed per term, so the reductions are order-independent — and
# the power is arithmetic on those two identical doubles.
# --------------------------------------------------------------------------

_DFT_PERIODS = (24, 12, 168)


@query(
    "q4y_dft_spectrum",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT CAST(h - (SELECT MIN(h) FROM hourly) AS DOUBLE) AS i,
             CAST(c AS DOUBLE) AS c
      FROM hourly
    ),
    terms AS (
      SELECT p, c * COS(2.0 * PI() * i / CAST(p AS DOUBLE)) AS tc,
                c * SIN(2.0 * PI() * i / CAST(p AS DOUBLE)) AS ts_
      FROM idx CROSS JOIN (VALUES {", ".join(f"({p})" for p in _DFT_PERIODS)}) AS pt(p)
    ),
    sums AS (
      SELECT CAST(p AS INTEGER) AS period_hours,
             CAST(SUM(CAST(FLOOR(tc * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000.0 AS cos_sum,
             CAST(SUM(CAST(FLOOR(ts_ * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000.0 AS sin_sum
      FROM terms GROUP BY p
    )
    SELECT period_hours, cos_sum, sin_sum,
           cos_sum * cos_sum + sin_sum * sin_sum AS power
    FROM sums
    """,
)
def q4y_dft_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    h0 = hourly.agg(F.min("h").alias("h0"))
    periods = F.broadcast(
        e.sparkSession.createDataFrame(
            [(p,) for p in _DFT_PERIODS], "p int"
        )
    )
    idx = hourly.crossJoin(F.broadcast(h0)).select(
        (F.col("h") - F.col("h0")).cast("double").alias("i"),
        F.col("c").cast("double").alias("c"),
    )
    theta = F.lit(2.0) * F.lit(math.pi) * F.col("i") / F.col("p").cast("double")

    def rsum(term, name):
        return (
            F.sum(F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")).cast(
                "double"
            )
            / F.lit(1e9)
        ).alias(name)

    sums = (
        idx.crossJoin(periods)
        .groupBy(F.col("p").cast("int").alias("period_hours"))
        .agg(
            rsum(F.col("c") * F.cos(theta), "cos_sum"),
            rsum(F.col("c") * F.sin(theta), "sin_sum"),
        )
    )
    return sums.select(
        "period_hours",
        "cos_sum",
        "sin_sum",
        (
            F.col("cos_sum") * F.col("cos_sum")
            + F.col("sin_sum") * F.col("sin_sum")
        ).alias("power"),
    )


# --------------------------------------------------------------------------
# q4z — Theil-Sen robust trend of daily order revenue: the median of
# all pairwise slopes, immune to the outlier days that wreck OLS. The
# pair table is CALENDAR-bounded (D days → D(D−1)/2 pairs, never
# |orders|²): the daily rollup collapses the fact table first, one
# side of the pair join broadcasts, and the exact lower-median slope
# is selected DISTRIBUTED via ordering.global_rank (bucket-keyed
# two-pass — no single-reducer sort, no driver materialization of the
# ~D²/2 slopes). Slopes are exact-dollar differences over integer day
# gaps, so both engines rank identical doubles; equal-slope rank ties
# can pick different rows but always the same VALUE.
# --------------------------------------------------------------------------


@query(
    "q4z_theil_sen",
    oracle=f"""
    WITH d AS (
      SELECT o_orderdate AS x, {o_dsum("o_totalprice", "y")}
      FROM orders GROUP BY o_orderdate
    ),
    p AS (
      SELECT (b.y - a.y) / CAST(DATEDIFF('day', a.x, b.x) AS DOUBLE) AS slope
      FROM d a JOIN d b ON b.x > a.x
    ),
    n AS (SELECT COUNT(*) AS n_pairs FROM p),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rk FROM p
    )
    SELECT (SELECT CAST(n_pairs AS BIGINT) FROM n) AS n_pairs,
           slope AS median_slope
    FROM ranked
    WHERE rk = (SELECT CAST(FLOOR((n_pairs + 1) / 2.0) AS BIGINT) FROM n)
    """,
)
def q4z_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    o = load(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("x")).agg(
        dsum("o_totalprice", "y")
    )
    a = d.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = d.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    p = (
        a.join(F.broadcast(b), F.col("xb") > F.col("xa"))
        .select(
            (
                (F.col("yb") - F.col("ya"))
                / F.datediff("xb", "xa").cast("double")
            ).alias("slope")
        )
    )
    n = p.agg(F.count(F.lit(1)).alias("n_pairs"))
    k = n.select(
        "n_pairs",
        F.floor((F.col("n_pairs") + 1) / F.lit(2.0)).cast("bigint").alias("k"),
    )
    ranked = global_rank(p, ["slope"], rank_col="rk")
    return (
        ranked.join(F.broadcast(k), F.col("rk") == F.col("k"))
        .select(
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("slope").alias("median_slope"),
        )
    )


# --------------------------------------------------------------------------
# q9o — DYNAMIC-GAP session windows (real stream): the gap depends on
# the event (purchases hold a session open 60 min, everything else
# 30 min) — Spark 4's expression-valued session_window gap, exercised
# end-to-end through an availableNow stream in complete mode. The
# batch-SQL twin replays the merge rule exactly: an event extends the
# session iff its start is STRICTLY before the running max session
# end (running MAX, not lag — with variable gaps an earlier event can
# hold the session open longer than the latest one), all in integer
# micros. Session end = max(event ts + its gap), Spark's definition.
# --------------------------------------------------------------------------

_DYN_GAP_US = "CASE WHEN event_type = 'purchase' THEN 3600000000 ELSE 1800000000 END"


@query(
    "q9o_dynamic_gap_sessions",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             EPOCH_US(ts) AS t_us,
             EPOCH_US(ts) + {_DYN_GAP_US} AS end_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, t_us, end_us, value,
        CASE WHEN MAX(end_us) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR t_us >= MAX(end_us) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_sess
      FROM g
    ),
    sess AS (
      SELECT user_id, ts, end_us, value,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAKE_TIMESTAMP(MAX(end_us)) AS session_end,
           COUNT(*) AS n_events,
           {o_dsum("value", "session_value")}
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q9o_dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.functions.exact import dsum as _dsum
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q9o_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    stream = read_events_stream(spark, src)
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    q = to_memory_sink(agg, sink, "complete")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q3l — exact weighted median (order price weighted by line quantity):
# the robust "typical dollar" statistic where every unit of quantity
# votes. Weights are exact integers, so the crossing point — the
# smallest price whose cumulative weight reaches half the total — is
# found by the DISTRIBUTED prefix sum over the per-price weight table
# (ordering.global_cumsum, bucket-keyed two-pass; never a
# single-reducer cumulative window), then one bounded filter+min.
# 2·cum ≥ W in integers avoids the W/2 float entirely.
# --------------------------------------------------------------------------


@query(
    "q3l_weighted_median",
    oracle="""
    WITH v AS (
      SELECT l_extendedprice AS price,
             CAST(SUM(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY l_extendedprice
    ),
    cum AS (
      SELECT price, w,
             SUM(w) OVER (ORDER BY price) AS cw
      FROM v
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM v)
    SELECT (SELECT wt FROM tot) AS total_weight,
           MIN(price) AS weighted_median
    FROM cum, tot
    WHERE 2 * cw >= wt
    """,
)
def q3l_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_cumsum

    li = load(spark, sf_dir, "lineitem")
    v = li.groupBy(F.col("l_extendedprice").alias("price")).agg(
        F.sum("l_quantity").cast("bigint").alias("w")
    )
    cum = global_cumsum(v, ["price"], "w", out_col="cw")
    tot = v.agg(F.sum("w").cast("bigint").alias("wt"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("cw") >= F.col("wt"))
        .groupBy("wt")
        .agg(F.min("price").alias("weighted_median"))
        .select(F.col("wt").alias("total_weight"), "weighted_median")
    )


# --------------------------------------------------------------------------
# q3m — partial autocorrelation at lag 2 (PACF) via the Durbin-
# Levinson closed form φ22 = (ρ2 − ρ1²)/(1 − ρ1²): the AR-order
# diagnostic read next to q4u's ACF. ρ1/ρ2 are Pearson correlations
# over exact BIGINT hourly-count sums (q4u's discipline — both
# engines divide the same integers), ROUNDED to 9 dp first, so the
# closed form is arithmetic on identical doubles and its result
# rounds identically. One bucket shuffle + per-type lags; the φ
# algebra runs on a 5-row table.
# --------------------------------------------------------------------------


@query(
    "q3m_pacf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, c,
             LAG(c, 1) OVER (PARTITION BY event_type ORDER BY hr) AS x1,
             LAG(c, 2) OVER (PARTITION BY event_type ORDER BY hr) AS x2
      FROM hourly
    ),
    pairs AS (
      SELECT event_type, 1 AS lag, x1 AS x, c AS y FROM lagged WHERE x1 IS NOT NULL
      UNION ALL
      SELECT event_type, 2 AS lag, x2 AS x, c AS y FROM lagged WHERE x2 IS NOT NULL
    ),
    acf AS (
      SELECT event_type, lag,
             ROUND(
               CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
               / NULLIF(SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
                             * CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)),
                        0),
               9) AS r
      FROM pairs GROUP BY event_type, lag
    ),
    wide AS (
      SELECT event_type,
             MIN(CASE WHEN lag = 1 THEN r END) AS rho1,
             MIN(CASE WHEN lag = 2 THEN r END) AS rho2
      FROM acf GROUP BY event_type
    )
    SELECT event_type, rho1, rho2,
           ROUND((rho2 - rho1 * rho1) / (1.0 - rho1 * rho1), 9) AS pacf2
    FROM wide
    """,
)
def q3m_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("x1"),
        F.lag("c", 2).over(w).alias("x2"),
    )
    pairs = lagged.select(
        "event_type",
        "c",
        F.expr("stack(2, 1, x1, 2, x2) AS (lag, x)"),
    ).filter(F.col("x").isNotNull())
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("c")
    sxy = F.sum(F.col("x") * F.col("c"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("c") * F.col("c"))
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt(
        (n * sxx - sx * sx).cast("double") * (n * syy - sy * sy).cast("double")
    )
    acf = pairs.groupBy("event_type", "lag").agg(
        F.round(num / F.nullif(den, F.lit(0.0)), 9).alias("r")
    )
    wide = acf.groupBy("event_type").agg(
        F.min(F.when(F.col("lag") == 1, F.col("r"))).alias("rho1"),
        F.min(F.when(F.col("lag") == 2, F.col("r"))).alias("rho2"),
    )
    return wide.select(
        "event_type",
        "rho1",
        "rho2",
        F.round(
            (F.col("rho2") - F.col("rho1") * F.col("rho1"))
            / (F.lit(1.0) - F.col("rho1") * F.col("rho1")),
            9,
        ).alias("pacf2"),
    )


# --------------------------------------------------------------------------
# q3n — inter-arrival statistics + burstiness: per event type, the
# gap distribution between consecutive events (queueing/reliability
# analysis) summarized as rate λ = 1/mean_gap and Goh-Barabási
# burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1): B→0 for a Poisson process,
# B→1 for bursty traffic. Gaps are exact integer micros; Σgap and
# Σgap² are exact sums, so both engines compute μ/σ from the same
# integers and only the final expressions are floats, rounded 9 dp.
#
# SCALE REWRITE (round 6; the 10× probe showed 6.1× when the lag
# window partitioned by the 5-value event_type — 5 effective tasks
# serialize the sort): gaps are now computed with BUCKET-LOCAL lag
# windows — partition (event_type, hour-bucket), parallelism = types
# × hours, each sort is one hour of one type — and the boundary gap
# between consecutive non-empty buckets is restored from a per-bucket
# (first_us, last_us) summary via a lag over buckets (counts-bound:
# #buckets rows per type, never event rows). Identical multiset of
# gaps as the single sorted pass: bucket boundaries split the per-
# type sequence, cross-gaps reattach exactly the severed consecutive
# pairs (ties can't straddle buckets — equal ts ⇒ equal bucket), and
# Σ(n_b−1) + (#buckets−1) = N−1 gaps. ✓ oracle unchanged.
# --------------------------------------------------------------------------

_Q3N_BUCKET_US = 3_600_000_000  # 1 hour of micros per lag bucket


@query(
    "q3n_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS g
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    s AS (
      SELECT event_type,
             COUNT(g) AS n_gaps,
             CAST(SUM(g) AS BIGINT) AS sg,
             SUM(CAST(g AS HUGEINT) * g) AS sgg
      FROM gaps WHERE g IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
           ROUND(CAST(sg AS DOUBLE) / n_gaps / 1000000.0, 9) AS mean_gap_s,
           ROUND(SQRT((CAST(sgg AS DOUBLE) / n_gaps
                       - (CAST(sg AS DOUBLE) / n_gaps)
                         * (CAST(sg AS DOUBLE) / n_gaps)))
                 / 1000000.0, 9) AS std_gap_s,
           ROUND((SQRT((CAST(sgg AS DOUBLE) / n_gaps
                        - (CAST(sg AS DOUBLE) / n_gaps)
                          * (CAST(sg AS DOUBLE) / n_gaps)))
                  - CAST(sg AS DOUBLE) / n_gaps)
                 / (SQRT((CAST(sgg AS DOUBLE) / n_gaps
                          - (CAST(sg AS DOUBLE) / n_gaps)
                            * (CAST(sg AS DOUBLE) / n_gaps)))
                    + CAST(sg AS DOUBLE) / n_gaps), 9) AS burstiness
    FROM s
    """,
)
def q3n_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    rows = e.select(
        "event_type",
        "event_id",
        "ts",
        us.alias("us"),
        F.floor(us / F.lit(_Q3N_BUCKET_US)).alias("b"),
    )
    # in-bucket gaps: parallelism = #types × #hour-buckets
    w_in = Window.partitionBy("event_type", "b").orderBy("ts", "event_id")
    g_in = rows.select(
        "event_type",
        "b",
        "us",
        (F.col("us") - F.lag("us").over(w_in)).alias("g"),
    )
    per_bucket = g_in.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("g").alias("n_in"),
        F.sum("g").alias("sg_in"),
        # g² overflows int64 for multi-hour gaps in micros — widen
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("sgg_in"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
    # boundary gaps between consecutive NON-EMPTY buckets: a lag over
    # the per-bucket summary — #buckets rows per type, counts-bound
    w_b = Window.partitionBy("event_type").orderBy("b")
    with_cross = per_bucket.select(
        "event_type",
        "n_in",
        "sg_in",
        "sgg_in",
        (F.col("first_us") - F.lag("last_us").over(w_b)).alias("g_cross"),
    )
    s = with_cross.groupBy("event_type").agg(
        (F.sum("n_in") + F.count("g_cross")).cast("bigint").alias("n_gaps"),
        (F.coalesce(F.sum("sg_in"), F.lit(0)) + F.coalesce(F.sum("g_cross"), F.lit(0)))
        .cast("bigint")
        .alias("sg"),
        (
            F.coalesce(F.sum("sgg_in"), F.lit(0).cast("decimal(38,0)"))
            + F.coalesce(
                F.sum(F.col("g_cross").cast("decimal(38,0)") * F.col("g_cross")),
                F.lit(0).cast("decimal(38,0)"),
            )
        ).alias("sgg"),
    )
    mu = F.col("sg").cast("double") / F.col("n_gaps")
    sd = F.sqrt(F.col("sgg").cast("double") / F.col("n_gaps") - mu * mu)
    return s.select(
        "event_type",
        "n_gaps",
        F.round(mu / F.lit(1e6), 9).alias("mean_gap_s"),
        F.round(sd / F.lit(1e6), 9).alias("std_gap_s"),
        F.round((sd - mu) / (sd + mu), 9).alias("burstiness"),
    )


# --------------------------------------------------------------------------
# q3o — rolling activity metrics (DAU / 7-day WAU): the product-
# analytics staple, computed with the SCALABLE rewrite for sliding
# DISTINCT counts — a naive 7-day self-join re-scans the fact table
# per offset, and a sliding window can't dedup users across frames.
# Instead each (user, active-day) row is exploded into the ≤7 target
# days it contributes to (a fixed ×7 fanout of the already-deduped
# user-day table, NOT of raw events), then one groupBy(day) counts
# distinct users. All integer days/counts; WAU days outside the
# observed calendar are clipped so every reported day aggregates a
# full in-range window.
# --------------------------------------------------------------------------


@query(
    "q3o_rolling_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cal AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ud),
    contrib AS (
      SELECT ud.user_id, ud.d + CAST(o.o AS INTEGER) AS target
      FROM ud CROSS JOIN (SELECT UNNEST(RANGE(0, 7)) AS o) o, cal
      WHERE ud.d + CAST(o.o AS INTEGER) <= cal.hi
    ),
    wau AS (
      SELECT target AS d, COUNT(DISTINCT user_id) AS wau
      FROM contrib GROUP BY target
    ),
    dau AS (
      SELECT d, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY d
    )
    SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q3o_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    cal = ud.agg(F.max("d").alias("hi"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("o")).alias("target"))
        .crossJoin(F.broadcast(cal))
        .filter(F.col("target") <= F.col("hi"))
    )
    wau = contrib.groupBy(F.col("target").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    )
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    return dau.join(wau, "day").select("day", "dau", "wau")


# --------------------------------------------------------------------------
# q3p — distribution-free median CI by order statistics (the
# sign-test / binomial-normal bounds): rank_lo = ⌊n/2 − z√n/2⌋,
# rank_hi = ⌈n/2 + z√n/2⌉ + 1, clamped to [1, n]; the CI endpoints
# are the values AT those ranks — no distributional assumption, the
# uncertainty companion to every median we report. Ranks are selected
# DISTRIBUTED via ordering.global_rank (bucket-keyed two-pass, no
# single-reducer sort); the rank arithmetic is the identical
# floor/ceil-of-double expression on both engines, and equal-value
# rank ties cannot change the selected VALUE.
# --------------------------------------------------------------------------

_MCI_Z = 1.959963984540054  # two-sided 95%


@query(
    "q3p_median_ci",
    oracle=f"""
    WITH v AS (
      SELECT value FROM events WHERE event_type = 'purchase'
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    ks AS (
      SELECT n,
             GREATEST(CAST(1 AS BIGINT),
               CAST(FLOOR(n / 2.0 - {_MCI_Z} * SQRT(CAST(n AS DOUBLE)) / 2.0)
                    AS BIGINT)) AS k_lo,
             LEAST(n,
               CAST(CEIL(n / 2.0 + {_MCI_Z} * SQRT(CAST(n AS DOUBLE)) / 2.0)
                    AS BIGINT) + 1) AS k_hi
      FROM n_
    ),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rk FROM v
    )
    SELECT ks.n,
           ROUND((SELECT QUANTILE_CONT(value, 0.5) FROM v), 6) AS median,
           MIN(CASE WHEN rk = k_lo THEN value END) AS ci_lo,
           MIN(CASE WHEN rk = k_hi THEN value END) AS ci_hi
    FROM ranked, ks
    GROUP BY ks.n
    """,
)
def q3p_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "purchase").select("value")
    n_ = v.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nd = F.col("n").cast("double")
    ks = n_.select(
        "n",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(nd / 2.0 - F.lit(_MCI_Z) * F.sqrt(nd) / 2.0).cast("bigint"),
        ).alias("k_lo"),
        F.least(
            F.col("n"),
            F.ceil(nd / 2.0 + F.lit(_MCI_Z) * F.sqrt(nd) / 2.0).cast("bigint")
            + 1,
        ).alias("k_hi"),
    )
    med = v.agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("median"))
    ranked = global_rank(v, ["value"], rank_col="rk")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("n")
        .agg(
            F.min(F.when(F.col("rk") == F.col("k_lo"), F.col("value"))).alias(
                "ci_lo"
            ),
            F.min(F.when(F.col("rk") == F.col("k_hi"), F.col("value"))).alias(
                "ci_hi"
            ),
        )
        .crossJoin(F.broadcast(med))
        .select("n", "median", "ci_lo", "ci_hi")
    )


# --------------------------------------------------------------------------
# q3q — calendar anomaly flags via day-of-week-adjusted z-scores: a
# raw daily-count threshold fires every weekend; the operational
# anomaly page compares each day against ITS OWN weekday's
# distribution. Daily counts are exact integers; per-dow mean and
# variance come from exact Σc/Σc² (leave-one-out so a day is never
# compared against itself); the z expression is the only float,
# rounded at 9 dp. Two map-side-combinable aggregations + a 7-row
# broadcast join.
# --------------------------------------------------------------------------


@query(
    "q3q_dow_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(EXTRACT(ISODOW FROM ts) AS INTEGER) AS dow,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    dows AS (
      SELECT dow, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS scc
      FROM daily GROUP BY dow
    ),
    z AS (
      SELECT d, daily.dow, c,
             (CAST(c AS DOUBLE)
              - CAST(sc - c AS DOUBLE) / (n - 1))
             / NULLIF(SQRT(CAST(scc - c * c AS DOUBLE) / (n - 1)
                           - (CAST(sc - c AS DOUBLE) / (n - 1))
                             * (CAST(sc - c AS DOUBLE) / (n - 1))), 0) AS zs
      FROM daily JOIN dows ON daily.dow = dows.dow
      WHERE n > 2
    )
    SELECT d AS day, dow, CAST(c AS BIGINT) AS n_events,
           ROUND(zs, 9) AS z_score
    FROM z WHERE ABS(ROUND(zs, 9)) >= 1.5
    """,
)
def q3q_dow_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("d"),
        (F.weekday("ts") + 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    dows = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    # leave-one-out mean/std of the day's own weekday
    loo_mean = (F.col("sc") - F.col("c")).cast("double") / (F.col("n") - 1)
    loo_var = (F.col("scc") - F.col("c") * F.col("c")).cast("double") / (
        F.col("n") - 1
    ) - loo_mean * loo_mean
    zs = (F.col("c").cast("double") - loo_mean) / F.nullif(
        F.sqrt(loo_var), F.lit(0.0)
    )
    return (
        daily.join(F.broadcast(dows), "dow")
        .filter(F.col("n") > 2)
        .select(
            F.col("d").alias("day"),
            "dow",
            F.col("c").cast("bigint").alias("n_events"),
            F.round(zs, 9).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) >= 1.5)
    )


# --------------------------------------------------------------------------
# q3r — strict ordered funnel with per-step timeout. Distinct from
# its q3 siblings: q3a's funnel is two stages via conditional MIN
# aggregates with NO step deadline, q3g attributes revenue to
# touches, q3i mines free-form paths; this demands view → click →
# purchase IN ORDER with each step within 24h of the previous step's
# FIRST qualifying event — a sequential dependence a single
# conditional aggregation cannot express (step k's filter needs step
# k-1's result). Sequential dependence is expressed as a
# chain of per-user MIN aggregations joined forward — every join is
# on user_id (wide key, shuffle-safe), each stage's state is one
# timestamp per surviving user, and no window ever sorts a low-
# cardinality key. Conversion rates are single divisions of exact
# COUNT(DISTINCT)-free integers (each stage is already one row per
# user), IEEE-identical across engines.
# --------------------------------------------------------------------------


@query(
    "q3r_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase,
           CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
             / (SELECT COUNT(*) FROM s1) AS conv_click,
           CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / (SELECT COUNT(*) FROM s2) AS conv_purchase
    """,
)
def q3r_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            (F.col("n_click").cast("double") / F.col("n_view")).alias("conv_click"),
            (F.col("n_purchase").cast("double") / F.col("n_click")).alias(
                "conv_purchase"
            ),
        )
    )


# --------------------------------------------------------------------------
# q3s — Benjamini-Hochberg FDR correction: the multiple-testing layer
# every per-segment anomaly scan (q3q, q4m, q4n) needs before acting
# on its per-group "significant" flags. Per (event_type, isodow)
# group, a one-sample location test of the group's mean value against
# the corpus mean using the CHEBYSHEV p-bound p = min(1, sigma^2 /
# (n*dev^2)) — distribution-free and, unlike a normal/chi-square
# tail, exactly computable in both engines (no erfc/gamma in either
# SQL dialect). BH then sorts the m p-values ascending and rejects
# ranks 1..k* where k* = max{k : p_(k) <= k*alpha/m}.
#
# Determinism: group sums are exact integers (micros via floor-scale,
# squared micros in a decimal(38,0)/HUGEINT accumulator — micros^2
# ~6e16 per row overflows int64 at ~100 rows); every double is then
# produced by the same left-associated sequence of correctly-rounded
# IEEE ops in both engines, so p is bit-identical and the rank/
# threshold comparisons agree. Scale: the raw-data pass is one
# combine-friendly groupBy; the rank window runs over m = |types|x7
# rows — granularity-bounded, never data-bounded (same contract as
# q1n's summary sweep).
# --------------------------------------------------------------------------


@query(
    "q3s_bh_fdr",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(EXTRACT(ISODOW FROM ts) AS INTEGER) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS s,
             SUM(CAST(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS ssq
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
             SUM(ssq) AS sssq, CAST(COUNT(*) AS BIGINT) AS m
      FROM b
    ),
    p AS (
      SELECT b.event_type, b.dow, b.n, g.m,
             CASE WHEN CAST(b.s AS DOUBLE) / b.n - CAST(g.ss AS DOUBLE) / g.nn = 0
                  THEN 1.0
                  ELSE LEAST(1.0,
                    (CAST(g.sssq AS DOUBLE) / g.nn
                     - (CAST(g.ss AS DOUBLE) / g.nn)
                       * (CAST(g.ss AS DOUBLE) / g.nn))
                    / (CAST(b.n AS DOUBLE)
                       * (CAST(b.s AS DOUBLE) / b.n - CAST(g.ss AS DOUBLE) / g.nn)
                       * (CAST(b.s AS DOUBLE) / b.n - CAST(g.ss AS DOUBLE) / g.nn)))
             END AS p
      FROM b, g
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY p, event_type, dow) AS rk FROM p
    ),
    k AS (
      SELECT MAX(CASE WHEN p <= CAST(rk AS DOUBLE) * 0.05 / m THEN rk ELSE 0 END)
               AS kstar
      FROM r
    )
    SELECT event_type, dow, n, ROUND(p, 9) AS p_chebyshev,
           CAST(rk AS BIGINT) AS p_rank, rk <= kstar AS rejected
    FROM r, k
    """,
)
def q3s_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    mic = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
    b = e.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(mic).cast("bigint").alias("s"),
        F.sum(mic.cast("decimal(38,0)") * mic).alias("ssq"),
    )
    g = b.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum("ssq").alias("sssq"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    x = b.crossJoin(F.broadcast(g))
    dev = F.col("s").cast("double") / F.col("n") - F.col("ss").cast(
        "double"
    ) / F.col("nn")
    gvar = F.col("sssq").cast("double") / F.col("nn") - (
        F.col("ss").cast("double") / F.col("nn")
    ) * (F.col("ss").cast("double") / F.col("nn"))
    p = F.when(dev == 0, F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), gvar / (F.col("n").cast("double") * dev * dev))
    )
    # rank window over m = |types|x7 rows — granularity-bounded
    wr = Window.orderBy("p", "event_type", "dow")
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = x.select(
        "event_type", "dow", "n", "m", p.alias("p")
    ).withColumn("rk", F.row_number().over(wr))
    kstar = F.max(
        F.when(
            F.col("p")
            <= F.col("rk").cast("double") * F.lit(0.05) / F.col("m"),
            F.col("rk"),
        ).otherwise(F.lit(0))
    ).over(wall)
    return ranked.select(
        "event_type",
        "dow",
        "n",
        F.round("p", 9).alias("p_chebyshev"),
        F.col("rk").cast("bigint").alias("p_rank"),
        (F.col("rk") <= kstar).alias("rejected"),
    )


# --------------------------------------------------------------------------
# q3t — isotonic regression (monotone calibration curve): the
# weighted least-squares monotone fit of mean value vs hour-of-day,
# per event_type. Instead of the sequential PAV algorithm (driver-
# side, order-dependent), both engines evaluate the closed-form
# min-max characterization ŷ_k = max_{i<=k} min_{j>=k} avg(y_i..y_j)
# over the per-(type,hour) summary: the raw-data pass is one
# combine-friendly groupBy; the (i,k,j) triple join runs over 24-row
# per-type summaries — granularity-bounded (<= |types|*24^3 rows),
# never data-bounded. Every candidate average is a SINGLE division of
# exact integer micros sums (prefix sums over 24 rows), so each
# double is correctly rounded and identical across engines, and
# min/max over identical doubles is order-independent → the fit is
# bit-identical with no tolerance needed.
# --------------------------------------------------------------------------


@query(
    "q3t_isotonic",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, h, n, s,
             CAST(SUM(n) OVER w AS BIGINT) AS cn,
             CAST(SUM(s) OVER w AS BIGINT) AS cs
      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ),
    mins AS (
      SELECT k.event_type, k.h AS hk, k.n AS n, i.h AS hi,
             MIN(CAST(j.cs - i.cs + i.s AS DOUBLE)
                 / CAST(j.cn - i.cn + i.n AS DOUBLE)) AS mn
      FROM c i
      JOIN c k ON i.event_type = k.event_type AND i.h <= k.h
      JOIN c j ON j.event_type = k.event_type AND j.h >= k.h
      GROUP BY 1, 2, 3, 4
    )
    SELECT event_type, hk AS hour, n, MAX(mn) / 1000000.0 AS iso_fit
    FROM mins GROUP BY 1, 2, 3
    """,
)
def q3t_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    mic = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
    b = e.groupBy("event_type", F.hour("ts").cast("int").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(mic).cast("bigint").alias("s"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = b.select(
        "event_type",
        "h",
        "n",
        "s",
        F.sum("n").over(w).cast("bigint").alias("cn"),
        F.sum("s").over(w).cast("bigint").alias("cs"),
    )
    i, k, j = c.alias("i"), c.alias("k"), c.alias("j")
    avg = (
        F.col("j.cs") - F.col("i.cs") + F.col("i.s")
    ).cast("double") / (
        F.col("j.cn") - F.col("i.cn") + F.col("i.n")
    ).cast("double")
    mins = (
        i.join(
            k,
            (F.col("i.event_type") == F.col("k.event_type"))
            & (F.col("i.h") <= F.col("k.h")),
        )
        .join(
            j,
            (F.col("j.event_type") == F.col("k.event_type"))
            & (F.col("j.h") >= F.col("k.h")),
        )
        .groupBy(
            F.col("k.event_type").alias("event_type"),
            F.col("k.h").alias("hk"),
            F.col("k.n").alias("n"),
            F.col("i.h").alias("hi"),
        )
        .agg(F.min(avg).alias("mn"))
    )
    return mins.groupBy("event_type", F.col("hk").alias("hour"), "n").agg(
        (F.max("mn") / F.lit(1000000.0)).alias("iso_fit")
    )


# --------------------------------------------------------------------------
# q1s — interval union / coverage: each event opens a fixed 5-minute
# activity interval [ts, ts+300s); per user, merge overlapping
# intervals and report the island count and total covered seconds.
# Distinct from q97's sessionization (gap threshold between POINT
# events — a session never knows how long activity lasted) and q17's
# pair overlaps (which enumerates pairs, not coverage): this is the
# "minutes of activity" / machine-uptime measure.
# Classic gaps-and-islands: prev running MAX(end) over the per-user
# order detects island starts; a running SUM of starts numbers the
# islands; per-island coverage = MAX(end) − MIN(start). All windows
# partition on user_id (wide key), all arithmetic integer epoch
# seconds — exact in both engines.
# --------------------------------------------------------------------------


@query(
    "q1s_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             CAST(EPOCH_US(ts) AS BIGINT) AS s,
             CAST(EPOCH_US(ts) AS BIGINT) + 300000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island_id
      FROM flagged
    ),
    per_island AS (
      SELECT user_id, island_id,
             MIN(s) AS island_start, MAX(e) AS island_end
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(CAST(SUM(island_end - island_start) AS BIGINT) // 1000000
                AS BIGINT) AS covered_seconds
    FROM per_island GROUP BY user_id
    """,
)
def q1s_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").cast("bigint").alias("s"),
        (F.unix_micros("ts").cast("bigint") + 300000000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0)
        .otherwise(1)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island_id")
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("island_end") - F.col("island_start"))
            .cast("bigint")
            .alias("covered_us"),
        )
        .select(
            "user_id",
            "n_islands",
            F.expr("CAST(covered_us DIV 1000000 AS BIGINT)").alias(
                "covered_seconds"
            ),
        )
    )


# --------------------------------------------------------------------------
# q3u — rolling distinct via HLL PARTIAL MERGES: the sketch scale
# path for q3o's exact rolling WAU. Exact rolling distincts shuffle
# every (user, day)×7 contribution; the sketch path aggregates ONE
# ~4 KB HLL sketch per day (map-side combinable) and answers every
# 7-day window by merging seven sketch rows — at 100 TB that is the
# difference between reshuffling the user corpus daily and moving a
# few KB per day. The day-grid theta join runs over |days| rows
# (calendar-bounded, broadcast). Register max-merge makes the
# estimate deterministic and partition-invariant. Envelope: the exact
# DAU/WAU (oracle-recomputable, q3o's arithmetic) plus the sketch
# estimate landing within 5%·WAU (lgConfigK=12 → rsd ≈ 1.6%).
# --------------------------------------------------------------------------


@query(
    "q3u_rolling_hll",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cal AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ud),
    contrib AS (
      SELECT ud.user_id, ud.d + CAST(o.o AS INTEGER) AS target
      FROM ud CROSS JOIN (SELECT UNNEST(RANGE(0, 7)) AS o) o, cal
      WHERE ud.d + CAST(o.o AS INTEGER) <= cal.hi
    ),
    wau AS (
      SELECT target AS d, COUNT(DISTINCT user_id) AS wau
      FROM contrib GROUP BY target
    ),
    dau AS (
      SELECT d, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY d
    )
    SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           TRUE AS hll_ok
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q3u_rolling_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    cal = ud.agg(F.max("d").alias("hi"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("o")).alias("target"))
        .crossJoin(F.broadcast(cal))
        .filter(F.col("target") <= F.col("hi"))
    )
    wau = contrib.groupBy(F.col("target").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    )
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    # sketch arm: one HLL per day, 7-day windows answered by merging
    # seven sketch rows over the calendar-bounded day grid
    daily_sk = ud.groupBy("d").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    a, b = daily_sk.alias("a"), daily_sk.alias("b")
    rolled = (
        a.select(F.col("a.d").alias("day"))
        .join(
            F.broadcast(b),
            (F.col("b.d") <= F.col("day"))
            & (F.col("b.d") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
    )
    return (
        dau.join(wau, "day")
        .join(rolled, "day")
        .select(
            "day",
            "dau",
            "wau",
            (
                F.abs(F.col("est") - F.col("wau"))
                <= F.lit(0.05) * F.col("wau")
            ).alias("hll_ok"),
        )
    )


# --------------------------------------------------------------------------
# q3v — duration-CAPPED sessionization: a new session starts when the
# inter-event gap exceeds 30 min (q97's rule) OR when the running
# session would exceed a 2 h duration cap — the product-analytics
# convention that bounds session length. The cap makes the rule
# SEQUENTIALLY dependent (event i's session depends on the current
# session's start, which depends on every earlier decision), so no
# fixed window stack can express it: q97/q9o stay pure-window because
# they are gap-only. Spark side: applyInPandas per user — the session
# walk is a per-user O(n) scan, user_id is a wide key, and group
# state is one (start, prev) pair; output key type derives from the
# input schema (the q4p lesson). Oracle: a recursive CTE walks rn →
# rn+1 carrying sess_start (depth = max events/user ≈ 100 at every
# fixture SF). All arithmetic integer micros; spans reported via
# integer DIV on both sides (q1s lesson).
# --------------------------------------------------------------------------

_SESS_GAP_US = 1_800_000_000
_SESS_CAP_US = 7_200_000_000


@query(
    "q3v_capped_sessions",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT user_id, CAST(EPOCH_US(ts) AS BIGINT) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    walk(user_id, rn, t, sess_start) AS (
      SELECT user_id, rn, t, t FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn, b.t,
             CASE WHEN b.t - w.t > {_SESS_GAP_US}
                    OR b.t - w.sess_start > {_SESS_CAP_US}
                  THEN b.t ELSE w.sess_start END
      FROM walk w JOIN base b
        ON b.user_id = w.user_id AND b.rn = w.rn + 1
    ),
    sess AS (
      SELECT user_id, sess_start,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(MAX(t) - sess_start AS BIGINT) AS span_us
      FROM walk GROUP BY user_id, sess_start
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(MAX(span_us) // 1000000 AS BIGINT) AS max_session_span_seconds
    FROM sess GROUP BY user_id
    """,
)
def q3v_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").cast("bigint").alias("t"),
        "event_id",
    )
    key_type = e.schema["user_id"].dataType.simpleString()
    out_schema = (
        f"user_id {key_type}, n_sessions bigint, "
        "max_session_events bigint, max_session_span_seconds bigint"
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["t", "event_id"])
        ts = pdf["t"].to_numpy()
        # NumPy scan instead of a per-event Python loop: gap breaks
        # are one vectorized diff; inside each gap segment the cap
        # rule is sequential ONLY at session granularity — each next
        # session start is the first event with t > start + CAP,
        # found by searchsorted on the sorted array. Python-level
        # iterations = #sessions, not #events (a session spans >= CAP
        # microseconds unless a gap break ends the segment first), so
        # a 10k-event user with 100 sessions costs 100 iterations.
        gap_breaks = np.flatnonzero(np.diff(ts) > _SESS_GAP_US) + 1
        seg_bounds = np.concatenate(([0], gap_breaks, [len(ts)]))
        starts = []  # (start, n_events, span_us) per closed session
        for a, b in zip(seg_bounds[:-1], seg_bounds[1:]):
            i = int(a)
            while i < b:
                s0 = ts[i]
                j = min(
                    int(np.searchsorted(ts, s0 + _SESS_CAP_US, side="right")),
                    int(b),
                )
                starts.append((s0, j - i, ts[j - 1] - s0))
                i = j
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_sessions": [len(starts)],
                "max_session_events": [max(s[1] for s in starts)],
                "max_session_span_seconds": [
                    max(s[2] for s in starts) // 1000000
                ],
            }
        )

    return e.groupBy("user_id").applyInPandas(walk, out_schema)


# --------------------------------------------------------------------------
# q3x — change-point LOCATION estimation per event type (the CUSUM
# location estimator: argmax_t |n·S_t − t·S_n| over the daily count
# series — Page 1954 / Pettitt's statistic numerator). q4s is the
# control-chart arm (did the level shift? final/max/resets); this is
# the segmentation arm (WHERE did it shift?). Counts are exact
# integers, so D_t = n·S_t − t·S_n is pure BIGINT — no scaling, no
# float drift, bit-identical in both engines. Ties broken by earliest
# day. Scale shape: daily rollup is one map-side-combinable groupBy;
# prefix sums and the argmax are windows PARTITIONED BY event_type
# (series length = #days per type — bounded, never a global window);
# per-type totals join back on event_type. Output: one row per event
# type — a FULL listing by spec (|event_type| is a small dimension).
# --------------------------------------------------------------------------


@query(
    "q3x_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, day, c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
             SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS s
      FROM daily
    ), tot AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS tot
      FROM daily GROUP BY 1
    )
    SELECT event_type, day AS cp_day,
           CAST(ABS(tot.n * seq.s - seq.t * tot.tot) AS BIGINT) AS d_abs,
           CAST(tot.n AS BIGINT) AS n_days
    FROM seq JOIN tot USING (event_type)
    WHERE seq.t < tot.n
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY event_type
      ORDER BY ABS(tot.n * seq.s - seq.t * tot.tot) DESC, day ASC) = 1
    ORDER BY event_type
    """,
)
def q3x_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.changepoint import cusum_location

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        cusum_location(daily, "event_type", "day", "c")
        .withColumnRenamed("n_points", "n_days")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q9w — EXACT distinct counting via bitmap aggregates (round-10 mint;
# Spark 3.5 bitmap_bucket_number / bitmap_bit_position /
# bitmap_construct_agg / bitmap_or_agg / bitmap_count): the exact,
# MERGEABLE alternative between COUNT(DISTINCT) and the HLL sketch
# rows (q3u/q30). COUNT(DISTINCT) shuffles every raw value to its
# group; a bitmap carries up to 32k presence bits in ≤4 KB, so the
# shuffle payload is O(id-range/32k) fixed-size blobs per group and —
# unlike HLL — the count that comes back is EXACT. The same per-bucket
# bitmaps re-merge across groups with bitmap_or_agg (demonstrated by
# the all-types total), which is the semi-lattice property a rollup
# materialization needs: build per-(group, bucket) once, OR-merge for
# any coarser grouping without touching raw data again. Oracle is
# plain COUNT(DISTINCT) twice.
# --------------------------------------------------------------------------


@query(
    "q9w_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
             AS n_users_all
    FROM events GROUP BY event_type
    """,
)
def q9w_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    per_bucket = e.select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bkt"),
        F.bitmap_bit_position("user_id").alias("pos"),
    ).groupBy("event_type", "bkt").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    by_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )
    total = (
        per_bucket.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users_all"))
    )
    return by_type.join(F.broadcast(total))
