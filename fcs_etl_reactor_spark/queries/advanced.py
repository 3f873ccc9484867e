"""Advanced composites: stream-stream joins and SCD2 history builds.

- **q9g stream-stream interval join**: the one Structured Streaming
  join class the T-family didn't yet evidence — BOTH sides unbounded,
  matched on key + event-time range. Each side is watermarked and the
  join condition bounds p.ts to (c.ts, c.ts + 1 h], so the state
  store retains only rows inside the watermark horizon — at 100 TB/d
  the state is bounded by (horizon × arrival rate), not history.
  Inner-join matches are emitted as soon as both rows exist, so the
  availableNow replay's final sink content equals the batch range
  join, stated directly as the oracle.
- **q7m SCD2 history**: the warehouse slowly-changing-dimension build
  — collapse each customer's order-status timeline into change runs
  (gaps-and-islands: lag → change flag → prefix-sum group id), emit
  [valid_from, valid_to) intervals with an is_current flag. One
  shuffle on the partition key; both window passes and the run
  aggregation reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

# --------------------------------------------------------------------------
# q9g — stream-stream interval join: click → purchase attribution
# within 1 hour per user.
# --------------------------------------------------------------------------


@query(
    "q9g_stream_stream_join",
    oracle="""
    SELECT
      c.event_id AS c_event_id,
      p.event_id AS p_event_id,
      c.user_id,
      EPOCH_US(p.ts) - EPOCH_US(c.ts) AS gap_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def q9g_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream ⋈ stream: two readStream sources over the same
    event log, inner-joined on user + (0, 1 h] event-time interval,
    replayed availableNow into an append memory sink."""
    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q9g_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")

    clicks = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "c_event_id",
        "p_event_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    q = to_memory_sink(joined, sink, output_mode="append")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q7m — SCD Type-2 dimension build from the order-status timeline.
# --------------------------------------------------------------------------


@query(
    "q7m_scd2_history",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             LAG(o_orderstatus) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ),
    grp AS (
      SELECT *,
             SUM(CASE WHEN prev_status IS NULL
                        OR prev_status <> o_orderstatus THEN 1 ELSE 0 END)
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS g
      FROM seq
    ),
    runs AS (
      SELECT o_custkey, g, o_orderstatus,
             MIN(o_orderdate) AS valid_from,
             COUNT(*) AS n_orders
      FROM grp GROUP BY o_custkey, g, o_orderstatus
    )
    SELECT
      o_custkey,
      o_orderstatus,
      valid_from,
      LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY g) AS valid_to,
      n_orders,
      (LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY g) IS NULL)
        AS is_current
    FROM runs
    """,
)
def q7m_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run collapse → [valid_from, valid_to)
    intervals. The change flag (lag ≠ current) prefix-summed over the
    same (key, time) ordering assigns run ids without a self-join;
    run boundaries then become the SCD2 validity interval via LEAD.
    Ties on o_orderdate are broken by o_orderkey on BOTH engines, so
    run ids are deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    grp = seq.withColumn(
        "g",
        F.sum(
            F.when(
                F.col("prev_status").isNull()
                | (F.col("prev_status") != F.col("o_orderstatus")),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = grp.groupBy("o_custkey", "g", "o_orderstatus").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wv = Window.partitionBy("o_custkey").orderBy("g")
    return runs.select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_orders",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


_N_SHARDS = 16


@query(
    "q6i_shard_assignment",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rk
      FROM documents
    )
    SELECT CAST(rk % {_N_SHARDS} AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           CAST(MIN(rk) AS BIGINT) AS min_rank,
           CAST(MAX(rk) AS BIGINT) AS max_rank
    FROM ranked
    GROUP BY shard
    """,
)
def q6i_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 applied: deterministic round-robin sharding for training
    loaders. The global rank comes from the DISTRIBUTED two-pass
    zipWithIndex (operators/ordering.global_rank — range partition +
    per-partition offsets; the driver holds #partitions integers,
    never rows), so `rank % N` yields N shards balanced to ±1 doc
    REGARDLESS of partitioning — every loader re-derives the same
    shard membership from (order key, N) alone. The oracle replays
    the rank with a window (fine at sf; the operator exists because
    that window would be a single reducer at 100 TB)."""
    from fcs_etl_reactor_spark.operators.ordering import global_rank

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    ranked = global_rank(d, ["doc_id"], rank_col="rk")
    return (
        ranked.withColumn("rk", F.col("rk") - 1)
        .groupBy((F.col("rk") % _N_SHARDS).cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("rk").cast("bigint").alias("min_rank"),
            F.max("rk").cast("bigint").alias("max_rank"),
        )
    )


# --------------------------------------------------------------------------
# q9h — stream-stream LEFT OUTER interval join: q9g's attribution with
# the unmatched clicks kept (NULL purchase) — the state-EVICTION side
# of outer-join semantics: Spark emits a left row's null-match only
# once the watermark proves no future right row can land in its
# interval.
#
# Determinism device: append-mode outer joins withhold rows whose
# eligibility (c_ts + 1 h) is above the FINAL watermark, which on a
# finite replay depends on max event time — so the spool for this
# query carries one far-future FLUSH pair (click+purchase, event_id
# -1/-2, max_ts + 3 h). The flush purchase advances the right-side
# watermark past every real click's eligibility (its own interval is
# empty, 3 h past the last real event, so it matches nothing), making
# EVERY real unmatched click deterministically emitted; the flush
# click itself stays above the final watermark, is withheld by the
# engine, and is filtered out of the sink read regardless. The result
# is then EXACTLY the batch left interval join over the real events —
# stated directly as the oracle.
# --------------------------------------------------------------------------

_FLUSH_DIRS: dict[str, str] = {}


def _events_stream_dir_flushed(spark: SparkSession, sf_dir: str) -> str:
    """events spool + trailing watermark-flush pair (ids -1/-2)."""
    import os

    from fcs_etl_reactor_spark.io import source_fingerprint

    key = sf_dir.rstrip("/")
    if key not in _FLUSH_DIRS:
        dest = os.path.join(
            "/tmp/spark_graft_stream_src_flush",
            key.strip("/").replace("/", "_")
            + "_"
            + source_fingerprint(sf_dir, "events"),
        )
        if not os.path.exists(os.path.join(dest, "_SUCCESS")):
            e = load(spark, sf_dir, "events")
            mx = e.agg(F.max("ts").alias("mx"))
            flush = (
                mx.select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.lit(-1).cast("bigint").alias("event_id"),
                                (F.col("mx") + F.expr("INTERVAL 3 HOURS")).alias("ts"),
                                F.lit(-1).cast("bigint").alias("user_id"),
                                F.lit("click").alias("event_type"),
                                F.lit(0.0).alias("value"),
                                F.lit("{}").alias("props"),
                            ),
                            F.struct(
                                F.lit(-2).cast("bigint").alias("event_id"),
                                (F.col("mx") + F.expr("INTERVAL 3 HOURS")).alias("ts"),
                                F.lit(-1).cast("bigint").alias("user_id"),
                                F.lit("purchase").alias("event_type"),
                                F.lit(0.0).alias("value"),
                                F.lit("{}").alias("props"),
                            ),
                        )
                    ).alias("r")
                ).select("r.*")
            )
            # pid-tmp + atomic rename (the io.py/storage.py pattern):
            # a concurrent process must see the spool complete-or-
            # absent — a half-written spool missing the flush pair
            # would withhold unmatched clicks nondeterministically
            tmp = f"{dest}.build.{os.getpid()}"
            e.select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            ).unionByName(flush).repartition(1).write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, dest)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
            assert os.path.exists(os.path.join(dest, "_SUCCESS")), dest
        _FLUSH_DIRS[key] = dest
    return _FLUSH_DIRS[key]


@query(
    "q9h_stream_stream_left_outer",
    oracle="""
    SELECT
      c.event_id AS c_event_id,
      p.event_id AS p_event_id,
      c.user_id
    FROM events c
    LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    """,
)
def q9h_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir_flushed(spark, sf_dir)
    sink = "q9h_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")

    clicks = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("c_event_id", "p_event_id", "user_id")
    q = to_memory_sink(joined, sink, output_mode="append")
    q.awaitTermination()
    # drop the flush click (withheld by the engine anyway — belt and braces)
    return spark.table(sink).filter(F.col("c_event_id") >= 0)


# --------------------------------------------------------------------------
# q9n — stream-stream FULL OUTER interval join (the X20 family's last
# member after inner q9g and left-outer q9h): click→purchase
# attribution where BOTH unmatched sides must surface — clicks that
# never converted AND purchases with no preceding click. Same flush
# mechanics as q9h: the far-future flush purchase advances the right
# watermark so unmatched clicks emit, and the flush CLICK advances
# the LEFT watermark so unmatched purchases emit (full outer holds
# right-side rows until the left watermark proves no future click can
# match). Both flush rows share one timestamp, so p.ts > c.ts keeps
# them from matching each other; the flush click is withheld by the
# engine and both are filtered belt-and-braces. The result is exactly
# the batch full interval join — stated directly as the oracle.
# --------------------------------------------------------------------------


@query(
    "q9n_stream_stream_full_outer",
    oracle="""
    WITH c AS (
      SELECT event_id AS c_event_id, user_id, ts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS p_event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.c_event_id, p.p_event_id,
           COALESCE(c.user_id, p.user_id) AS user_id
    FROM c FULL JOIN p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q9n_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir_flushed(spark, sf_dir)
    sink = "q9n_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")

    clicks = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    ).select(
        "c_event_id",
        "p_event_id",
        F.coalesce("user_id", "p_user_id").alias("user_id"),
    )
    q = to_memory_sink(joined, sink, output_mode="append")
    q.awaitTermination()
    return spark.table(sink).filter(
        F.coalesce(F.col("c_event_id"), F.lit(0)) >= 0
    ).filter(F.coalesce(F.col("p_event_id"), F.lit(0)) >= -1)
