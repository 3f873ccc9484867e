"""Driver-facing evidence for the streaming tail (SURVEY.md §2.10
T4 watermark/late-data, T5 streaming dedup, T7 stream-static join).

Same construction as q98/q99: a TRUE Structured Streaming execution
(readStream → stateful op → availableNow trigger → memory sink) whose
final table is deterministic by construction, restated as batch SQL
for the oracle.

- q9a (T4): a TWO-file source replayed one file per micro-batch —
  recent slice first (advancing the watermark to max(ts) − 1 h), the
  out-of-order backlog second. Append mode emits exactly the windows
  the watermark has closed and WITHHOLDS every window it hasn't (the
  trailing hour) — the watermark contract as a value-hash assertion.
  (Measured on this Spark: the aggregation ADMITS late input rows —
  numRowsDroppedByWatermark=0 — the watermark bounds state eviction
  and append emission, not input admission; the oracle states that
  exact semantic.)
- q9b (T5): the SAME events file copied twice into the source dir;
  dropDuplicatesWithinWatermark collapses the double feed to exactly
  one row per event_id — the oracle is plain SELECT FROM events.
- q9c (T7): stream joined to a broadcast static dim per micro-batch
  (no state), then a complete-mode rollup.

Scale: watermark state is bounded by horizon × key cardinality; the
dedup state holds only keys younger than the watermark; the static
side of q9c is a bounded dim (broadcast). Nothing here is
local-mode-specific.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import dsum, o_dsum
from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

_SPLIT_ROOT = "/tmp/spark_graft_stream_split"
_DOUBLE_ROOT = "/tmp/spark_graft_stream_double"

#: Recent/late split point: max(ts) − 26 h. Late windows end ≥ 25 h
#: below the final watermark (max − 1 h) — no boundary ties possible.
_SPLIT_HOURS = 26


def _one_file(spark: SparkSession, df, scratch: str) -> str:
    """Write df as a single parquet part file; return its path."""
    df.repartition(1).write.mode("overwrite").parquet(scratch)
    part = next(
        f for f in os.listdir(scratch)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    return os.path.join(scratch, part)


def _split_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Two-file source: 00_recent.parquet (ts ≥ max−26 h, older mtime →
    replayed first) then 01_late.parquet. Built once per sf_dir."""
    from fcs_etl_reactor_spark.io import source_fingerprint

    key = (
        sf_dir.rstrip("/").strip("/").replace("/", "_")
        + "_"
        + source_fingerprint(sf_dir, "events")
    )
    dest = os.path.join(_SPLIT_ROOT, key)
    marker = os.path.join(dest, "_READY")
    if not os.path.exists(marker):
        e = load(spark, sf_dir, "events")
        cutoff = F.max("ts") - F.expr(f"INTERVAL {_SPLIT_HOURS} HOURS")
        t0 = e.agg(cutoff.alias("t0")).collect()[0][0]  # bounded: 1 row
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest, exist_ok=True)
        import time

        now = time.time()
        for fname, cond, mtime in [
            ("00_recent.parquet", F.col("ts") >= F.lit(t0), now - 60),
            ("01_late.parquet", F.col("ts") < F.lit(t0), now - 30),
        ]:
            scratch = dest + ".scratch"
            part = _one_file(spark, e.filter(cond), scratch)
            final = os.path.join(dest, fname)
            shutil.move(part, final)
            shutil.rmtree(scratch, ignore_errors=True)
            os.utime(final, (mtime, mtime))  # file source orders by mtime
        with open(marker, "w") as fh:
            fh.write("ok")
    return dest


def _double_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """The full events table twice (two identical-content files) —
    every event_id arrives exactly twice."""
    from fcs_etl_reactor_spark.io import source_fingerprint

    key = (
        sf_dir.rstrip("/").strip("/").replace("/", "_")
        + "_"
        + source_fingerprint(sf_dir, "events")
    )
    dest = os.path.join(_DOUBLE_ROOT, key)
    marker = os.path.join(dest, "_READY")
    if not os.path.exists(marker):
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest, exist_ok=True)
        scratch = dest + ".scratch"
        part = _one_file(spark, load(spark, sf_dir, "events"), scratch)
        shutil.copy(part, os.path.join(dest, "copy1.parquet"))
        shutil.move(part, os.path.join(dest, "copy2.parquet"))
        shutil.rmtree(scratch, ignore_errors=True)
        with open(marker, "w") as fh:
            fh.write("ok")
    return dest


def _sink_name(prefix: str, src: str) -> str:
    return prefix + "_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")


# --------------------------------------------------------------------------
# q9a — T4: watermark-gated append emission under out-of-order replay.
# The recent slice is replayed first, so the watermark is already at
# max(ts) − 1 h when the backlog arrives; at termination the sink holds
# exactly the windows whose end the watermark passed — the trailing
# hour of windows exists in the source but is provably withheld. File
# order (mtime-ascending, 30 s apart) makes the final watermark — and
# hence the emitted set — deterministic.
# --------------------------------------------------------------------------


@query(
    "q9a_watermark_late",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    w AS (
      SELECT MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600000000 AS BIGINT))
               AS win_start,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT w.win_start, w.event_type, w.n FROM w, mx
    WHERE EPOCH(w.win_start) + 600 <= EPOCH(mx.m) - 3600
    """,
)
def q9a_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
        tumbling_counts,
    )

    src = _split_stream_dir(spark, sf_dir)
    sink = _sink_name("q9a_sink", src)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = to_memory_sink(
        tumbling_counts(stream, width="10 minutes", watermark="1 hour"),
        sink,
        output_mode="append",
    )
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q9b — T5: exactly-once from a double feed. Every event arrives twice;
# the output holds each exactly once, so the operator provably dropped
# 50% of its input as duplicates.
# --------------------------------------------------------------------------


@query(
    "q9b_streaming_dedup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
)
def q9b_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        dedup_stream,
        read_events_stream,
        to_memory_sink,
    )

    src = _double_stream_dir(spark, sf_dir)
    sink = _sink_name("q9b_sink", src)
    stream = read_events_stream(spark, src)
    q = to_memory_sink(dedup_stream(stream), sink, output_mode="append")
    q.awaitTermination()
    return spark.table(sink).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


# --------------------------------------------------------------------------
# q9d — T6: custom stateful operator (applyInPandasWithState). Per-user
# running counters with arbitrary user state, replayed availableNow in
# ONE batch so update mode emits each key exactly once; the state
# function accumulates the float total as dsum's scaled integer, so
# the emitted value is bit-identical to the batch oracle.
# --------------------------------------------------------------------------


@query(
    "q9d_stateful_counters",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events, {o_dsum("value", "total_value")}
    FROM events GROUP BY user_id
    """,
)
def q9d_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.stateful import running_user_totals
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = _sink_name("q9d_sink", src)
    stream = read_events_stream(spark, src)
    q = to_memory_sink(running_user_totals(stream), sink, output_mode="update")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q9c — T7: stream-static join (static side broadcast per micro-batch,
# zero state) + complete-mode rollup per dim attribute.
# --------------------------------------------------------------------------


@query(
    "q9c_stream_static_join",
    oracle=f"""
    SELECT n.n_name, COUNT(*) AS n_events, {o_dsum("e.value", "sum_value")}
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q9c_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.windows import (
        enrich_with_dim,
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = _sink_name("q9c_sink", src)
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("nk"), "n_name"
    )
    stream = read_events_stream(spark, src).withColumn(
        "nk", F.col("user_id") % 25
    )
    joined = enrich_with_dim(stream, nation, "nk")
    agg = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    )
    q = to_memory_sink(agg, sink, output_mode="complete")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q9e — T8: foreachBatch sink. The two-file split source replays as
# two micro-batches (maxFilesPerTrigger=1); foreachBatch appends each
# batch to parquet tagged with its batch_id. The accumulated sink
# holds every event exactly once regardless of batch boundaries, so
# the oracle is the plain events table; tests/test_streaming.py
# additionally asserts ≥ 2 distinct batch ids reached the sink.
# --------------------------------------------------------------------------

_FOREACH_ROOT = "/tmp/spark_graft_stream_foreach"


@query(
    "q9e_foreach_batch_sink",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
)
def q9e_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_foreach_batch_parquet,
    )

    src = _split_stream_dir(spark, sf_dir)
    # pid-scoped like q9f's state dir: the unconditional clean-slate
    # rmtree below would otherwise delete a concurrent process's
    # in-flight append sink
    dest = os.path.join(
        _FOREACH_ROOT, f"{src.rsplit('/', 1)[-1]}_pid{os.getpid()}"
    )
    sink_dir = os.path.join(dest, "sink")
    checkpoint = os.path.join(dest, "ckpt")
    # the sink is append-mode parquet: always start from a clean slate
    # so a re-run in a fresh session can't double-append
    shutil.rmtree(dest, ignore_errors=True)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = to_foreach_batch_parquet(stream, sink_dir, checkpoint)
    q.awaitTermination()
    return spark.read.parquet(sink_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


# --------------------------------------------------------------------------
# q9f — streaming CDC upsert: foreachBatch maintains a keyed state
# table (latest event per user) across micro-batches — the lakehouse
# MERGE INTO pattern without a table format. Each batch reduces to one
# row per key (argmax by (ts, event_id)) and merges into the previous
# state version with a CONDITIONAL rule — the globally newer row wins,
# not blindly the incoming one (the split source replays the recent
# slice first, so the second batch is OLDER data; q7b's
# updates-always-win merge_upsert would be wrong here). Each version
# writes a NEW directory (no in-place overwrite of a table being
# read). The final state is independent of batch boundaries, so the
# oracle is a plain latest-row-per-user window over the whole table.
# --------------------------------------------------------------------------

_UPSERT_ROOT = "/tmp/spark_graft_stream_upsert"


@query(
    "q9f_streaming_upsert",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           value AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q9f_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from fcs_etl_reactor_spark.streaming.windows import read_events_stream

    src = _split_stream_dir(spark, sf_dir)
    # pid-scoped scratch: the versioned state dir is rmtree'd at build
    # time, so two PROCESSES running q9f concurrently (pytest + a
    # differ, say) would clobber each other's mid-stream state —
    # observed once as a parity flake. Per-process dirs make the run
    # hermetic; within one process the plan cache already serializes.
    dest = os.path.join(
        _UPSERT_ROOT, f"{src.rsplit('/', 1)[-1]}_pid{os.getpid()}"
    )
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest_per_user(df):
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_type").alias("last_event_type"),
                F.col("value").alias("last_value"),
                "event_id",
                "ts",
            )
        )

    def apply_batch(batch_df, batch_id):
        delta = latest_per_user(batch_df)
        prev = os.path.join(dest, f"state_v{batch_id - 1}")
        if os.path.exists(prev):
            base = batch_df.sparkSession.read.parquet(prev)
            merged_all = base.unionByName(delta)
            # re-reduce: a key updated in both versions keeps the
            # globally latest row (ts, event_id ordering)
            merged = (
                merged_all.withColumn("__rn", F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.col("ts").desc(), F.col("event_id").desc()
                    )
                ))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(os.path.join(dest, f"state_v{batch_id}"))

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(dest, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions = sorted(
        (d for d in os.listdir(dest) if d.startswith("state_v")),
        key=lambda d: int(d.rsplit("v", 1)[-1]),
    )
    final = spark.read.parquet(os.path.join(dest, versions[-1]))
    return final.select("user_id", "last_ts", "last_event_type", "last_value")


# --------------------------------------------------------------------------
# q9k — multi-source streaming union: two independent file streams
# over the same event spool union into ONE streaming DAG (the
# multiplexed-ingest topology — e.g. two regional kafka topics into
# one pipeline), then a watermarked complete-mode count per type.
# Every event is seen exactly twice, so the batch oracle is 2x the
# plain counts — the union itself is what's verified. availableNow
# drains both sources deterministically.
# --------------------------------------------------------------------------


@query(
    "q9k_stream_union",
    oracle="""
    SELECT event_type, CAST(2 * COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q9k_stream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = _sink_name("q9k_sink", src)
    s1 = read_events_stream(spark, src)
    s2 = read_events_stream(spark, src)
    counts = (
        s1.unionAll(s2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = to_memory_sink(counts, sink, output_mode="complete")
    q.awaitTermination()
    return spark.table(sink).select("event_type", "n")


# --------------------------------------------------------------------------
# q9l — MULTI-micro-batch incremental state: every other streaming
# entry runs availableNow over a single-file spool (one batch by
# design, documented in _events_stream_dir); this one spools events
# as FOUR files and sets maxFilesPerTrigger=1, so availableNow
# executes four micro-batches and the complete-mode aggregation
# state must merge across them. The final counts equal the batch
# answer — cross-batch state accumulation is the thing verified.
# No watermark: a non-windowed complete aggregation accumulates all
# input regardless of arrival order, so the file split can't affect
# the result.
# --------------------------------------------------------------------------


def _x4_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events spooled as FOUR parquet files (shared by q9l/q9m): with
    maxFilesPerTrigger=1, availableNow runs four micro-batches."""
    from fcs_etl_reactor_spark.io import load, source_fingerprint

    key = sf_dir.rstrip("/")
    dest = os.path.join(
        "/tmp/spark_graft_stream_src",
        key.strip("/").replace("/", "_")
        + "_x4_"
        + source_fingerprint(sf_dir, "events"),
    )
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        tmp = f"{dest}.build.{os.getpid()}"
        e = load(spark, sf_dir, "events")
        e.repartition(4).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dest)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    # Same guard as io._relayout / storage.py layout builders: the
    # rename can lose the race to a COMPLETE copy — but dest can also
    # hold a partial spool from a crashed build, and serving it would
    # make the 4-batch streaming queries read fewer rows than the
    # batch oracle. Only a _SUCCESS-marked dir may be served; else
    # rebuild into a process-private dir (no second rename race).
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        private = f"{dest}.pid{os.getpid()}"
        if not os.path.exists(os.path.join(private, "_SUCCESS")):
            e = load(spark, sf_dir, "events")
            e.repartition(4).write.mode("overwrite").parquet(private)
        return private
    return dest


@query(
    "q9l_incremental_batches",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    """,
)
def q9l_incremental_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    dest = _x4_stream_dir(spark, sf_dir)
    sink = _sink_name("q9l_sink", dest)
    stream = read_events_stream(spark, dest, max_files_per_trigger=1)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = to_memory_sink(counts, sink, output_mode="complete")
    q.awaitTermination()
    return spark.table(sink).select("event_type", "n")


# --------------------------------------------------------------------------
# q9m — UPDATE output mode (the third output mode; append and
# complete are covered by q9a/q98 and q9k/q9l). Same four-batch spool
# as q9l, but the sink receives only the groups whose state CHANGED
# in each micro-batch, captured with their batch id via foreachBatch.
# Reassembly takes each key's LAST emission (argmax batch id) — if
# update mode emitted per-batch increments instead of cumulative
# state, or skipped a changed group's final update, the hash would
# miss the plain GROUP BY answer. Batch-boundary-independent by the
# same argument as q9l (non-windowed aggregation, monotone state).
# --------------------------------------------------------------------------

_UPDATE_ROOT = "/tmp/spark_graft_stream_update"


@query(
    "q9m_update_mode",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    """,
)
def q9m_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fcs_etl_reactor_spark.streaming.windows import read_events_stream

    src = _x4_stream_dir(spark, sf_dir)
    # pid-scoped scratch like q9e: the clean-slate rmtree must never
    # race a concurrent process's in-flight run
    dest = os.path.join(
        _UPDATE_ROOT, f"{src.rsplit('/', 1)[-1]}_pid{os.getpid()}"
    )
    sink_dir = os.path.join(dest, "sink")
    checkpoint = os.path.join(dest, "ckpt")
    shutil.rmtree(dest, ignore_errors=True)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def _capture(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_dir)

    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(_capture)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(sink_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("batch_id").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "n")
    )


# --------------------------------------------------------------------------
# q9p — STATE STORE introspection: drain a streaming aggregation with
# an explicit checkpoint, then read the checkpoint's state store back
# as a BATCH table (Spark's `statestore` reader — the ops/debugging
# surface for "what does my streaming job believe right now") and
# verify the recovered per-key aggregation buffers against the batch
# oracle. availableNow drains everything, so the final state IS the
# full-corpus aggregate — an exact, deterministic check that the
# engine's durable state round-trips. Checkpoint is pid-scoped (the
# streaming-sink discipline); re-running in-process is an idempotent
# no-op drain over an already-consumed source.
# --------------------------------------------------------------------------


@query(
    "q9p_state_store_read",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
    """,
)
def q9p_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.windows import read_events_stream

    src = _events_stream_dir(spark, sf_dir)
    ckpt = os.path.join(
        "/tmp/spark_graft_state_ckpt",
        src.rsplit("/", 1)[-1] + f"_{os.getpid()}",
    )
    counts = read_events_stream(spark, src).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    q = (
        counts.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    # the value struct's field layout is the aggregation buffer; the
    # count buffer is its single bigint field — resolve by position so
    # the query doesn't depend on Spark's internal buffer naming
    vfield = state.schema["value"].dataType.names[0]
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col(f"value.{vfield}").cast("bigint").alias("n_events"),
    )


# --------------------------------------------------------------------------
# q9q — RocksDB state store provider, end-to-end: the same windowed
# aggregation the HDFS-backed default runs (q98's shape), executed
# with spark.sql.streaming.stateStore.providerClass pointed at
# RocksDB — the off-heap, incremental-checkpoint backend you actually
# run at 100 TB state. availableNow drain + complete mode make the
# final emission the exact batch aggregate, so correctness of the
# provider swap is oracle-checked; the conf is restored afterwards so
# later streaming queries keep their session default.
# --------------------------------------------------------------------------


@query(
    "q9q_rocksdb_state_store",
    oracle="""
    SELECT
      MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600000000 AS BIGINT))
        AS win_start,
      event_type,
      COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q9q_rocksdb_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
        tumbling_counts,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q9q_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, src)
        q = to_memory_sink(
            tumbling_counts(stream, width="10 minutes", watermark="1 hour"),
            sink,
            output_mode="complete",
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return spark.table(sink).select(F.col("win_start"), "event_type", "n")


# --------------------------------------------------------------------------
# q9r — CHAINED stateful window aggregations in one stream (Spark 4's
# multiple-stateful-operator support): 10-minute tumbling counts per
# type re-aggregated into hourly rollups via window_time() — the
# continuous-aggregate cascade a metrics pipeline runs (fine windows
# feed coarse ones without a second scan of the source). Chained
# stateful operators require append mode, so at termination the sink
# holds exactly the hours whose end the final watermark (max ts − 1 h)
# passed — the same provably-withheld-tail semantics as q9a, stated
# directly in the oracle's WHERE.
# --------------------------------------------------------------------------


@query(
    "q9r_chained_window_aggs",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    fine AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS w10,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    hourly AS (
      SELECT CAST(FLOOR(w10 / 3600) * 3600 AS BIGINT) AS h,
             event_type,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_windows
      FROM fine GROUP BY 1, 2
    )
    SELECT MAKE_TIMESTAMP(h * 1000000) AS hour_start,
           event_type, n_events, n_windows
    FROM hourly, mx
    WHERE h + 3600 <= EPOCH(mx.m) - 3600
    """,
)
def q9r_chained_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.queries.events_windows import _events_stream_dir
    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_memory_sink,
    )

    src = _events_stream_dir(spark, sf_dir)
    sink = "q9r_sink_" + src.rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    stream = read_events_stream(spark, src)
    fine = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hourly = (
        fine.groupBy(
            F.window(F.window_time("win"), "60 minutes").alias("hwin"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .select(
            F.col("hwin.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_windows",
        )
    )
    q = to_memory_sink(hourly, sink, output_mode="append")
    q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# q9s — exactly-once ACROSS A RESTART, oracle-checked: the stream is
# started, drained over the first half of the source, STOPPED, the
# second half arrives, and a brand-new query (same checkpoint) drains
# the rest. The checkpoint's offset log makes run 2 skip everything
# run 1 committed, so the parquet sink holds every event exactly once
# — the recovery contract a 100 TB pipeline actually depends on,
# proven against the plain batch oracle. All scratch dirs pid-scoped;
# re-running in-process is an idempotent no-op drain.
# --------------------------------------------------------------------------


@query(
    "q9s_restart_exactly_once",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
)
def q9s_restart_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from fcs_etl_reactor_spark.streaming.windows import (
        read_events_stream,
        to_foreach_batch_parquet,
    )

    split = _split_stream_dir(spark, sf_dir)  # 00_recent / 01_late
    base = os.path.join(
        "/tmp/spark_graft_restart",
        split.rsplit("/", 1)[-1] + f"_{os.getpid()}",
    )
    src = os.path.join(base, "src")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    done = os.path.join(base, "_COMPLETE")
    if not os.path.exists(done):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(src, exist_ok=True)
        files = sorted(
            f for f in os.listdir(split) if f.endswith(".parquet")
        )
        # run 1: only the first file is visible
        shutil.copy(os.path.join(split, files[0]), os.path.join(src, files[0]))
        q1 = to_foreach_batch_parquet(read_events_stream(spark, src), sink, ckpt)
        q1.awaitTermination()
        # the second half arrives; a NEW query resumes from the SAME
        # checkpoint and must process only the unseen file
        shutil.copy(os.path.join(split, files[1]), os.path.join(src, files[1]))
        q2 = to_foreach_batch_parquet(read_events_stream(spark, src), sink, ckpt)
        q2.awaitTermination()
        open(done, "w").close()
    return spark.read.parquet(sink).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


# --------------------------------------------------------------------------
# q9t — INCREMENTAL SKETCH MAINTENANCE: the streaming twin of q1q's
# mergeable quantile sketch. Each of the four micro-batches builds
# its own partition sketches (operators/quantile_sketch) and appends
# the tree-merged ≤1024 (v, w) rows to a durable state dir via
# foreachBatch — the state grows by one bounded summary per batch,
# never by data volume, which is exactly how a 100 TB/day stream
# keeps live percentiles. The final answer re-merges the per-batch
# summaries (sketch union IS re-compaction — associativity is the
# point of the operator) and probes three quantiles; the envelope
# asserts the tie-aware observed rank error ≤ 2%·N against the exact
# batch order statistics, which the oracle recomputes. Deterministic:
# fixed 4-file spool + deterministic compaction phase.
# --------------------------------------------------------------------------

_SKETCH_STATE_ROOT = "/tmp/spark_graft_stream_sketch"


@query(
    "q9t_streaming_quantile_sketch",
    oracle="""
    WITH e AS (SELECT value AS x FROM events)
    SELECT q, ROUND(ex, 6) AS exact_pctl, TRUE AS rank_err_ok
    FROM (
      SELECT CAST(0.25 AS DOUBLE) AS q, QUANTILE_CONT(x, 0.25) AS ex FROM e
      UNION ALL SELECT 0.5, QUANTILE_CONT(x, 0.5) FROM e
      UNION ALL SELECT 0.75, QUANTILE_CONT(x, 0.75) FROM e
    )
    """,
)
def q9t_streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.quantile_sketch import (
        sketch_build,
        sketch_merge,
        sketch_quantiles,
    )
    from fcs_etl_reactor_spark.streaming.windows import read_events_stream

    qs = [0.25, 0.5, 0.75]
    src = _x4_stream_dir(spark, sf_dir)
    dest = os.path.join(
        _SKETCH_STATE_ROOT, f"{src.rsplit('/', 1)[-1]}_pid{os.getpid()}"
    )
    state_dir = os.path.join(dest, "state")
    checkpoint = os.path.join(dest, "ckpt")
    shutil.rmtree(dest, ignore_errors=True)

    stream = read_events_stream(spark, src, max_files_per_trigger=1).select(
        F.col("value").cast("double").alias("x")
    )

    def _maintain(batch_df, batch_id):
        # bounded per-batch summary appended to durable sketch state
        sketch_merge(sketch_build(batch_df, "x")).write.mode("append").parquet(
            state_dir
        )

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(_maintain)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if not os.path.isdir(state_dir):
        # zero micro-batches => foreachBatch never ran and no state
        # dir exists; return the empty envelope instead of crashing
        # on path-not-found (the empty-stream edge). Schema comes from
        # the operator's own constant so a sketch-schema change can't
        # silently diverge here.
        from fcs_etl_reactor_spark.operators.quantile_sketch import (
            _SKETCH_SCHEMA,
        )

        merged = spark.createDataFrame([], _SKETCH_SCHEMA)
    else:
        merged = sketch_merge(spark.read.parquet(state_dir))
    est = sketch_quantiles(merged, qs)

    e = load(spark, sf_dir, "events").select(F.col("value").cast("double").alias("x"))
    exact = e.agg(
        F.percentile("x", F.array(*[F.lit(v) for v in qs])).alias("ex"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).select(F.posexplode("ex").alias("pos", "exact_raw"), "n").select(
        F.element_at(F.array(*[F.lit(v) for v in qs]), F.col("pos") + 1).alias("q"),
        "exact_raw",
        "n",
    )
    ranks = (
        e.crossJoin(F.broadcast(est))
        .groupBy("q", "est")
        .agg(
            F.sum(F.when(F.col("x") < F.col("est"), 1).otherwise(0)).alias("rk_lo"),
            F.sum(F.when(F.col("x") <= F.col("est"), 1).otherwise(0)).alias("rk_hi"),
        )
    )
    return exact.join(F.broadcast(ranks), "q").select(
        "q",
        F.round("exact_raw", 6).alias("exact_pctl"),
        (
            (F.col("rk_lo") - F.lit(0.02) * F.col("n") <= F.col("q") * F.col("n"))
            & (F.col("q") * F.col("n") <= F.col("rk_hi") + F.lit(0.02) * F.col("n"))
        ).alias("rank_err_ok"),
    )
