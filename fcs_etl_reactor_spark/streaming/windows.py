"""Structured Streaming forms of the windowed operators
(SURVEY.md §2.10 T1-T5, T7-T8).

Each transformation takes/returns a streaming DataFrame and has a
batch twin in queries/events_windows.py using identical window
arithmetic — the oracle checks the math there; memory-sink tests
(tests/test_streaming.py) check the incremental execution here.

Scale notes: stateful windows shuffle on (key, window); state size is
bounded by watermark horizon × key cardinality. At 100 TB/day you size
`spark.sql.shuffle.partitions` to the key volume and use RocksDB state
store; nothing in these plans is local-mode-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """S7: events directory as an unbounded source (file micro-batches)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(stream: DataFrame, width: str = "10 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """T1+T4: watermarked tumbling-window counts per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def sliding_counts(stream: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes", watermark: str = "1 hour") -> DataFrame:
    """T2: sliding-window counts."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def session_aggregate(stream: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """T3: gap-based session windows per user (session_window state
    operator; the batch twin derives identical sessions with
    lag+running-sum)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1e6 + 0.5).cast("long")).alias("value_scaled"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            (F.col("value_scaled").cast("double") / 1e6).alias("session_value"),
        )
    )


def dedup_stream(stream: DataFrame, keys: list[str] | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """T5: exactly-once by event_id within the watermark horizon —
    state holds only keys younger than the watermark."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """T7: stream-static join — the static side is broadcast per
    micro-batch, no state."""
    return stream.join(F.broadcast(dim), on, "left")


def to_foreach_batch_parquet(stream_df: DataFrame, path: str, checkpoint: str):
    """T8: foreachBatch sink — the production pattern for sinks Spark
    has no native connector for (JDBC upserts, external indexes,
    multi-table fan-out). Each micro-batch arrives as a BATCH
    DataFrame with a monotonically increasing batch_id; the checkpoint
    makes re-delivery after failure idempotent-by-batch-id (here:
    append parquet tagged with _batch_id, so a test can prove the
    stream really arrived in multiple batches)."""
    from pyspark.sql import functions as SF

    def _write(batch_df, batch_id):
        batch_df.withColumn("_batch_id", SF.lit(batch_id)).write.mode(
            "append"
        ).parquet(path)

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """T8: memory sink for tests; availableNow processes the full
    backlog then stops (deterministic — never wall-clock-dependent)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
