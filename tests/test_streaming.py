"""Structured Streaming tests (SURVEY.md §5.2-4): memory sink +
availableNow trigger, and batch-twin equivalence — the streamed result
over a finite input must equal the batch computation on the same data.
"""

import pytest
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.streaming.stateful import running_user_counters
from fcs_etl_reactor_spark.streaming.windows import (
    dedup_stream,
    enrich_with_dim,
    read_events_stream,
    session_aggregate,
    sliding_counts,
    to_memory_sink,
    tumbling_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Finite streaming input: the sf0.001 events table re-written as
    4 parquet files (micro-batch boundaries) with micro-ts schema."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run(spark, stream_df, name, mode="append"):
    q = to_memory_sink(stream_df, name, mode)
    q.awaitTermination(120)
    return spark.table(name)


class TestWindowedStreaming:
    def test_tumbling_equals_batch_twin(self, spark, events_dir):
        # complete output mode on a finite input: every window emits
        # regardless of watermark, so streamed == batch exactly
        stream = read_events_stream(spark, events_dir)
        got = _run(spark, tumbling_counts(stream), "t_tumbling", mode="complete")
        batch = load(spark, SF_SMALL, "events").groupBy(
            F.window("ts", "10 minutes").alias("win"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).select(
            F.col("win.start").alias("win_start"), "event_type", "n"
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    def test_sliding_equals_batch_twin(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir)
        got = _run(spark, sliding_counts(stream), "t_sliding", mode="complete")
        batch = load(spark, SF_SMALL, "events").groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).select(
            F.col("win.start").alias("win_start"), "event_type", "n"
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    def test_session_equals_batch_twin(self, spark, events_dir):
        from fcs_etl_reactor_spark.queries import QUERIES

        stream = read_events_stream(spark, events_dir)
        got = _run(spark, session_aggregate(stream), "t_session", mode="complete")
        twin = QUERIES["q97_sessionization"](spark, SF_SMALL).select(
            "user_id", "session_start", "n_events", "session_value"
        )
        got_cmp = got.select("user_id", "session_start", "n_events", "session_value")
        assert sorted(map(tuple, got_cmp.collect())) == sorted(map(tuple, twin.collect()))


class TestWatermark:
    def test_watermark_drops_late_events(self, spark, events_dir):
        """T4: with per-file micro-batches over time-unordered files,
        the watermark advances between batches and late events are
        dropped — streamed totals must be <= batch totals, never >."""
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        got = _run(spark, tumbling_counts(stream, watermark="1 hour"), "t_wm")
        batch_total = load(spark, SF_SMALL, "events").count()
        streamed_total = got.agg(F.sum("n")).collect()[0][0]
        assert streamed_total <= batch_total
        # and every (window, type) count is <= its batch twin
        batch = load(spark, SF_SMALL, "events").groupBy(
            F.window("ts", "10 minutes").alias("win"), "event_type"
        ).agg(F.count(F.lit(1)).alias("bn")).select(
            F.col("win.start").alias("win_start"), "event_type", "bn"
        )
        joined = got.join(batch, ["win_start", "event_type"], "left")
        assert joined.filter("n > bn").count() == 0


class TestStatefulStreaming:
    def test_dedup_stream(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir)
        got = _run(spark, dedup_stream(stream), "t_dedup")
        n_batch = load(spark, SF_SMALL, "events").count()
        assert got.count() == n_batch  # event_id already unique
        assert got.select("event_id").distinct().count() == n_batch

    def test_stream_static_join(self, spark, events_dir):
        dim = spark.createDataFrame(
            [(t, i) for i, t in enumerate(["click", "view", "purchase", "signup", "error"])],
            "event_type STRING, type_code INT",
        )
        stream = read_events_stream(spark, events_dir)
        got = _run(spark, enrich_with_dim(stream, dim, "event_type"), "t_enrich")
        assert got.filter("type_code IS NULL").count() == 0
        assert got.count() == load(spark, SF_SMALL, "events").count()

    def test_running_counters_final_state_matches_batch(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        got = _run(spark, running_user_counters(stream), "t_counters", mode="update")
        # memory sink in update mode appends every emission; the LAST
        # emission per user is the final state.
        final = (
            got.withColumn("rn", F.monotonically_increasing_id())
            .orderBy(F.col("rn").desc())
            .dropDuplicates(["user_id"])
        )
        batch = load(spark, SF_SMALL, "events").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        got_counts = {r["user_id"]: r["n_events"] for r in final.collect()}
        for r in batch.collect():
            assert got_counts[r["user_id"]] == r["n_events"]


def test_q98_harness_streaming_equals_batch_twin(spark):
    from fcs_etl_reactor_spark.queries import QUERIES
    from tests.conftest import SF_SMALL

    s = {
        tuple(r)
        for r in QUERIES["q98_streaming_tumbling"](spark, SF_SMALL)
        .select("win_start", "event_type", "n")
        .collect()
    }
    b = {
        tuple(r)
        for r in QUERIES["q95_tumbling_window"](spark, SF_SMALL)
        .select("win_start", "event_type", "n")
        .collect()
    }
    assert s == b


def test_transform_with_state_final_matches_batch(spark, events_dir):
    # transformWithStateInPandas talks to the JVM state server over a
    # protobuf protocol; this container has no google.protobuf, so the
    # TWS path can only run where it is installed (the operator itself
    # is plain Spark 4 API — nothing environment-specific in our code)
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from fcs_etl_reactor_spark.streaming.stateful import running_user_counters_tws
    from fcs_etl_reactor_spark.streaming.windows import read_events_stream, to_memory_sink

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        q = to_memory_sink(running_user_counters_tws(stream), "tws_counters", "update")
        q.awaitTermination()
        out = spark.table("tws_counters").toPandas()
        # update mode appends one row per key per batch; the LAST row
        # per key is the final state
        final = out.groupby("user_id").tail(1).set_index("user_id")
        batch = (
            spark.read.schema(
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
                "value DOUBLE, props STRING"
            )
            .parquet(events_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max_by("event_id", "ts").alias("last"))
            .collect()
        )
        for r in batch:
            assert final.loc[r["user_id"], "n_events"] == r["n"]
            assert final.loc[r["user_id"], "last_event_id"] == r["last"]
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_q99_harness_sessions_equal_batch_twin(spark):
    from fcs_etl_reactor_spark.queries import QUERIES
    from tests.conftest import SF_SMALL

    # session_window's end is last-event-ts + gap (the window extent);
    # the batch twin's session_end is MAX(ts) — compare on the
    # semantics they share: identity, start, and size
    s = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in QUERIES["q99_streaming_sessions"](spark, SF_SMALL).collect()
    }
    b = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in QUERIES["q97_sessionization"](spark, SF_SMALL).collect()
    }
    assert s == b


def test_q9e_foreach_batch_multi_batch_delivery(spark):
    import os

    from fcs_etl_reactor_spark.queries import QUERIES
    from fcs_etl_reactor_spark.queries.streaming_extra import (
        _FOREACH_ROOT,
        _split_stream_dir,
    )
    from tests.conftest import SF_SMALL

    out = QUERIES["q9e_foreach_batch_sink"](spark, SF_SMALL)
    src = _split_stream_dir(spark, SF_SMALL)
    # the sink dir is pid-scoped (concurrent-process safety, round 4)
    sink_dir = os.path.join(
        _FOREACH_ROOT, f"{src.rsplit('/', 1)[-1]}_pid{os.getpid()}", "sink"
    )
    tagged = spark.read.parquet(sink_dir)
    batch_ids = sorted(r["_batch_id"] for r in tagged.select("_batch_id").distinct().collect())
    # maxFilesPerTrigger=1 over the two-file split source → the sink
    # really accumulated at least two separate micro-batches
    assert len(batch_ids) >= 2
    # exactly-once across batch boundaries
    assert out.count() == tagged.count() == out.select("event_id").distinct().count()


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    # T8/recovery: an availableNow run drains the backlog; a RESTART
    # against the same checkpoint must process only files that arrived
    # after the first run — exactly-once across restarts, the property
    # a 100 TB ingest pipeline leans on after every failure.
    from fcs_etl_reactor_spark.streaming.windows import to_foreach_batch_parquet

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    spark.range(0, 5).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema("id BIGINT, v BIGINT").parquet(src)
        q = to_foreach_batch_parquet(stream, out, ck)
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 5

    # late-arriving second file, then restart from the SAME checkpoint
    spark.range(5, 9).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    final = spark.read.parquet(out)
    assert final.count() == 9  # 5 + 4, no reprocessing of file 1
    got = sorted(r["id"] for r in final.select("id").collect())
    assert got == list(range(9))
    # and the second run really arrived as a separate micro-batch
    assert final.select("_batch_id").distinct().count() >= 2


def test_event_time_timeout_sessions(spark, tmp_path):
    # T6 with EVENT-TIME TIMEOUTS: sessions close either inline (a
    # later event exceeds the gap) or via state timeout once the
    # watermark proves them final. Deterministic two-file
    # chronological replay; expectation computed independently below.
    import datetime as dt

    from fcs_etl_reactor_spark.io import load
    from fcs_etl_reactor_spark.streaming.stateful import timeout_sessions
    from fcs_etl_reactor_spark.streaming.windows import to_memory_sink
    from pyspark.sql import functions as F

    GAP = dt.timedelta(minutes=30)
    sf = "/root/testdata/sf0.001"
    ev = load(spark, sf, "events").select("user_id", "ts")
    rows = [(r["user_id"], r["ts"]) for r in ev.collect()]
    max_ts = max(t for _, t in rows)
    cutoff = max_ts - dt.timedelta(hours=26)

    src = tmp_path / "chrono"
    src.mkdir()
    early = ev.filter(F.col("ts") < F.lit(cutoff))
    late = ev.filter(F.col("ts") >= F.lit(cutoff))
    early.repartition(1).write.parquet(str(src / "f"))
    import glob, os, shutil, time
    part = glob.glob(str(src / "f" / "part-*.parquet"))[0]
    shutil.move(part, str(src / "00_early.parquet"))
    late.repartition(1).write.parquet(str(src / "g"))
    part = glob.glob(str(src / "g" / "part-*.parquet"))[0]
    shutil.move(part, str(src / "01_late.parquet"))
    shutil.rmtree(src / "f"); shutil.rmtree(src / "g")
    now = time.time()
    os.utime(src / "00_early.parquet", (now - 60, now - 60))
    os.utime(src / "01_late.parquet", (now - 30, now - 30))

    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = to_memory_sink(
        timeout_sessions(stream, gap_seconds=1800), "t6_timeout_sessions", "update"
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("t6_timeout_sessions").collect()
        if r["n_events"] is not None
    }

    # independent expectation: batch sessionization per user; every
    # session except the user's last emits inline; the last (open)
    # session emits via timeout in the terminal no-data micro-batch
    # (noDataMicroBatches fires state timers at the final watermark =
    # max(all ts) - 1 s), i.e. iff end + gap < that watermark
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    w_final = max_ts - dt.timedelta(seconds=1)
    want = set()
    for u, ts in by_user.items():
        ts.sort()
        sessions, n, start, end = [], 0, None, None
        for t in ts:
            if end is None:
                n, start, end = 1, t, t
            elif t - end <= GAP:
                n, end = n + 1, t
            else:
                sessions.append((n, start, end))
                n, start, end = 1, t, t
        open_sess = (n, start, end)
        for s in sessions:
            want.add((u, s[1], s[2], s[0]))
        if open_sess[2] + GAP < w_final:
            want.add((u, open_sess[1], open_sess[2], open_sess[0]))
    assert got == want and len(want) > 0
