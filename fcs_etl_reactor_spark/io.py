"""Fixture-table loaders and the name→DataFrame registry.

SURVEY.md §2.1: S1 (parquet scan), S6 (table registry). The oracle
(DuckDB) sees the identical parquet files, so loaders add no casts —
schema fidelity is part of the correctness contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimension tables small enough to broadcast at ANY scale factor —
#: region/nation are bounded by geography (5/25 rows at 100 TB too).
BROADCAST_DIMS = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a fixture table — the cheap stat that stands in
    for catalog statistics when size-gating a broadcast decision.
    Unknown sizes report as huge so callers fail toward NOT
    broadcasting (the scale-safe direction)."""
    import os

    path = table_path(sf_dir, name)
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
            )
        return os.path.getsize(path)
    except OSError:
        return 1 << 60


def source_fingerprint(sf_dir: str, name: str) -> str:
    """Identity of a fixture file for derived-copy cache keys (stream
    source dirs, layout cache): (mtime, size) — regenerated fixtures
    get a new fingerprint, so no /tmp copy outlives its source."""
    path = table_path(sf_dir, name)
    try:
        st = os.stat(path)
        return f"{int(st.st_mtime)}_{st.st_size}"
    except OSError:
        return "missing"


#: Scan DataFrames are cached ON the session object (attribute dict):
#: building a scan is driver-side work Spark repeats on every
#: spark.read.parquet call — file listing + footer schema inference +
#: a dozen Py4J round-trips (~50-150 ms, measured). The logical plan
#: is immutable, so reusing it across queries is free. Keying by the
#: session instance (not id()) means a dead session's cache dies with
#: it — no stale plans served to a new session at a recycled address.
_SCAN_CACHE_ATTR = "_fcs_scan_cache"

#: Layout cache: the fixture parquet files hold ONE row group each, and
#: a parquet row group is the unit of scan parallelism — no split
#: setting can spread a single-group 600k-row file across cores, so
#: every scan of it is one task. A real deployment controls file
#: layout at ingest; this cache performs that ingest step once per
#: (sf_dir, table): rewrite the SAME rows (byte-identical values, all
#: downstream results unchanged — every engine query is row-order
#: independent by design) into _LAYOUT_CHUNKS files under
#: $SPARK_GRAFT_SCAN_CACHE, and scan those. Only tables above
#: _LAYOUT_MIN_ROWS with fewer row groups than chunks qualify.
_LAYOUT_ROOT = os.environ.get("SPARK_GRAFT_SCAN_CACHE", "/tmp/spark_graft_scan_cache")
_LAYOUT_MIN_ROWS = 150_000
_LAYOUT_CHUNKS = 16


def _relayout(spark: SparkSession, src: str, df: DataFrame) -> DataFrame:
    """Rewrite a single-row-group file into _LAYOUT_CHUNKS files once;
    return a scan of the rewritten copy (or the input df on any
    failure — read-only /tmp etc. must never break correctness)."""
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(src).metadata
        if meta.num_rows < _LAYOUT_MIN_ROWS or meta.num_row_groups >= _LAYOUT_CHUNKS:
            return df
        st = os.stat(src)
        dest = os.path.join(
            _LAYOUT_ROOT, os.path.dirname(src).strip("/").replace("/", "_"),
            # (mtime, size) in the path: a regenerated fixture never
            # serves a stale re-chunked copy
            f"{os.path.basename(src)}_{int(st.st_mtime)}_{st.st_size}",
        )
        if not os.path.exists(os.path.join(dest, "_SUCCESS")):
            # build in a pid-scoped dir + atomic rename: a concurrent
            # process sees the destination complete-or-absent, never
            # mid-overwrite (same pattern as queries/storage.py)
            tmp = f"{dest}.build.{os.getpid()}"
            df.repartition(_LAYOUT_CHUNKS).write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, dest)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        # rename can fail because a COMPLETE copy won the race — but
        # also because dest holds a partial dir from a crashed build
        # (pre-atomic-rename era or a kill mid-rename). Only a
        # _SUCCESS-marked dest may be served; a partial copy would
        # silently drop source rows from every later query.
        if not os.path.exists(os.path.join(dest, "_SUCCESS")):
            return df
        return spark.read.parquet(dest)
    except Exception:
        return df


def _normalize_ts(df: DataFrame, legacy_nanos: tuple[str, ...] = ()) -> DataFrame:
    """Normalize every time column to TimestampType (µs, session-tz
    UTC) from every physical form the fixtures have shipped:
    TIMESTAMP_NTZ (plain timestamp[us] — current fixtures for
    events.ts, orders.o_orderdate, lineitem.l_shipdate) → cast (UTC
    session tz makes the wall clock == the epoch instant, matching the
    tz-naive DuckDB oracle); long nanos (events.ts as TIMESTAMP(NANOS)
    via nanosAsLong, older fixtures) → floor to µs; TimestampType →
    unchanged. Epoch functions (unix_micros/unix_seconds) reject NTZ
    input, so skipping this normalization is a query-time
    AnalysisException — and the driver's schema gate sees NTZ-derived
    columns as a type mismatch.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            out = out.withColumn(f.name, F.col(f.name).cast("timestamp"))
        elif f.name in legacy_nanos and isinstance(f.dataType, LongType):
            out = out.withColumn(
                f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000"))
            )
    return out


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: columnar parquet scan; Catalyst pushes filters/projection.

    Every NTZ time column (events.ts, orders.o_orderdate,
    lineitem.l_shipdate in current fixtures) is normalized to
    TimestampType — see _normalize_ts for the physical forms handled.

    Session timezone is pinned to UTC here — the driver hands us its
    own SparkSession and calendar functions (year/month/unix_timestamp)
    follow the session tz; the DuckDB oracle is tz-naive.
    """
    cache = spark.__dict__.setdefault(_SCAN_CACHE_ATTR, {})
    key = (sf_dir.rstrip("/"), name)
    cached = cache.get(key)
    if cached is not None:
        return cached
    if not cache:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = table_path(sf_dir, name)
    df = spark.read.parquet(src)
    legacy = ("ts",) if name == "events" else ()
    df = _normalize_ts(df, legacy_nanos=legacy)
    df = _relayout(spark, src, df)
    # idempotent re-normalize: a relayout copy cached by an older
    # build may still carry the NTZ physical type
    df = _normalize_ts(df, legacy_nanos=legacy)
    cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S6: register every fixture table as a temp view for spark.sql()."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S2: the reference's interchange format (header CSV)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """S5: partitioned parquet sink — partition big outputs by a
    low-cardinality key (sample_id / date) so downstream scans prune.
    `compression`: snappy (default, fast) vs zstd (~30-50% smaller —
    at 100 TB the storage/scan-IO saving usually wins)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S2+: ORC scan — Spark-native columnar alternative to parquet.

    ORC carries the same pushdown surface as parquet (predicate
    pushdown, column pruning, stripe-level min/max skipping), so a
    100 TB deployment standardized on ORC loses nothing: the plans in
    this repo are format-agnostic above the scan node.
    """
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink with the same partition-pruning layout as write_parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text ingest — raw-corpus entry
    point for the LLM pipeline ops (one row per line / per document).
    """
    # NB: must be the text() kwarg — the reader-level "wholetext"
    # option is ignored by the text source (verified on 4.1).
    return spark.read.text(path, wholetext=whole)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S3: manifest/config ingest."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: line-delimited JSON sink (manifest/interchange output)."""
    df.write.mode(mode).json(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet directories written with
    DIFFERENT (compatible) schemas — mergeSchema resolves the superset
    by name, null-padding missing columns. The footer-merge cost is
    per-file; at 100 TB you enable it only on evolving tables (or pin
    the schema explicitly)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Bucketed table write — the co-located join strategy at scale:
    two tables bucketed (and sorted) on the join key join with ZERO
    shuffle (no Exchange in the plan; verified in tests/test_bucketing).

    At 100 TB you bucket the fact tables once on their join keys and
    every subsequent key-join/group-by skips its shuffle.
    """
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row", schema=None) -> DataFrame:
    """S3+: XML ingest (native source since Spark 4 — the donated
    spark-xml). Instrument/config manifests in the FCS ecosystem are
    frequently XML; rowTag selects the repeating element."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (element-per-row; partitioned files like any sink)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """S2+: Avro scan — row-oriented interchange format common in
    Kafka/streaming pipelines. The `spark-avro` external module is NOT
    bundled in this container (only avro-core jars ship; no package
    index to fetch it — same env-gate rationale as TWS/protobuf), so
    this raises a clear error here and works unchanged on any cluster
    deployed with --packages org.apache.spark:spark-avro_2.13:4.1.2."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.format("avro").load(path)
    except AnalysisException as exc:
        # Translate ONLY the missing-module failure; a missing path,
        # corrupt file, or schema error on a cluster where spark-avro
        # IS deployed must surface unchanged.
        cls = ""
        try:
            cls = exc.getCondition() or ""
        except Exception:
            pass
        if "FAILED_FIND_DATA_SOURCE" in cls or "Failed to find" in str(exc):
            raise NotImplementedError(
                "spark-avro module not deployed in this environment; "
                "submit with --packages org.apache.spark:spark-avro_2.13:<ver>"
            ) from exc
        raise
