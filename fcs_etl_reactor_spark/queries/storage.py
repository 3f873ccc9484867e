"""Storage-layout operators: bucketing, partition pruning, recursion.

SURVEY.md §2.1/§2.3 extensions — the three storage-side levers a
100 TB deployment pulls that pure query rewrites can't reach:

- **Bucketed co-located join** (q2a): both join sides written with
  ``bucketBy(N, key)`` + ``sortBy(key)``; a sort-merge join between
  matching bucket specs needs NO exchange — at 100 TB this turns the
  single most expensive shuffle (fact ⋈ fact) into a zip of
  pre-sorted files. The bucketed copies are built once per
  (sf_dir, table) and cached by source fingerprint, standing in for
  the one-time ingest-layout step of a production lakehouse.
- **Partition-pruned scan** (q2b): events written
  ``partitionBy(event_date)``; a date-range predicate prunes to the
  matching directories so the scan never touches the other ~90% of
  the table. The plan carries the pruning in PartitionFilters —
  asserted in tests/test_plans.py.
- **Recursive CTE** (q2c): Spark 4's ``WITH RECURSIVE`` — iterative
  SQL (series generation, transitive closure) without a driver-side
  loop. The month spine here is the gap-revealing calendar join that
  reporting pipelines need; DuckDB runs the same ANSI recursion, so
  the oracle is near-verbatim.

Derived copies live under $SPARK_GRAFT_SCAN_CACHE (same root as the
layout cache) keyed by source fingerprint: a regenerated fixture can
never serve a stale derived copy. Every builder degrades gracefully —
on any failure (read-only /tmp, no catalog) the queries fall back to
the plain scans, trading the plan shape for unchanged results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.exact import dsum, o_dsum
from fcs_etl_reactor_spark.io import (
    _LAYOUT_ROOT,
    load,
    source_fingerprint,
    table_bytes,
    write_bucketed,
)
from fcs_etl_reactor_spark.queries import query

_BUCKETS = 8


def buckets_for(nbytes: int) -> int:
    """Bucket count from compressed source size (~4 MB per bucket —
    snappy parquet decompresses ~5-10×, so this is ~20-40 MB of scan
    work per bucket), clamped to [8, 4096]. A bucketed scan's
    parallelism is capped at the bucket count, so a fixed small count
    strangles big tables (measured: 8 buckets over 10×-sf0.1 lineitem
    scanned on 8 of 32 cores — 9.5× wall-clock at 10× data;
    size-derived counts restore linear scan fan-out). Both join sides
    must share ONE count for the exchange-free SMJ, so callers derive
    it from the larger side."""
    return int(min(max(nbytes // (4 << 20), 8), 4096))


def bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str, buckets: int = _BUCKETS
) -> DataFrame:
    """Session-catalog bucketed copy of a fixture table (built once
    per source fingerprint; reused across queries in the session).

    Bucketing metadata lives in the catalog, not the files — a plain
    ``spark.read.parquet`` of the same directory would NOT know the
    layout, which is why this goes through ``saveAsTable`` + an
    explicit external path. Falls back to the plain scan on failure.
    """
    fp = source_fingerprint(sf_dir, name)
    tbl = f"fcs_bkt_{name}_{key}_{buckets}_{fp}"
    try:
        if spark.catalog.tableExists(tbl):
            return spark.table(tbl)
        # pid-scoped build dir: the catalog entry is per-process anyway
        # (in-memory catalog), so a shared path bought nothing and let a
        # concurrent process observe a mode('overwrite') mid-write.
        path = os.path.join(_LAYOUT_ROOT, "bucketed", f"{tbl}_{os.getpid()}")
        write_bucketed(
            # one file per bucket: lets the reader trust sortBy order
            # (multi-file buckets force a re-sort before the merge)
            load(spark, sf_dir, name).repartition(buckets, F.col(key)),
            tbl,
            [key],
            buckets,
            path=path,
        )
        return spark.table(tbl)
    except Exception:
        return load(spark, sf_dir, name)


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events re-written ``partitionBy(event_date)`` (one dir per day)
    — the ingest layout that makes date-range scans prune. Built once
    per source fingerprint; falls back to a derived-column scan (same
    rows, no pruning) on failure."""
    fp = source_fingerprint(sf_dir, "events")
    path = os.path.join(_LAYOUT_ROOT, "partitioned", f"events_{fp}")
    try:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # Build in a pid-scoped temp dir and atomically rename into
            # the fingerprint path: a concurrent process can only ever
            # observe the destination complete-or-absent, never
            # mid-write (the returned DataFrame is lazy, so a partial
            # read would escape this try/except).
            tmp = f"{path}.build.{os.getpid()}"
            e = load(spark, sf_dir, "events").withColumn(
                "event_date", F.to_date("ts")
            )
            e.write.partitionBy("event_date").mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, path)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # the rename can lose to a COMPLETE winner (fine) or find a
            # PARTIAL dir from a crashed pre-atomic build — only a
            # _SUCCESS-marked layout may be served, else fall back to
            # the derived-column scan (same rows, no pruning)
            raise OSError(f"incomplete layout at {path}")
        return spark.read.parquet(path)
    except Exception:
        return load(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )


# --------------------------------------------------------------------------
# q2a — bucketed sort-merge join: lineitem ⋈ orders co-located on the
# order key. Plan contract (tests/test_plans.py): with broadcast off,
# NO ShuffleExchange on either side of the SortMergeJoin.
# --------------------------------------------------------------------------


@query(
    "q2a_bucketed_join",
    oracle=f"""
    SELECT
      o.o_orderpriority,
      {o_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q2a_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact with both sides bucketed on the join key: the
    exchange-free sort-merge join. At 100 TB lineitem⋈orders is THE
    shuffle to eliminate — bucketing pays its one-time write cost
    back on every subsequent join against the same key."""
    nb = buckets_for(
        max(table_bytes(sf_dir, "lineitem"), table_bytes(sf_dir, "orders"))
    )
    l = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey", buckets=nb)
    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey", buckets=nb)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q2b — partition-pruned date-range scan: only the 3 matching day
# directories are read. Plan contract: PartitionFilters non-empty,
# partition count pruned (tests/test_plans.py).
# --------------------------------------------------------------------------


@query(
    "q2b_partition_pruned_scan",
    oracle=f"""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      {o_dsum("value", "total_value")}
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY event_type
    """,
)
def q2b_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range rollup over the day-partitioned events layout. The
    predicate lands in PartitionFilters — the scan lists 3 of ~30 day
    directories and never opens the rest. At 100 TB this is the
    difference between reading 10 TB and reading 300 GB."""
    e = partitioned_events(spark, sf_dir)
    return (
        e.filter(
            F.col("event_date").between(
                F.lit("2024-01-10").cast("date"), F.lit("2024-01-12").cast("date")
            )
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )


# --------------------------------------------------------------------------
# q2c — recursive CTE month spine: WITH RECURSIVE generates the
# min..max order-month series (carrying the bound through the
# recursion — no scalar subquery in the recursive step), then
# left-joins monthly order stats onto it. Identical ANSI recursion
# runs on DuckDB, so the oracle is near-verbatim.
# --------------------------------------------------------------------------

# ym = year*12 + (month-1): FLOOR(ym/12.0) and ym%12 recover the
# calendar parts with engine-agnostic arithmetic (bare integer `/`
# rounds on cast in DuckDB but truncates in Spark — FLOOR sidesteps
# it). The bound rides through the recursion as a carried column, so
# the recursive step needs no scalar subquery.
_Q2C_SQL = """
WITH RECURSIVE bounds(lo, hi) AS (
  SELECT
    CAST(MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1) AS BIGINT),
    CAST(MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1) AS BIGINT)
  FROM {orders}
),
months(ym, hi, depth) AS (
  SELECT lo, hi, CAST(0 AS BIGINT) FROM bounds
  UNION ALL
  -- depth guard semantics, per engine: Spark ERRORS first at its own
  -- cteRecursionLevelLimit (well below 1200), so a corrupt far-future
  -- date fails loudly there; this SQL-side cap exists so the DuckDB
  -- oracle cannot spin ~96k rounds on the same input — it TRUNCATES
  -- quietly, which the differ then flags as a row-count mismatch
  SELECT ym + 1, hi, depth + 1 FROM months WHERE ym < hi AND depth < 1200
)
SELECT
  m.ym,
  CAST(FLOOR(m.ym / 12.0) AS BIGINT) AS year,
  CAST(m.ym % 12 + 1 AS BIGINT) AS month,
  COUNT(o.o_orderkey) AS n_orders,
  CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 100.0 AS total_price
FROM (SELECT ym FROM months) m
LEFT JOIN {orders} o
  ON YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) - 1 = m.ym
GROUP BY m.ym
"""


@query("q2c_recursive_month_spine", oracle=_Q2C_SQL.format(orders="orders"))
def q2c_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative SQL without a driver loop: the recursive spine is a
    logical plan node (UnionLoop), distributed like any other — the
    driver never materializes the series. Gap months surface as
    n_orders=0 rows, which a plain GROUP BY would silently drop. The
    oracle is the SAME ANSI text run by DuckDB."""
    view = "q2c_orders"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(_Q2C_SQL.format(orders=view))


# --------------------------------------------------------------------------
# q2d — Z-order (Morton) clustering key: interleave the bits of two
# scan dimensions so rows close in BOTH columns land close in ONE
# sort order. At 100 TB you sort (or range-partition) the table by
# this key at ingest; a conjunctive range predicate on the two
# columns then touches a contiguous band of files, and parquet
# row-group min/max stats skip the rest — multi-column data skipping
# from a single layout. The kernel is pure integer bit arithmetic,
# generated ONCE as SQL text and run verbatim on both engines.
# --------------------------------------------------------------------------

_Z_BITS = 16


def _zorder_sql(a: str, b: str, bits: int = _Z_BITS) -> str:
    """Bit-interleave expression text (identical Spark/DuckDB
    semantics: &, |, <<, >> on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_Z_EXPR = _zorder_sql(f"(l_partkey % {1 << _Z_BITS})", f"(l_suppkey % {1 << _Z_BITS})")


@query(
    "q2d_zorder_key",
    oracle=f"""
    WITH z AS (
      SELECT CAST({_Z_EXPR} AS BIGINT) AS zkey FROM lineitem
    )
    SELECT CAST(zkey >> 12 AS BIGINT) AS zcell,
           COUNT(*) AS n_rows,
           CAST(MIN(zkey) AS BIGINT) AS zmin,
           CAST(MAX(zkey) AS BIGINT) AS zmax
    FROM z
    GROUP BY zcell
    """,
)
def q2d_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys for (l_partkey, l_suppkey), rolled up into coarse
    z-cells (top 10 bits) with per-cell key ranges — the file-level
    min/max index a z-sorted layout would carry. The whole kernel is
    one codegen'd integer expression: no UDF, no shuffle beyond the
    final cell rollup."""
    l = load(spark, sf_dir, "lineitem")
    z = l.select(F.expr(f"CAST({_Z_EXPR} AS BIGINT)").alias("zkey"))
    return (
        z.groupBy(F.shiftright("zkey", 12).cast("bigint").alias("zcell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zkey").cast("bigint").alias("zmin"),
            F.max("zkey").cast("bigint").alias("zmax"),
        )
    )


# --------------------------------------------------------------------------
# q2e — per-key window over a bucketed layout: the windowed analytics
# twin of q2a. Events bucketed on user_id satisfy the window's
# clustering requirement straight off the scan — NO Exchange in the
# plan (asserted in tests/test_plans.py); only the partition-local
# sort on (ts, event_id) remains, which is unavoidable and spills
# gracefully. At 100 TB this removes the full-table shuffle from
# every per-user sequence computation (sessionization, deltas,
# funnels) against the same layout.
# --------------------------------------------------------------------------


@query(
    "q2e_bucketed_window",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_value
    FROM events
    """,
)
def q2e_bucketed_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = bucketed_table(
        spark,
        sf_dir,
        "events",
        "user_id",
        buckets=buckets_for(table_bytes(sf_dir, "events")),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", "value", F.lag("value").over(w).alias("prev_value")
    )


# --------------------------------------------------------------------------
# q2f — hierarchy closure (BOM/org-chart explosion): recursive
# descent over the implicit binary tree on part keys (children of k
# are 2k and 2k+1 — a deterministic DAG over the real part table).
# The recursion depth is O(log n), each step a bounded equi-join of
# the frontier against the parts scan — exactly the shape of a
# bill-of-materials or reporting-hierarchy explosion at scale, where
# the frontier is always ≤ |table| and the step count is the
# hierarchy depth, never the row count. Identical ANSI text runs on
# both engines.
# --------------------------------------------------------------------------

_Q2F_SQL = """
WITH RECURSIVE reach(pk, depth) AS (
  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT c.p_partkey, r.depth + 1
  FROM reach r JOIN {part} c ON c.p_partkey IN (r.pk * 2, r.pk * 2 + 1)
  -- depth guard (same per-engine semantics as q2c's: Spark's own
  -- recursion limit errors first; this cap bounds the DuckDB oracle,
  -- truncating into a differ-visible mismatch rather than spinning):
  -- the key-doubling tree is ~log2(|part|) deep; 62 is
  -- the int64 ceiling, so hitting it means corrupt keys, not data
  WHERE r.depth < 62
)
SELECT depth,
       COUNT(*) AS n_parts,
       CAST(MIN(pk) AS BIGINT) AS min_key,
       CAST(MAX(pk) AS BIGINT) AS max_key
FROM reach
GROUP BY depth
"""


@query("q2f_tree_closure", oracle=_Q2F_SQL.format(part="part"))
def q2f_tree_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reachability from the root with per-level rollup; gaps in the
    part table prune whole subtrees, so the result encodes real data,
    not just arithmetic."""
    view = "q2f_part"
    load(spark, sf_dir, "part").createOrReplaceTempView(view)
    return spark.sql(_Q2F_SQL.format(part=view))


# --------------------------------------------------------------------------
# q2g — schema-evolution read (mergeSchema): a table written in two
# epochs whose schemas differ (epoch 2 added o_orderpriority), read
# back as ONE DataFrame via Spark's parquet schema merging — the
# lakehouse ingest reality where producers add columns over time and
# the reader must union old and new files without a rewrite. Rows
# from the pre-evolution epoch surface the added column as NULL; the
# oracle replays the epoch split (o_orderdate < 1995-07-01) straight
# from orders, so the hash certifies both the merged read and the
# NULL semantics. At 100 TB: mergeSchema costs a footer read per
# file at planning — acceptable for epoch-count files; for
# millions of files you'd pin the merged schema in a catalog
# (schema-on-read with the same union semantics as here).
# --------------------------------------------------------------------------

_EVO_CUTOFF = "1995-07-01"


def _evolved_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch parquet copy of orders (epoch 1 without
    o_orderpriority, epoch 2 with it), fingerprint-cached and built
    with the same atomic-rename discipline as the other derived
    layouts. Falls back to an in-plan union twin on any failure."""
    o = load(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit(_EVO_CUTOFF)).select(
        "o_orderkey", "o_totalprice"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit(_EVO_CUTOFF)).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    fp = source_fingerprint(sf_dir, "orders")
    path = os.path.join(_LAYOUT_ROOT, "evolved", f"orders_{fp}")
    try:
        if not os.path.exists(os.path.join(path, "epoch2", "_SUCCESS")):
            tmp = f"{path}.build.{os.getpid()}"
            early.write.mode("overwrite").parquet(os.path.join(tmp, "epoch1"))
            late.write.mode("overwrite").parquet(os.path.join(tmp, "epoch2"))
            try:
                os.rename(tmp, path)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "epoch2", "_SUCCESS")):
            raise OSError(f"incomplete layout at {path}")  # -> exact fallback
        from fcs_etl_reactor_spark.io import read_parquet_evolving

        return read_parquet_evolving(
            spark, os.path.join(path, "epoch1"), os.path.join(path, "epoch2")
        )
    except Exception:
        # layout unavailable: same rows via unionByName(allowMissingColumns)
        return late.unionByName(early, allowMissingColumns=True)


@query(
    "q2g_schema_evolution",
    oracle=f"""
    SELECT
      CASE WHEN o_orderdate < DATE '{_EVO_CUTOFF}' THEN NULL
           ELSE o_orderpriority END AS priority,
      COUNT(*) AS n_orders,
      {o_dsum("o_totalprice", "total_price", "100.0")}
    FROM orders
    GROUP BY 1
    """,
)
def q2g_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate across the evolved epochs: pre-evolution rows carry
    NULL for the added column and must group into their own bucket
    with exact totals — proving merged-schema reads lose no rows and
    invent no values."""
    merged = _evolved_orders(spark, sf_dir)
    return (
        merged.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price", scale=100.0),
        )
    )


# --------------------------------------------------------------------------
# q2h — zone-map data skipping on a NON-partition column: the file-
# level min/max pruning that Delta/Iceberg data skipping and parquet
# row-group stats give a sorted layout. The layout pass range-sorts
# events by `value` into N files (each covering a tight value band);
# the zone map is #files (min,max) rows; a value-band query consults
# the map driver-side (bounded: #files rows) and opens ONLY the
# overlapping files. Distinct from q2b: partition pruning keys on a
# directory column, zone maps exploit WITHIN-layout sort order — at
# 100 TB this is the footer-stats path that turns a 10% band scan
# into reading ~10% of files with no repartition-by-band needed.
# Falls back to the plain filtered scan (same rows, no skipping) if
# the layout or map build fails.
# --------------------------------------------------------------------------

_ZONE_FILES = 16
_ZONE_LO, _ZONE_HI = 120.0, 160.0


def _zone_sorted_events(spark: SparkSession, sf_dir: str) -> str:
    """Events range-sorted by `value` into _ZONE_FILES files — built
    once per source fingerprint with the atomic-rename discipline."""
    fp = source_fingerprint(sf_dir, "events")
    path = os.path.join(_LAYOUT_ROOT, "zonemap", f"events_{fp}_{_ZONE_FILES}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        (
            load(spark, sf_dir, "events")
            .repartitionByRange(_ZONE_FILES, F.col("value"))
            .sortWithinPartitions("value")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise OSError(f"incomplete zone layout at {path}")
    return path


@query(
    "q2h_zonemap_skip",
    oracle=f"""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      {o_dsum("value", "total_value")}
    FROM events
    WHERE value BETWEEN {_ZONE_LO} AND {_ZONE_HI}
    GROUP BY event_type
    """,
)
def q2h_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = F.col("value").between(_ZONE_LO, _ZONE_HI)
    agg_cols = [
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
    ]
    try:
        path = _zone_sorted_events(spark, sf_dir)
        # zone map: per-file (min,max) — at scale this comes from
        # parquet footers / table-format stats, never a data scan; the
        # collected map is #files rows on the driver, by construction
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
            .collect()
        )
        keep = [
            r["f"] for r in stats if r["lo"] <= _ZONE_HI and r["hi"] >= _ZONE_LO
        ]
        if not keep or len(keep) >= len(stats):
            raise ValueError("zone map did not prune")
        src = spark.read.parquet(*keep)
    except Exception:
        src = load(spark, sf_dir, "events")
    return src.filter(band).groupBy("event_type").agg(*agg_cols)


# --------------------------------------------------------------------------
# q2i — small-file compaction (the OPTIMIZE maintenance op): compact
# the 16-file zone layout into 4 larger files while PRESERVING the
# value sort order, so zone-map skipping keeps working after
# compaction. The rewrite is one range repartition of the already-
# sorted layout; the query then verifies the invariants that make the
# compacted layout trustworthy — row count conserved, file count
# reduced to the target, and the new files still value-disjoint
# (max_stab = 1, checked across the ≤4-row stats table). At 100 TB
# this is the nightly job that keeps file counts from exploding
# without destroying clustering.
# --------------------------------------------------------------------------

_COMPACT_FILES = 4


def _compacted_events(spark: SparkSession, sf_dir: str) -> str:
    src = _zone_sorted_events(spark, sf_dir)
    path = os.path.join(
        _LAYOUT_ROOT, "compacted", f"events_{source_fingerprint(sf_dir, 'events')}_{_COMPACT_FILES}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        (
            spark.read.parquet(src)
            .repartitionByRange(_COMPACT_FILES, F.col("value"))
            .sortWithinPartitions("value")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise OSError(f"incomplete compacted layout at {path}")
    return path


@query(
    "q2i_compaction",
    oracle=f"""
    SELECT CAST({_ZONE_FILES} AS BIGINT) AS files_before,
           CAST({_COMPACT_FILES} AS BIGINT) AS files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS still_disjoint
    FROM events
    """,
)
def q2i_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    before = _zone_sorted_events(spark, sf_dir)
    after = _compacted_events(spark, sf_dir)
    n_before = (
        spark.read.parquet(before)
        .select(F.input_file_name().alias("f"))
        .agg(F.count_distinct("f").cast("bigint").alias("files_before"))
    )
    stats = (
        spark.read.parquet(after)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    # disjointness across the ≤4-row stats table: no file's range may
    # start before a lower file ends (bounded self-join)
    s1, s2 = stats.alias("s1"), stats.alias("s2")
    overlaps = (
        s1.join(
            s2,
            (F.col("s1.f") < F.col("s2.f"))
            & (F.col("s1.lo") <= F.col("s2.hi"))
            & (F.col("s2.lo") <= F.col("s1.hi")),
        )
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    after_agg = stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("files_after"),
        F.sum("c").cast("bigint").alias("n_rows"),
    )
    return (
        n_before.crossJoin(F.broadcast(after_agg))
        .crossJoin(F.broadcast(overlaps))
        .select(
            "files_before",
            "files_after",
            "n_rows",
            (F.col("n_overlap") == 0).alias("still_disjoint"),
        )
    )


# --------------------------------------------------------------------------
# q2j — ANALYZE TABLE statistics collection (the CBO feed): register
# orders as a catalog table, run ANALYZE ... COMPUTE STATISTICS (and
# per-column stats for the join key), then read the row count back
# from the catalog and verify it against the actual scan. At 100 TB
# accurate catalog stats are what let the cost-based optimizer choose
# broadcast sides and join orders without runtime sampling; this
# entry proves the collection round-trips. Stats parse from DESCRIBE
# EXTENDED (the public surface); the table is session-scoped.
# --------------------------------------------------------------------------


@query(
    "q2j_analyze_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_actual,
           CAST(COUNT(*) AS BIGINT) AS n_rows_stats,
           TRUE AS stats_match
    FROM orders
    """,
)
def q2j_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = source_fingerprint(sf_dir, "orders")
    # pid suffix keeps concurrent drivers from racing on saveAsTable;
    # the table is dropped (with its warehouse files) once the stats
    # are read back, so spark-warehouse never accumulates one full
    # orders copy per process.
    tbl = f"fcs_stats_orders_{fp}_{os.getpid()}"
    try:
        if not spark.catalog.tableExists(tbl):
            load(spark, sf_dir, "orders").write.saveAsTable(tbl)
            spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
            spark.sql(
                f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_orderkey"
            )
        rows = spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
        stats_line = next(
            (r["data_type"] for r in rows if r["col_name"] == "Statistics"), ""
        )
        import re

        m = re.search(r"(\d+) rows", stats_line)
        n_stats = int(m.group(1)) if m else -1
        actual = spark.table(tbl).count()  # bounded: one count for the audit
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return spark.createDataFrame(
        [(actual, n_stats, actual == n_stats)],
        "n_rows_actual bigint, n_rows_stats bigint, stats_match boolean",
    )


# --------------------------------------------------------------------------
# q2k — federated multi-format join: nation lives as CSV, region as
# JSON, customer as parquet — one lazy plan joins all three (the
# "query the lake as it is" capability; format conversion happens in
# the scan, not as a prep step). The CSV/JSON copies are derived from
# the fixtures once (atomic-rename discipline) so the oracle over the
# parquet originals is exact. Broadcast dims, one aggregation.
# --------------------------------------------------------------------------


def _format_copy(spark: SparkSession, sf_dir: str, name: str, fmt: str) -> str:
    fp = source_fingerprint(sf_dir, name)
    path = os.path.join(_LAYOUT_ROOT, "federated", f"{name}_{fmt}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        w = load(spark, sf_dir, name).coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(tmp)
        else:
            w.json(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise OSError(f"incomplete federated copy at {path}")
    return path


@query(
    "q2k_federated_join",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q2k_federated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    try:
        n = (
            spark.read.option("header", True)
            .schema("n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string")
            .csv(_format_copy(spark, sf_dir, "nation", "csv"))
        )
        r = spark.read.schema(
            "r_regionkey bigint, r_name string, r_comment string"
        ).json(_format_copy(spark, sf_dir, "region", "json"))
    except Exception:
        n = load(spark, sf_dir, "nation")
        r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("acctbal_cents"),
        )
    )


# --------------------------------------------------------------------------
# q2l — the modern SQL session surface in one flow: DECLARE a session
# VARIABLE, SET it from a scalar subquery, reference it from a
# parameterized spark.sql (named :param binding — the
# injection-safe API), and run the final statement through EXECUTE
# IMMEDIATE. Each Spark 4 surface the SQL workload migration guide
# leans on; the oracle is the equivalent constant-folded filter.
# --------------------------------------------------------------------------


@query(
    "q2l_sql_variables",
    oracle="""
    WITH t AS (SELECT AVG(o_totalprice) AS cutoff FROM orders)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_above
    FROM orders, t
    WHERE o_totalprice > cutoff
    GROUP BY o_orderpriority
    """,
)
def q2l_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE fcs_cutoff DOUBLE")
    spark.sql(
        "SET VAR fcs_cutoff = (SELECT AVG(o_totalprice) FROM orders)"
    )
    # parameterized binding exercises the injection-safe API on the
    # same session state the variable holds
    bound = spark.sql(
        "SELECT CAST(:probe AS INT) AS ok", args={"probe": 1}
    ).collect()[0]["ok"]
    assert bound == 1
    return spark.sql(
        """EXECUTE IMMEDIATE
           'SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above
            FROM orders WHERE o_totalprice > fcs_cutoff
            GROUP BY o_orderpriority'"""
    )


# --------------------------------------------------------------------------
# q2m — SQL pipe syntax (Spark 4's |> operator surface, the other
# half of the modern-SQL migration story q2l starts): the same
# logical plan a nested SELECT builds, written as a linear FROM |>
# WHERE |> AGGREGATE ... |> ORDER BY flow. The pipe parser lowers to
# the identical Catalyst plan (same pushdown, same partial
# aggregation), so this is a parser-surface row with a plain-SQL
# oracle — proving a user can migrate pipe-syntax workloads verbatim.
# --------------------------------------------------------------------------


@query(
    "q2m_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS qty_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q2m_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |> AGGREGATE
             CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS qty_cents,
             CAST(COUNT(*) AS BIGINT) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, qty_cents, n_rows
        """
    )


# --------------------------------------------------------------------------
# q2n — LATERAL correlated-subquery join (the third modern-SQL
# surface after q2l variables and q2m pipes): "for each region, the
# top-2 orders by price among its customers", written as
# `region, LATERAL (SELECT ... WHERE correlated ORDER BY ... LIMIT 2)`.
# Catalyst decorrelates the LIMIT-in-correlated-subquery into a
# partitioned row_number window over one shuffled join — no
# per-outer-row re-execution — so the lateral surface costs the same
# plan a hand-written top-k-per-group (q44) does. Deterministic
# tie-break (price DESC, orderkey) keeps both engines exact.
# --------------------------------------------------------------------------


@query(
    "q2n_lateral_join",
    oracle="""
    SELECT r.r_name, t.o_orderkey, t.price_cents
    FROM region r, LATERAL (
      SELECT o.o_orderkey,
             CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 2
    ) t
    """,
)
def q2n_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name, t.o_orderkey, t.price_cents
        FROM region r, LATERAL (
          SELECT o.o_orderkey,
                 CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS price_cents
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t
        """
    )


# --------------------------------------------------------------------------
# q2o — GROUP BY ALL / ORDER BY ALL (the fourth modern-SQL surface
# after q2l/q2m/q2n): every non-aggregate select item groups
# implicitly, the full select list orders implicitly. Pure parser
# sugar — Catalyst resolves to the identical aggregate the explicit
# GROUP BY builds (same partial aggregation, same pushdown) — so the
# oracle is the explicit-SQL twin.
# --------------------------------------------------------------------------


@query(
    "q2o_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority, n, price_cents
    """,
)
def q2o_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# --------------------------------------------------------------------------
# q2p — join-strategy hints: the plan-control surface every tuned
# workload uses when the optimizer's size estimates are wrong at
# 100 TB (a "small" side that isn't, a broadcast that OOMs). The
# query forces the customer⋈orders join through SHUFFLE_MERGE and the
# nation attach through SHUFFLE_HASH — overriding the broadcast both
# would otherwise get — and the result must equal the plain-SQL
# oracle (hints steer the physical strategy, never the semantics).
# tests/test_plans.py asserts the hinted nodes actually materialize
# (SortMergeJoin / ShuffledHashJoin in place of BroadcastHashJoin).
# --------------------------------------------------------------------------


@query(
    "q2p_join_hints",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q2p_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").hint("SHUFFLE_MERGE")
    n = load(spark, sf_dir, "nation").hint("SHUFFLE_HASH")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
            )
            .cast("bigint")
            .alias("price_cents"),
        )
    )


# --------------------------------------------------------------------------
# q2q — null-aware NOT IN anti-join: the SQL semantic q13's NOT
# EXISTS does NOT share. `k NOT IN (subquery)` is three-valued: one
# NULL in the subquery makes every membership test UNKNOWN, so the
# result is EMPTY — the classic migration trap, and a dedicated
# physical join flavor in Spark (null-aware anti join). The query
# runs both arms — the clean subquery (plain anti-join count) and the
# NULL-polluted subquery (must count 0) — so the hash pins the exact
# three-valued behavior in both engines.
# --------------------------------------------------------------------------


@query(
    "q2q_null_aware_anti",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
        AS n_clean,
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN
         (SELECT NULLIF(o_custkey, o_custkey) FROM orders
          WHERE o_totalprice > 400000))
        AS n_with_null_subquery
    """,
)
def q2q_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM customer
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
            AS n_clean,
          (SELECT COUNT(*) FROM customer
           WHERE c_custkey NOT IN
             (SELECT NULLIF(o_custkey, o_custkey) FROM orders
              WHERE o_totalprice > 400000))
            AS n_with_null_subquery
        """
    )


# --------------------------------------------------------------------------
# q2r — rendezvous (highest-random-weight) sharding. Round-robin (q6i)
# balances perfectly but reshuffles EVERYTHING when the shard count
# changes; HRW assigns each key to argmax_s score(key, s) so growing
# N -> N+1 moves only the keys whose new shard wins the argmax —
# 1/(N+1) of the data in expectation, the property that matters when a
# 100 TB corpus gains a shard. Score = md5(key || ':' || shard): a
# pure projection (key x N fanout is map-side, no shuffle until the
# final histogram), deterministic and engine-portable — both engines
# compare the same lowercase hex strings, so the assignment (and the
# moved-fraction measurement below) hash-matches exactly.
# --------------------------------------------------------------------------

_HRW_SHARDS = 8


@query(
    "q2r_rendezvous_sharding",
    oracle=f"""
    WITH s8 AS (
      SELECT doc_id,
             ARG_MAX(s, MD5(CAST(doc_id AS VARCHAR) || ':' ||
                            CAST(s AS VARCHAR))) AS shard
      FROM documents, UNNEST(RANGE({_HRW_SHARDS})) AS t(s)
      GROUP BY doc_id
    ), s9 AS (
      SELECT doc_id,
             ARG_MAX(s, MD5(CAST(doc_id AS VARCHAR) || ':' ||
                            CAST(s AS VARCHAR))) AS shard
      FROM documents, UNNEST(RANGE({_HRW_SHARDS + 1})) AS t(s)
      GROUP BY doc_id
    ), moved AS (
      SELECT COUNT(*) AS n_total,
             SUM(CASE WHEN s8.shard <> s9.shard THEN 1 ELSE 0 END)
               AS n_moved
      FROM s8 JOIN s9 USING (doc_id)
    )
    SELECT CAST(s8.shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           MAX(moved.n_total) AS n_total,
           CAST(MAX(moved.n_moved) AS BIGINT) AS n_moved,
           CAST(MAX(moved.n_moved) * 100 // MAX(moved.n_total) AS BIGINT)
             AS moved_pct
    FROM s8 CROSS JOIN moved
    GROUP BY s8.shard
    """,
)
def q2r_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRW shard histogram at N=8 plus the minimal-movement proof at
    N=9 (n_moved ≈ n/9, vs n·8/9 for `key % N`). Plan shape: one scan,
    two map-side argmax folds over a broadcast-exploded shard range
    (no shuffle until the 8-row histogram), n_moved attached as a
    1-row broadcast."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    def hrw(n: int):
        return F.expr(
            "array_max(transform(sequence(0, {m}), "
            "s -> struct(md5(concat(cast(doc_id as string), ':', "
            "cast(s as string))) as h, cast(s as bigint) as s))).s".format(
                m=n - 1
            )
        )

    assigned = d.select(
        "doc_id",
        hrw(_HRW_SHARDS).alias("shard"),
        hrw(_HRW_SHARDS + 1).alias("shard9"),
    )
    moved = assigned.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("shard") != F.col("shard9"), 1).otherwise(0)
        ).alias("n_moved"),
    )
    return (
        assigned.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(moved))
        .select(
            "shard",
            "n_docs",
            "n_total",
            F.col("n_moved").cast("bigint").alias("n_moved"),
            F.expr("n_moved * 100 div n_total").alias("moved_pct"),
        )
    )


# --------------------------------------------------------------------------
# q2s — bloom-filter file skipping: the point-lookup complement to
# q2h's min/max zonemaps. A zonemap prunes only when the key
# correlates with file layout; a per-file bloom prunes point lookups
# on ANY column, layout-correlated or not — exactly what Parquet
# bloom filters / Delta & Iceberg file-level blooms do for needle
# queries over 100 TB. The index here is one row per file with a
# ≤256-element bit set (k=3 hashes into m=256 bits, bit = first two
# hex digits of md5(value:seed)) — metadata-sized, built in one scan
# with a map-side-combinable collect_set, probed with ZERO data scan.
# The measured output includes the bloom's false positives (files
# flagged candidate that don't actually contain the probe value):
# both engines compute the identical bit sets from the identical md5,
# so the skip decision — FPs included — hash-matches exactly.
# --------------------------------------------------------------------------

_BLOOM_FILES = 16
_BLOOM_HASHES = ("0", "1", "2")


def _bloom_bit_sql(val: str, seed: str) -> str:
    """Bit position 0..255 from two hex digits of md5(val:seed) —
    engine-portable SQL (md5/concat/substr/instr mean the same in
    Spark and DuckDB)."""
    h = f"md5(concat({val}, ':', {seed}))"
    return (
        f"(instr('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16 + "
        f"(instr('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


@query(
    "q2s_bloom_file_skip",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, n_chars, doc_id % {_BLOOM_FILES} AS file_id
      FROM documents
    ), probe AS (
      SELECT n_chars AS pv FROM documents ORDER BY doc_id LIMIT 1
    ), seeds AS (
      SELECT UNNEST(['{"','".join(_BLOOM_HASHES)}']) AS i
    ), fbits AS (
      SELECT DISTINCT file_id,
        {_bloom_bit_sql('CAST(n_chars AS VARCHAR)', 'i')} AS bit
      FROM base, seeds
    ), pbits AS (
      SELECT DISTINCT {_bloom_bit_sql('CAST(pv AS VARCHAR)', 'i')} AS bit
      FROM probe, seeds
    ), cand AS (
      SELECT f.file_id, COUNT(DISTINCT f.bit) AS hits
      FROM fbits f JOIN pbits p ON f.bit = p.bit GROUP BY 1
    ), stats AS (
      SELECT file_id, COUNT(*) AS n_docs,
             COUNT(DISTINCT n_chars) AS n_vals,
             MAX(CASE WHEN n_chars = (SELECT pv FROM probe)
                      THEN 1 ELSE 0 END) AS actual_hit
      FROM base GROUP BY 1
    )
    SELECT s.file_id, s.n_docs, CAST(s.n_vals AS BIGINT) AS n_vals,
           CAST(CASE WHEN COALESCE(c.hits, 0) =
                     (SELECT COUNT(DISTINCT bit) FROM pbits)
                THEN 1 ELSE 0 END AS BIGINT) AS bloom_candidate,
           CAST(s.actual_hit AS BIGINT) AS actual_hit
    FROM stats s LEFT JOIN cand c USING (file_id)
    ORDER BY s.file_id
    """,
)
def q2s_bloom_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .withColumn("file_id", F.expr(f"doc_id % {_BLOOM_FILES}"))
    )
    probe = d.groupBy().agg(F.expr("min_by(n_chars, doc_id)").alias("pv"))

    def bits_array(val: str):
        return F.array(
            *[F.expr(_bloom_bit_sql(val, f"'{s}'")) for s in _BLOOM_HASHES]
        )

    file_bits = (
        d.select("file_id", F.explode(bits_array("cast(n_chars as string)")).alias("bit"))
        .groupBy("file_id")
        .agg(F.collect_set("bit").alias("bits"))
    )
    stats = (
        d.join(F.broadcast(probe))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("n_chars").alias("n_vals"),
            F.max(
                (F.col("n_chars") == F.col("pv")).cast("bigint")
            ).alias("actual_hit"),
        )
    )
    pbits = probe.select(
        F.array_distinct(bits_array("cast(pv as string)")).alias("pbits")
    )
    return (
        stats.join(file_bits, "file_id")
        .join(F.broadcast(pbits))
        .select(
            "file_id",
            "n_docs",
            "n_vals",
            F.expr(
                "cast(forall(pbits, b -> array_contains(bits, b)) as bigint)"
            ).alias("bloom_candidate"),
            "actual_hit",
        )
        .orderBy("file_id")
    )


# --------------------------------------------------------------------------
# q2t — MERGE INTO statement surface (round-9 mint; closes the gap the
# round-8 verdict named: q7b proves the merge ALGEBRA, but a user
# migrating MERGE workloads writes the STATEMENT). Vanilla Spark only
# executes MERGE against a merge-capable v2 catalog (Delta/Iceberg —
# none ships here), so operators/merge.merge_into_sql implements the
# statement surface and lowers it to the exact relational algebra
# those formats implement underneath: survivors left-anti, matched
# case-cascade honoring ANSI first-clause-wins (conditional DELETE,
# then UPDATE), source left-anti for INSERT *. One shuffle on the
# merge key (broadcast when the batch is bounded); untouched rows
# never rewrite. The update/insert batch is derived deterministically
# from orders so both engines replay it; output is the post-merge
# status rollup (bounded), not the full table.
# --------------------------------------------------------------------------


@query(
    "q2t_merge_into_sql",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT -o_orderkey, o_custkey, 'N', o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders WHERE o_orderkey % 101 = 0
    ), merged AS (
      SELECT t.* FROM orders t
      WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
      UNION ALL
      SELECT t.o_orderkey, t.o_custkey, s.o_orderstatus, s.o_totalprice,
             t.o_orderdate, t.o_orderpriority
      FROM orders t JOIN src s USING (o_orderkey)
      WHERE t.o_orderstatus <> 'F'
      UNION ALL
      SELECT s.* FROM src s
      WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT))
                AS BIGINT) AS price_cents
    FROM merged GROUP BY o_orderstatus
    """,
)
def q2t_merge_into_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views
    from fcs_etl_reactor_spark.operators.merge import merge_into_sql

    register_views(spark, sf_dir)
    merged = merge_into_sql(
        spark,
        """
        MERGE INTO orders AS t
        USING (
          SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                 o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
                 o_orderpriority
          FROM orders WHERE o_orderkey % 97 = 0
          UNION ALL
          SELECT -o_orderkey AS o_orderkey, o_custkey,
                 'N' AS o_orderstatus, o_totalprice, o_orderdate,
                 o_orderpriority
          FROM orders WHERE o_orderkey % 101 = 0
        ) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
        WHEN MATCHED THEN UPDATE SET
          o_totalprice = s.o_totalprice, o_orderstatus = s.o_orderstatus
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("price_cents"),
    )


# --------------------------------------------------------------------------
# q2w — MERGE columns-list INSERT (round-10 mint; the grammar edge
# q2t's INSERT * can't reach): WHEN NOT MATCHED [AND cond] THEN
# INSERT (cols) VALUES (exprs) — listed columns take their expression
# cast to the target column type, UNLISTED target columns are NULL
# (the lakehouse formats' column-list semantics), and the AND
# condition gates which unmatched source rows insert at all. The
# source batch keys are all negative so nothing matches — this is
# also the INSERT-only disposition (every target row must pass
# through untouched; the round-10 fix for the silent matched-row
# drop). The rollup counts NULL o_custkey per status so the NULL-fill
# behavior is IN the value hash, not just the row count.
# --------------------------------------------------------------------------


@query(
    "q2w_merge_insert_cols",
    oracle="""
    WITH src AS (
      SELECT -o_orderkey AS k, o_totalprice AS p
      FROM orders WHERE o_orderkey % 101 = 0
    ), merged AS (
      SELECT o_orderstatus, o_totalprice, o_custkey FROM orders
      UNION ALL
      -- the NOT IN arm replays NOT MATCHED: o_orderkey 0 exists in the
      -- fixtures, so its negated batch key matches itself and must NOT
      -- insert (the batch is not match-free by construction)
      SELECT 'I', p + 10.0, NULL FROM src
      WHERE p > 1000.0 AND k NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT))
                AS BIGINT) AS price_cents,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_custkeys
    FROM merged GROUP BY o_orderstatus
    """,
)
def q2w_merge_insert_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views
    from fcs_etl_reactor_spark.operators.merge import merge_into_sql

    register_views(spark, sf_dir)
    merged = merge_into_sql(
        spark,
        """
        MERGE INTO orders AS t
        USING (
          SELECT -o_orderkey AS k, o_totalprice AS p
          FROM orders WHERE o_orderkey % 101 = 0
        ) AS s
        ON t.o_orderkey = s.k
        WHEN NOT MATCHED AND s.p > 1000.0 THEN
          INSERT (o_orderkey, o_totalprice, o_orderstatus)
          VALUES (s.k, s.p + 10.0, 'I')
        """,
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("price_cents"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_custkeys"),
    )


# --------------------------------------------------------------------------
# q2x — MERGE WHEN NOT MATCHED BY SOURCE (round-10 mint; the third
# ANSI disposition, absent from q2t/q2w): target rows with NO source
# match go through their own first-TRUE-wins cascade — conditional
# DELETE, then unconditional UPDATE — while matched rows take the
# ordinary matched cascade. This is the statement a retention sweep
# or a full-snapshot sync writes (delete/stamp everything the new
# snapshot no longer contains). The oracle replays the disposition
# split as UNION ALL arms over the same deterministic source.
# --------------------------------------------------------------------------


@query(
    "q2x_merge_by_source",
    oracle="""
    WITH merged AS (
      SELECT o_orderstatus, 'KEEP' AS o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderstatus, 'STALE', o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderstatus <> 'F'
    )
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT))
                AS BIGINT) AS price_cents
    FROM merged GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q2x_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views
    from fcs_etl_reactor_spark.operators.merge import merge_into_sql

    register_views(spark, sf_dir)
    merged = merge_into_sql(
        spark,
        """
        MERGE INTO orders AS t
        USING (
          SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0
        ) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_orderpriority = 'KEEP'
        WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F' THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderpriority = 'STALE'
        """,
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return merged.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("price_cents"),
    )


# --------------------------------------------------------------------------
# q2u — UNPIVOT SQL surface (round-9 mint; the statement-level dual of
# q72's pivot / q73's stack()-based unpivot): wide → long directly in
# the FROM clause, the migration surface a reporting workload actually
# writes. Spark resolves UNPIVOT to the same Expand node stack()
# builds — one scan, no shuffle, row fanout = #measures — so this is a
# parser-surface row; DuckDB's native UNPIVOT is the oracle. Measures
# are pre-scaled to BIGINT cents in a subquery (UNPIVOT requires one
# common type, and integer cents keep the hash engine-exact).
# --------------------------------------------------------------------------


@query(
    "q2u_unpivot_sql",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
      UNPIVOT (
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty_c,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c,
               CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS disc_c,
               CAST(FLOOR(l_tax * 100.0 + 0.5) AS BIGINT) AS tax_c
        FROM lineitem WHERE l_orderkey % 50 = 0
      ) ON qty_c, price_c, disc_c, tax_c INTO NAME metric VALUE val
    )
    """,
)
def q2u_unpivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (
          SELECT l_orderkey, l_linenumber,
                 CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty_c,
                 CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   AS price_c,
                 CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS disc_c,
                 CAST(FLOOR(l_tax * 100.0 + 0.5) AS BIGINT) AS tax_c
          FROM lineitem WHERE l_orderkey % 50 = 0
        ) UNPIVOT (val FOR metric IN (qty_c, price_c, disc_c, tax_c))
        """
    )


# --------------------------------------------------------------------------
# q2v — LIMIT/OFFSET pagination surface (round-9 mint): page 3 of a
# deterministically ordered report (ORDER BY total DESC, key LIMIT 20
# OFFSET 40). OFFSET is only well-defined over a TOTAL order — the
# unique-key tiebreak is what makes page boundaries engine- and
# partitioning-stable, the same discipline every ORDER BY in this repo
# follows. Spark plans the combination as a single
# CollectLimit/TakeOrderedAndProject of offset+limit rows (never a
# full global sort materialization); the page is then sliced — at
# 100 TB you'd keyset-paginate instead (WHERE key > last_seen), but
# the OFFSET surface is what BI tools emit.
# --------------------------------------------------------------------------


@query(
    "q2v_limit_offset",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT))
                AS BIGINT) AS spend_cents
    FROM orders GROUP BY o_custkey
    ORDER BY spend_cents DESC, o_custkey
    LIMIT 20 OFFSET 40
    """,
)
def q2v_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                 AS spend_cents
        FROM orders GROUP BY o_custkey
        ORDER BY spend_cents DESC, o_custkey
        LIMIT 20 OFFSET 40
        """
    )


# --------------------------------------------------------------------------
# q2y — keyset (seek-method) pagination (round-10 mint; the 100 TB
# form q2v's docstring names): instead of OFFSET-skipping N rows —
# which at scale still sorts/discards everything before the page —
# the client passes the LAST ROW of the previous page as a cursor and
# the next page is a pure PREDICATE on the total order
# (date > D OR (date = D AND key > K)) + LIMIT. The predicate reaches
# the parquet scan as PushedFilters (both arms compare scan columns
# to literals) and the plan is a TakeOrderedAndProject over the
# filtered scan — page cost is O(page + scan-after-pruning),
# independent of how deep the pagination is. The oracle is the
# OFFSET formulation of the SAME page: rank every row in the total
# order and take ranks (|rows <= cursor|, +20] — two independent
# derivations of one page, so a seek-predicate boundary bug (>= vs >,
# tie handling on the composite key) is a hash mismatch.
# (o_orderkey is unique, so the (o_orderdate, o_orderkey) order is
# total and the page is deterministic in both engines.)
# --------------------------------------------------------------------------

_KEYSET_CURSOR_DATE = "1995-06-15 00:00:00"
_KEYSET_CURSOR_KEY = 12345


@query(
    "q2y_keyset_pagination",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderkey, o_orderdate,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
             ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ), cur AS (
      SELECT COUNT(*) AS n FROM orders
      WHERE o_orderdate < TIMESTAMP '{_KEYSET_CURSOR_DATE}'
         OR (o_orderdate = TIMESTAMP '{_KEYSET_CURSOR_DATE}'
             AND o_orderkey <= {_KEYSET_CURSOR_KEY})
    )
    SELECT o_orderkey, o_orderdate, price_cents
    FROM ranked, cur
    WHERE rn > cur.n AND rn <= cur.n + 20
    """,
)
def q2y_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_orderdate,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        FROM orders
        WHERE o_orderdate > TIMESTAMP '{_KEYSET_CURSOR_DATE}'
           OR (o_orderdate = TIMESTAMP '{_KEYSET_CURSOR_DATE}'
               AND o_orderkey > {_KEYSET_CURSOR_KEY})
        ORDER BY o_orderdate, o_orderkey
        LIMIT 20
        """
    )


# --------------------------------------------------------------------------
# q9z — SQL scripting (round-11 mint; Spark 4 SQL scripting,
# SPARK-48338, gated by spark.sql.scripting.enabled): a BEGIN…END
# block with DECLARE'd local variables and a data-coupled WHILE loop —
# the stored-procedure-shaped control flow an analyst migrates from a
# warehouse. The script ratchets a price cutoff down 0.1% per round
# (integer cents arithmetic, so the sequence is exactly replayable)
# until at least 100 orders qualify, then aggregates the qualifying
# orders; cutoff_cents and n_rounds are OUTPUT columns, so the two
# engines must agree on the loop's termination DECISION, not just the
# final aggregate (the q1z oracle pattern). The DuckDB oracle replays
# the loop as a recursive CTE over the same integer sequence. The
# escalation is real and SF-dependent: ~9 rounds at sf0.01, ~40+ at
# sf0.001 (sparser top tail). Scale shape: each loop round is one
# pushed-down count scan; the loop is driver-side control flow over
# bounded (count << rounds·scan) work — exactly how a cluster runs a
# warehouse-migrated script.
# --------------------------------------------------------------------------


@query(
    "q9z_sql_scripting",
    oracle="""
    WITH RECURSIVE cents AS (
      SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
             o_orderpriority AS prio
      FROM orders
    ), ladder(r, cutoff) AS (
      SELECT 0, (SELECT MAX(c) FROM cents)
      UNION ALL
      SELECT r + 1, cutoff - GREATEST(cutoff // 1000, 1)
      FROM ladder
      WHERE cutoff > 0
        AND (SELECT COUNT(*) FROM cents WHERE c >= cutoff) < 100
    ), pick AS (
      SELECT cutoff, r FROM ladder ORDER BY r DESC LIMIT 1
    )
    SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_orders,
           (SELECT cutoff FROM pick) AS cutoff_cents,
           CAST((SELECT r FROM pick) AS INT) AS n_rounds
    FROM cents WHERE c >= (SELECT cutoff FROM pick)
    GROUP BY prio
    """,
)
def q9z_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff BIGINT DEFAULT 0;
          DECLARE rounds INT DEFAULT 0;
          SET cutoff = (SELECT MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                                        AS BIGINT)) FROM orders);
          WHILE cutoff > 0
                AND (SELECT COUNT(*) FROM orders
                     WHERE CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                           >= cutoff) < 100 DO
            -- GREATEST(..., 1) keeps the decay strictly decreasing once
            -- cutoff < 1000 (where DIV 1000 = 0 would stall), and the
            -- cutoff > 0 guard terminates even on a sub-100-row table:
            -- the ladder can never loop forever on ANY input. On the
            -- driver fixtures both guards are inert (cutoff stays in
            -- the tens of millions of cents), so the oracle replay --
            -- which mirrors both guards -- is unchanged there.
            SET cutoff = cutoff - GREATEST(cutoff DIV 1000, 1);
            SET rounds = rounds + 1;
          END WHILE;
          SELECT o_orderpriority AS prio,
                 COUNT(*) AS n_orders,
                 cutoff AS cutoff_cents,
                 rounds AS n_rounds
          FROM orders
          WHERE CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) >= cutoff
          GROUP BY o_orderpriority;
        END
        """
    )


# --------------------------------------------------------------------------
# q9j — parameterized SQL with named markers + IDENTIFIER() (round-11
# mint; SPARK-44140 named parameters, SPARK-43205 IDENTIFIER clause):
# the injection-safe templating surface — values bind as :name
# markers, the table name binds through IDENTIFIER(:tbl) (an
# identifier can never come from a value parameter), and every bound
# parameter is load-bearing in the value hash (the table scanned, the
# segment filter, the balance floor). q2l touched `args=` as a probe;
# this row makes it the query. The oracle inlines the same literals —
# if binding changed semantics (type coercion, quoting) the hash
# catches it. Scale shape: parameters are plan literals after binding,
# so pushdown/pruning work exactly as with inline constants.
# --------------------------------------------------------------------------


@query(
    "q9j_parameterized_sql",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 5000.0
    ORDER BY bal_cents DESC, c_custkey
    LIMIT 15
    """,
)
def q9j_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        FROM IDENTIFIER(:tbl)
        WHERE c_mktsegment = :seg AND c_acctbal >= :min_bal
        ORDER BY bal_cents DESC, c_custkey
        LIMIT 15
        """,
        args={"tbl": "customer", "seg": "BUILDING", "min_bal": 5000.0},
    )


# --------------------------------------------------------------------------
# qa0 — TABLESAMPLE … REPEATABLE (round-11 mint): the SQL sampling
# surface, checked the only way a seeded engine-specific draw can be
# (the q58 envelope pattern): the sample must be (a) a SUBSET of the
# table (anti-join count 0), (b) sized within the Bernoulli ±6σ
# envelope per priority (P(violation) ~ 2e-9), (c) REPEATABLE — the
# same seed drawn twice yields the identical row set (symmetric
# difference empty), and (d) the (100 ROWS) form returns exactly 100
# rows. All four contracts are hashed columns the DuckDB oracle
# asserts as constants + exact totals. Partition note: the draw is
# seed+partition deterministic; shuffle-width/AQE sweeps don't touch
# scan partitioning, so the row set is stable under the invariance
# battery (and the probe pins it).
# --------------------------------------------------------------------------


@query(
    "qa0_tablesample",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS in_bounds, TRUE AS subset_ok, TRUE AS stable,
           CAST(100 AS BIGINT) AS n_rows_form
    FROM orders GROUP BY o_orderpriority
    """,
)
def qa0_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    sample_sql = (
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    )
    s1, s2 = spark.sql(sample_sql), spark.sql(sample_sql)
    totals = spark.table("orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    sampled = s1.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    # scalar contract bits, computed once and broadcast (1-row joins)
    diff = (
        s1.exceptAll(s2).unionByName(s2.exceptAll(s1))
        .agg(F.count(F.lit(1)).alias("n_diff"))
        .select((F.col("n_diff") == 0).alias("stable"))
    )
    subset = (
        s1.join(spark.table("orders"), "o_orderkey", "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("subset_ok"))
    )
    rows_form = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_form "
        "FROM orders TABLESAMPLE (100 ROWS)"
    )
    sigma = F.sqrt(F.col("n_total") * 0.1 * 0.9)
    return (
        totals.join(sampled, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_total",
            (
                F.abs(F.coalesce("n_sampled", F.lit(0)) - 0.1 * F.col("n_total"))
                <= 6 * sigma + 1
            ).alias("in_bounds"),
        )
        .crossJoin(F.broadcast(subset))
        .crossJoin(F.broadcast(diff))
        .crossJoin(F.broadcast(rows_form))
        .select(
            "o_orderpriority", "n_total", "in_bounds", "subset_ok",
            "stable", "n_rows_form",
        )
    )


# --------------------------------------------------------------------------
# qa1 — SQL UDFs (round-11 mint; SPARK-46057, Spark 4): CREATE
# TEMPORARY FUNCTION in pure SQL — a scalar function and a
# table-valued function (the scalar composed INSIDE the TVF body),
# consumed through a correlated LATERAL call. This is the
# warehouse-migration surface that matters at 100 TB for a reason the
# plan shows: SQL UDFs are INLINED by Catalyst at analysis time — no
# serialization boundary, no Python worker, predicates still push
# through the call sites (tests/test_plans.py asserts the executed
# plan contains no *EvalPython node) — whereas the same helper written
# as a Python UDF walls off codegen and pushdown. The oracle replays
# with the definitions hand-inlined: if Spark's inlining changed
# semantics (type coercion at the RETURNS boundary, correlation
# scope), the value hash catches it.
# --------------------------------------------------------------------------


@query(
    "qa1_sql_udf",
    oracle="""
    SELECT c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS HUGEINT))
                AS BIGINT) AS sum_cents
    FROM customer
    WHERE c_acctbal >= 5000.0
    GROUP BY c_mktsegment
    """,
)
def qa1_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION fcs_cents(x DOUBLE)
        RETURNS BIGINT
        RETURN CAST(FLOOR(x * 100.0 + 0.5) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION fcs_seg_top(
            seg STRING, min_bal DOUBLE)
        RETURNS TABLE(c_custkey BIGINT, bal_cents BIGINT)
        RETURN SELECT c_custkey, fcs_cents(c_acctbal)
               FROM customer
               WHERE c_mktsegment = seg AND c_acctbal >= min_bal
        """
    )
    return spark.sql(
        """
        SELECT t.seg,
               COUNT(*) AS n_cust,
               SUM(s.bal_cents) AS sum_cents
        FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) t,
             LATERAL fcs_seg_top(t.seg, 5000.0) s
        GROUP BY t.seg
        """
    )


# --------------------------------------------------------------------------
# qa2 — ANSI interval types (round-11 mint): the TYPED time-arithmetic
# surface — timestamp − timestamp yields an INTERVAL DAY TO SECOND
# COLUMN (not a bigint), intervals order (MIN/MAX) and SUM as
# intervals, and timestamp + INTERVAL literal shifts inside a
# predicate. q62 covers datetime FUNCTIONS; this row covers the
# interval TYPE, which is what a warehouse SLA/retention workload
# actually carries around. Cross-engine protocol: every interval is
# hashed as exact SECONDS (Spark CAST(day-time interval AS BIGINT) is
# the total-seconds value; DuckDB replays with EPOCH(...) — its 1.0
# engine has no SUM(INTERVAL), so the oracle sums the exact per-gap
# epoch seconds, which is identity-equal for day-resolution inputs).
# Interval AVG is deliberately NOT hashed: the two engines truncate
# fractional averages differently; sum+count carries the same
# information exactly. Scale shape: one lag window per customer
# partition + one groupBy — the q40-class topology with interval
# payloads.
# --------------------------------------------------------------------------


@query(
    "qa2_interval_types",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS prio, o_orderdate,
             o_orderdate - LAG(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS gap
      FROM orders)
    SELECT prio,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(SUM(CAST(EPOCH(gap) AS BIGINT)) AS BIGINT) AS sum_gap_s,
           CAST(EPOCH(MIN(gap)) AS BIGINT) AS min_gap_s,
           CAST(EPOCH(MAX(gap)) AS BIGINT) AS max_gap_s,
           CAST(SUM(CASE WHEN o_orderdate + INTERVAL 45 DAY
                              > TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_recent
    FROM g GROUP BY prio
    """,
)
def qa2_interval_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH g AS (
          SELECT o_orderpriority AS prio, o_orderdate,
                 o_orderdate - LAG(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS gap
          FROM orders)
        SELECT prio,
               COUNT(gap) AS n_gaps,
               CAST(SUM(gap) AS BIGINT) AS sum_gap_s,
               CAST(MIN(gap) AS BIGINT) AS min_gap_s,
               CAST(MAX(gap) AS BIGINT) AS max_gap_s,
               SUM(CASE WHEN o_orderdate + INTERVAL '45' DAY
                             > TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END)
                 AS n_recent
        FROM g GROUP BY prio
        """
    )
