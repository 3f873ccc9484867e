"""Local differ replicating the driver's correctness gate
(__spark_entry__.py contract): run the Spark query and the DuckDB
oracle SQL on the same parquet fixtures, compare row count, schema
(column names), and order-insensitive values.

Stricter than the driver: values are compared EXACTLY (after
canonicalization) — if this passes, any reasonable value-hash passes.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

from fcs_etl_reactor_spark.io import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v):
    """Canonicalize a cell for order-insensitive exact comparison."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if hasattr(v, "asDict"):  # pyspark Row (struct) — check before tuple
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.asDict().items())))
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    return (type(v).__name__, v)


@dataclass
class DiffResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list = field(default_factory=list)

    def __str__(self):
        status = "OK " if self.ok else "FAIL"
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} {self.detail}"


def compare(name: str, spark_df, sql: str, sf_dir: str, con=None) -> DiffResult:
    own = con is None
    if own:
        con = duck_connection(sf_dir)
    try:
        oracle = con.execute(sql).fetchall()
        ocols = [d[0] for d in con.description]
    finally:
        if own:
            con.close()

    srows = spark_df.collect()
    scols = spark_df.columns

    if sorted(scols) != sorted(ocols):
        return DiffResult(
            name, False, len(srows), len(oracle),
            f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}",
        )
    if len(srows) != len(oracle):
        return DiffResult(
            name, False, len(srows), len(oracle), "row count mismatch"
        )

    order = sorted(range(len(scols)), key=lambda i: scols[i])
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = sorted(
        tuple(_canon(row[i]) for i in order) for row in srows
    )
    oset = sorted(
        tuple(_canon(row[i]) for i in oorder) for row in oracle
    )
    if sset == oset:
        return DiffResult(name, True, len(srows), len(oracle))
    # collect a few example divergences for debugging
    bad = [
        (s, o) for s, o in zip(sset, oset) if s != o
    ][:3]
    return DiffResult(
        name, False, len(srows), len(oracle), f"value mismatch ({len(bad)}+ rows)", bad
    )


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[DiffResult]:
    from fcs_etl_reactor_spark.queries import ORACLE, QUERIES

    con = duck_connection(sf_dir)
    results = []
    for qname, fn in QUERIES.items():
        if only and qname not in only:
            continue
        if qname not in ORACLE:
            continue
        try:
            results.append(compare(qname, fn(spark, sf_dir), ORACLE[qname], sf_dir, con))
        except Exception as exc:  # pragma: no cover - debugging aid
            results.append(DiffResult(qname, False, detail=f"ERROR {type(exc).__name__}: {exc}"))
    con.close()
    return results
