"""Local differ replicating the driver's correctness gate
(__spark_entry__.py contract): run the Spark query and the DuckDB
oracle SQL on the same parquet fixtures, compare row count, schema
(column names AND types), and order-insensitive values.

Stricter than the driver: values are compared EXACTLY (after
canonicalization) — if this passes, any reasonable value-hash passes.
Types are compared via an explicit Spark↔DuckDB mapping (round-2
lesson: the driver rejects TIMESTAMPTZ vs TIMESTAMP and HUGEINT vs
BIGINT; a names-only local check masked all four such failures).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

from fcs_etl_reactor_spark.io import TABLES, table_path


def spark_type_to_duck(dt) -> str:
    """The DuckDB type string a driver-passing oracle must produce for
    a Spark column of type `dt`. One-to-one on purpose: SUM(BIGINT) in
    DuckDB yields HUGEINT and TO_TIMESTAMP yields TIMESTAMP WITH TIME
    ZONE — both driver-rejected against Spark BIGINT/TIMESTAMP, so the
    oracle must cast. TIMESTAMP_NTZ maps to an impossible sentinel:
    engine queries must normalize it away (io._normalize_ts), never
    surface it."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.TimestampNTZType):
        return "<TIMESTAMP_NTZ — normalize before surfacing>"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.ArrayType):
        return spark_type_to_duck(dt.elementType) + "[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({spark_type_to_duck(dt.keyType)}, "
            f"{spark_type_to_duck(dt.valueType)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {spark_type_to_duck(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    return "<unmapped spark type " + dt.simpleString() + ">"


def schema_diff(spark_df, rel) -> str:
    """'' if the DuckDB relation's schema maps exactly onto the Spark
    DataFrame's (names AND types, order-insensitive), else a message."""
    sfields = {f.name: spark_type_to_duck(f.dataType) for f in spark_df.schema.fields}
    ofields = dict(zip(rel.columns, (str(t) for t in rel.types)))
    if sorted(sfields) != sorted(ofields):
        return (
            f"schema mismatch: spark={sorted(sfields)} oracle={sorted(ofields)}"
        )
    bad = [
        f"{name}: spark {sfields[name]} != oracle {ofields[name]}"
        for name in sorted(sfields)
        if sfields[name] != ofields[name]
    ]
    if bad:
        return "type mismatch: " + "; ".join(bad)
    return ""


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
        # tz-aware and naive canonicalize DIFFERENTLY (round-2 lesson:
        # stripping tzinfo here hid a TIMESTAMPTZ oracle the driver
        # rejected). Type-strict schema_diff fails first, but keep the
        # value layer honest too.
        if v.tzinfo is not None:
            return ("tsz", v.astimezone(_dt.timezone.utc).isoformat())
        return ("ts", v.isoformat())
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
        rel = con.sql(sql)
        ocols = list(rel.columns)
        sdiff = schema_diff(spark_df, rel)
        oracle = rel.fetchall()
    finally:
        if own:
            con.close()

    srows = spark_df.collect()
    scols = spark_df.columns

    if sdiff:
        return DiffResult(name, False, len(srows), len(oracle), sdiff)
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
