"""Iterative graph algorithms over the relational fixtures.

PageRank is the canonical "iterative algorithm the engine must not
fake": each iteration is edges ⋈ ranks (shuffle on src) followed by a
groupBy(dst) — the textbook distributed formulation. The loop unrolls
into ONE lazy plan (fixed iteration count), so Catalyst sees the whole
chain and AQE re-plans each stage at runtime; no driver-side collect
anywhere.

Determinism strategy (oracle parity): ranks are FIXED-POINT longs
(scale 1e12). Every per-iteration op — FLOOR(r/outdeg) contribution,
FLOOR(sum*85/100.0) damping, FLOOR(1.5e11/N) base — is an IEEE double
op on integer-valued inputs below 2^53 followed by a floor, which is
bit-identical in Spark and DuckDB regardless of partitioning or
summation order (integer sums are exact). No last-ulp drift is
possible, unlike a double-typed PageRank.

Scale shape: ranks and edges are both distributed; out-degrees are
computed once and joined (not broadcast — |V| is unbounded); the
per-iteration shuffle is |E| contributions hash-partitioned on dst
with map-side partial sums. Dangling mass (suppliers have no
out-edges) is dropped, the standard simplified formulation — total
mass shrinks, relative ranking is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

_PR_SCALE = 1_000_000_000_000  # 1e12 fixed-point
_PR_ITERS = 3  # fixed unroll — an iteration cap by construction
_DAMP_NUM, _DAMP_DEN = 85, 100  # d = 0.85 in exact integer arithmetic


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    base = f"CAST(FLOOR({_PR_SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN}.0 / n_nodes) AS BIGINT)"
    ctes = [
        """edges AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )""",
        """nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    )""",
        """deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)""",
        """n AS (SELECT COUNT(*) AS n_nodes FROM nodes)""",
        f"""r0 AS (
      SELECT node, CAST(FLOOR({_PR_SCALE}.0 / n_nodes) AS BIGINT) AS r
      FROM nodes CROSS JOIN n
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""m{i} AS (
      SELECT e.dst AS node,
             SUM(CAST(FLOOR(r.r / d.outdeg) AS BIGINT)) AS m
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""r{i} AS (
      SELECT nodes.node,
             {base}
             + CAST(FLOOR(COALESCE(m{i}.m, 0) * {_DAMP_NUM} / {_DAMP_DEN}.0) AS BIGINT)
               AS r
      FROM nodes CROSS JOIN n LEFT JOIN m{i} ON nodes.node = m{i}.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r AS rank_scaled FROM r{iters}"
    )


@query("q5n_pagerank", oracle=_pagerank_oracle())
def q5n_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank on the customer→supplier purchase graph.

    Edges: distinct (customer, supplier) pairs observed in orders ⋈
    lineitem, namespaced 'c<id>' / 's<id>' into one node id space.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    # outdeg rides WITH the edge rows (one join before the loop, a
    # whole-partition window would also do) so each iteration is a
    # single edges ⋈ ranks shuffle + one groupBy — not three joins.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_w = edges.join(deg, "src")
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = F.floor(
        F.lit(float(_PR_SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN))
        / F.col("n_nodes")
    ).cast("bigint")

    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node",
        F.floor(F.lit(float(_PR_SCALE)) / F.col("n_nodes")).cast("bigint").alias("r"),
    )
    for _ in range(_PR_ITERS):
        contribs = (
            edges_w.join(ranks, edges_w.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("r") / F.col("outdeg")).cast("bigint").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n))
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    base
                    + F.floor(
                        F.coalesce(F.col("m"), F.lit(0))
                        * _DAMP_NUM
                        / F.lit(float(_DAMP_DEN))
                    ).cast("bigint")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


# --------------------------------------------------------------------------
# q5o — triangle counting on the co-purchase graph (edges = part pairs
# appearing in ≥ 2 shared orders, canonically a < b). The classic
# distributed-graph benchmark after PageRank; the implementation is
# the ORIENTED wedge join: every edge is stored once (a < b), wedges
# (a<b<c) join on the shared low vertex, and a third join closes the
# wedge — each triangle counted exactly once, no post-dedup. At web
# scale the orientation is by degree rather than id (caps wedge fanout
# at high-degree hubs); id-orientation keeps the oracle verbatim and
# the fixture co-purchase graph has no hubs (order size ≤ 7).
# --------------------------------------------------------------------------

_TRI_MIN_SHARED = 2


@query(
    "q5o_triangles",
    oracle=f"""
    WITH edges AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_TRI_MIN_SHARED}
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_triangles,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q5o_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_MIN_SHARED)
        .select("a", "b")
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tris = e1.join(e2, F.col("e2.a") == F.col("e1.b")).join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    n_tri = tris.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_edge = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return n_tri.crossJoin(F.broadcast(n_edge))
