"""Count-min sketch (A7 family): approximate per-key counts in
O(d·w) memory with a one-sided error guarantee — estimates never
undercount, and overcount by ≤ ε·N with probability 1−δ
(ε = e/w, δ = e^−d).

Scale design: the sketch build is a map-side-combinable aggregation on
(row, bucket) — d rows per input key, w buckets per row, so the whole
sketch is d·w counters (4×1024 longs here = 32 KB) no matter how many
distinct keys stream through. Probing broadcasts those counters: the
estimate is min over d rows of counter[hash_r(key)], a pure-expression
lookup. This is the sketch you keep per micro-batch/partition and add
(counter-wise) for distributed merges — addition is exact, unlike HLL.

Seeded xxhash64 makes every run bit-identical: the driver's
value-hash check holds across partitionings and engines (the oracle
re-derives only the exact side; the sketch's guarantee supplies the
booleans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(df: DataFrame, key_col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the sketch: (r, bucket, counter) rows — d·w cells max."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(F.xxhash64(F.col(key_col), F.lit(r)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return rows.groupBy("cell.r", "cell.bucket").agg(
        F.count(F.lit(1)).alias("counter")
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Estimate each probe key's count: min over the d counters it
    hashes to. The sketch (≤ d·w rows) broadcasts; missing cells are
    zero."""
    probe_cells = probes.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(r)), F.lit(width))
                    for r in range(depth)
                ]
            )
        ).alias("r", "bucket"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("cms_count"))
    )
