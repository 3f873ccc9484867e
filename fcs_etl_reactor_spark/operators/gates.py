"""Gating operators — SURVEY.md §2.2 P2 (range) / P5 (polygon,
ellipse). The reference pipeline's step 3 (debris removal, population
selection) reconstructed from the public TASBE/flowCore gating model.

- Range and ellipse gates are pure Column predicates: they run inside
  whole-stage codegen and push partially into the parquet scan.
- Polygon gates need point-in-polygon; that's a vectorized
  ``pandas_udf`` (Arrow batches, NumPy ray-casting) — the documented
  UDF escape hatch (SURVEY.md §2.12 U2). Vertex arrays are closed
  over as NumPy constants, so the per-batch cost is O(rows × edges)
  C-speed with zero shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def range_gate(col: Column | str, lo: float, hi: float) -> Column:
    """1-D channel gate lo <= x < hi (P2). Pushes down to parquet."""
    c = F.col(col) if isinstance(col, str) else col
    return (c >= F.lit(lo)) & (c < F.lit(hi))


def ellipse_gate(
    x: Column | str,
    y: Column | str,
    cx: float,
    cy: float,
    rx: float,
    ry: float,
    theta: float = 0.0,
) -> Column:
    """Rotated-ellipse gate as a pure expression (no UDF): point inside
    iff ((dx·cosθ+dy·sinθ)/rx)² + ((−dx·sinθ+dy·cosθ)/ry)² ≤ 1."""
    import math

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    dx, dy = xc - F.lit(cx), yc - F.lit(cy)
    ct, st = math.cos(theta), math.sin(theta)
    u = (dx * F.lit(ct) + dy * F.lit(st)) / F.lit(rx)
    v = (-dx * F.lit(st) + dy * F.lit(ct)) / F.lit(ry)
    return (u * u + v * v) <= F.lit(1.0)


def polygon_gate(x: Column | str, y: Column | str, vertices: list[tuple[float, float]]) -> Column:
    """2-D polygon gate (P5): vectorized even-odd ray casting.

    ``vertices`` is the polygon boundary (closed implicitly). Points
    exactly on an edge follow the half-open ray-casting convention.
    """
    import numpy as np

    vx = np.array([v[0] for v in vertices], dtype=np.float64)
    vy = np.array([v[1] for v in vertices], dtype=np.float64)

    @F.pandas_udf(BooleanType())
    def _inside(xs: pd.Series, ys: pd.Series) -> pd.Series:
        px = xs.to_numpy(dtype=np.float64)
        py = ys.to_numpy(dtype=np.float64)
        inside = np.zeros(len(px), dtype=bool)
        n = len(vx)
        j = n - 1
        for i in range(n):
            x1, y1, x2, y2 = vx[i], vy[i], vx[j], vy[j]
            crosses = (y1 > py) != (y2 > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= crosses & (px < xint)
            j = i
        return pd.Series(inside)

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    return _inside(xc, yc)


def apply_gates(df: DataFrame, gates: dict[str, Column]) -> DataFrame:
    """Attach named boolean gate columns + an `ungated` conjunction
    flag; callers filter on what they need (keeps one scan for all
    gate statistics)."""
    out = df
    combined = None
    for name, cond in gates.items():
        out = out.withColumn(name, cond)
        combined = F.col(name) if combined is None else (combined & F.col(name))
    if combined is not None:
        out = out.withColumn("all_gates", combined)
    return out
