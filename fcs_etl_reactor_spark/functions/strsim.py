"""Jaro-Winkler string similarity (the fuzzy-match staple Spark's
built-ins lack — levenshtein/soundex exist, JW does not).

Semantics match the rapidfuzz lineage DuckDB vendors (verified
bit-exact against duckdb 1.0 `jaro_winkler_similarity` on 3k+ pairs
incl. empty/equal/disjoint edges): Jaro with the standard
half-max-length match window, transpositions counted over matched
sequences, then the Winkler prefix boost sim + L·0.1·(1-sim) applied
only when sim > 0.7, common prefix L capped at 4.

Shipped as a vectorized pandas UDF (Arrow batches; the per-row
windowed matcher is O(|a|·|b|) on short strings). This is the U2
surface — scalar JVM functions stay the hot path; JW belongs to the
candidate-verification stage after blocking (q1m's deletion
neighborhoods, q5q's sorted neighborhood), never to an all-pairs scan.
"""

from __future__ import annotations

import pandas as pd


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    f1 = [False] * n1
    f2 = [False] * n2
    m = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if f1[i]:
            while not f2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (m / n1 + m / n2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Scalar JW similarity in [0, 1]; boost only above 0.7 Jaro."""
    sim = _jaro(s1, s2)
    if sim > 0.7:
        pl = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pl += 1
        sim += pl * prefix_weight * (1 - sim)
    return sim


def jaro_winkler_udf():
    """Arrow-batched (string, string) → double UDF. Built lazily: a
    module-level @pandas_udf would need an active session when the
    WORKER re-imports this module to unpickle the function."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else jaro_winkler(x, y)
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    return _jw
