"""Skew mitigation (SURVEY.md §4): salting for hot keys.

A skewed key turns one reducer into the straggler that bounds the
whole stage. Two standard rewrites, both semantics-preserving (so the
engine's versions are checked against unsalted SQL oracles):

- salted aggregation: groupBy(key, salt) partial → groupBy(key) merge.
  Only valid for re-aggregatable functions (count/sum/min/max — the
  algebraic ones); the merge step re-combines partials exactly.
- salted join: the skewed probe side gets a deterministic salt in
  [0, n); the (smaller) build side is replicated n times, one copy per
  salt value; the join key becomes (key, salt). Every hot key's rows
  now spread across n reducers.

At 100 TB you'd drive `n_salt` from key-frequency stats (or let AQE's
skew-join splitting handle moderate skew); these operators are the
explicit form for the pathological keys AQE can't split (a single
key-group that exceeds one task's memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Column, Column]],
    n_salt: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: phase 1 aggregates (keys + salt), phase 2
    merges the ≤ n_salt partial rows per key.

    ``partials`` maps output name → (phase1 agg column, phase2 merge
    column over the phase-1 alias). The salt must vary WITHIN a key
    group to spread it: pass a per-row column (a unique id) as
    ``salt_on`` for a deterministic salt; otherwise a partition-local
    row counter is used (any row→salt assignment yields identical
    results for algebraic aggregates — the merge recombines exactly).
    """
    salt_col = (
        F.pmod(F.xxhash64(salt_on), F.lit(n_salt))
        if salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    ).alias("_salt")
    p1 = df.withColumn("_salt", salt_col).groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side
    replicated ``n_salt``×. Output rows are identical to the unsalted
    join (each skewed row matches exactly the one replica sharing its
    salt).

    The salt must vary WITHIN a key group to spread it — derive it
    from a per-row column (``salt_on``), never from the join key (a
    key-derived salt is constant per key group, so the hot key would
    still land on a single reducer). With ``salt_on=None`` the salt is
    a partition-local row counter (monotonically_increasing_id), which
    varies per row by construction; results are identical either way —
    each skewed row still matches exactly one replica.

    Only inner and left joins are salt-safe: in a right/full join an
    unmatched build row would surface once PER REPLICA (n_salt
    null-extended rows instead of one).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' (got {how!r}): "
            "replicating the build side multiplies its unmatched rows"
        )
    if salt_on == key:
        raise ValueError(
            "salt_on must not be the join key: a key-derived salt is "
            "constant within a key group and leaves the hot key on one "
            "reducer"
        )
    salt_expr = (
        F.pmod(F.xxhash64(salt_on), F.lit(n_salt))
        if salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    s = skewed.withColumn("_salt", salt_expr)
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    out = s.join(r, on=[key, "_salt"], how=how)
    return out.drop("_salt")
