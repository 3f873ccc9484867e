"""Distributed Bloom-filter membership pruning (SURVEY.md §2.3 join
family; the explicit form of Spark's internal runtime row filter).

Use case at 100 TB: semi-join pruning when the build side's DISTINCT
key dictionary is too wide to broadcast (URLs, doc hashes) but a
bits-per-key bitset is not — 10 bits/key vs a ~50-byte URL is a ~40×
smaller broadcast, and the probe side is filtered BEFORE its shuffle.
Spark's own `bloom_filter_agg` is not SQL-registered, so the bitset
is built distributively with DataFrame ops:

  build:  k = `hashes` positions per key via seeded xxhash64 →
          explode → (word, bit) → groupBy(word) BIT_OR — the bitset
          ships through the shuffle as ≤ m/64 longs, never rows;
  pack:   the sparse words collapse to ONE map<long,long> row
          (≤ m/64 entries), broadcast to the probe side;
  probe:  k element_at + bit-tests per row, pure JVM expressions in
          whole-stage codegen — no UDF, no explode on the probe side.

No false negatives by construction (every build-key bit is set), so
`bloom_prune ∘ exact-join ≡ exact-join` — which is what makes the
operator oracle-checkable exactly despite false positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_mask(p: Column) -> Column:
    # the F.shiftleft wrapper only takes a literal int shift; the SQL
    # expression itself accepts a column — call it directly
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
    )


def _positions(key: Column, n_bits: int, hashes: int) -> list[Column]:
    # Seeded double hashing: pos_i = h1 + i*h2 (mod m) — the standard
    # Kirsch-Mitzenmacher construction; two xxhash64 evaluations per
    # row regardless of k.
    h1 = F.pmod(F.xxhash64(key), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(n_bits - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(hashes)]


def bloom_build(
    build: DataFrame,
    key: str | Column,
    n_bits: int,
    hashes: int = 7,
) -> DataFrame:
    """ONE-row frame (`_bloom` map<long,long>) holding the bitset of
    the build side's keys. ``n_bits`` should be ~10× the expected
    distinct-key count for ~1% false positives at ``hashes``=7."""
    k = F.col(key) if isinstance(key, str) else key
    pos = F.array(*_positions(k, n_bits, hashes))
    words = (
        build.select(F.explode(pos).alias("_p"))
        .select(
            (F.col("_p") / 64).cast("long").alias("_w"),
            _bit_mask(F.col("_p")).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
    )
    return words.agg(
        F.map_from_arrays(F.collect_list("_w"), F.collect_list("_bits")).alias("_bloom")
    )


def bloom_might_contain(
    bloom_col: Column, key: Column, n_bits: int, hashes: int = 7
) -> Column:
    """True iff all ``hashes`` bits for ``key`` are set — pure
    expressions, stays in whole-stage codegen."""
    tests = []
    for p in _positions(key, n_bits, hashes):
        word = F.coalesce(
            F.element_at(bloom_col, (p / 64).cast("long")), F.lit(0).cast("long")
        )
        tests.append(word.bitwiseAND(_bit_mask(p)) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_bits: int,
    hashes: int = 7,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``key`` might be in ``build``
    (superset of the exact semi-join; zero false negatives)."""
    bloom = bloom_build(build, key, n_bits, hashes)
    pruned = probe.join(F.broadcast(bloom))
    keep = bloom_might_contain(F.col("_bloom"), F.col(key), n_bits, hashes)
    return pruned.filter(keep).drop("_bloom")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_bits: int,
    hashes: int = 7,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: the bitset eliminates
    most non-matching probe rows before the shuffle; the residual
    exact semi-join removes false positives. Result is IDENTICAL to
    ``probe.join(build, key, "left_semi")`` — only cheaper, because
    the shuffled probe volume is the (pruned) candidate set."""
    candidates = bloom_prune(probe, build, key, n_bits, hashes)
    return candidates.join(
        build.select(key).distinct(), key, "left_semi"
    )
