"""Round-11 optimization equivalence pins.

Each optimization this round replaced an operator's INTERNALS while
keeping its results bit-identical; these tests pin the equivalence
against the pre-optimization formulation on adversarial literal
frames (the DuckDB oracles only exercise the fixtures' shapes).
"""

import pytest
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.operators.dedup import shingle_sets, shingles
from fcs_etl_reactor_spark.operators.similarity import (
    _dot_scaled,
    cosine_pairs_vectorized,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# adversarial texts: short docs (0/1/2 tokens), consecutive/leading/
# trailing spaces (empty tokens), repeated shingles, unicode, NULL
_TEXTS = [
    (1, "a b c d e"),
    (2, "a b c a b c a b"),  # repeated shingles → distinct matters
    (3, "xy"),  # 1 token → zero shingles
    (4, ""),  # 0 tokens after split → [''] (1 token) → zero shingles
    (5, "a  b c"),  # double space → empty middle token
    (6, " a b c"),  # leading space → empty first token
    (7, "ü ö ß wide 字 char"),  # non-ASCII tokens
    (8, None),  # NULL text → zero shingles / empty set
    (9, "t1 t2 t3"),  # exactly n tokens → one shingle
]


def _expr_shingles(df, id_col, text_col, n):
    """The pre-r11 expression formulation (transform + concat_ws over
    element_at), kept here as the semantic reference."""
    w = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + off) for off in range(n)]),
    )
    return df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))


class TestVectorizedShingles:
    @pytest.mark.parametrize("n", [2, 3, 8])
    def test_matches_expression_form(self, spark, n):
        df = spark.createDataFrame(_TEXTS, "doc_id BIGINT, text STRING")
        got = _rows(shingles(df, "doc_id", "text", n))
        want = _rows(_expr_shingles(df, "doc_id", "text", n))
        assert got == want

    def test_sets_match_row_form(self, spark):
        df = spark.createDataFrame(_TEXTS, "doc_id BIGINT, text STRING")
        sets = {
            r["doc_id"]: sorted(r["_sh_set"])
            for r in shingle_sets(df, "doc_id", "text", 3).collect()
        }
        rows = shingles(df, "doc_id", "text", 3).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
        # every doc appears in sets (empty array for shingle-less docs),
        # and non-empty sets agree exactly with the row form
        assert set(sets) == {t[0] for t in _TEXTS}
        for did, sh in by_doc.items():
            assert sets[did] == sorted(sh)
        for did in set(sets) - set(by_doc):
            assert sets[did] == []


class TestCosinePairsVectorized:
    def _vecs(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
        ]
        # a duplicate vector pair (cosine exactly 1.0). NO zero-norm
        # vector here: under ANSI (Spark 4 default) the pre-r11
        # theta-join form ERRORS with DIVIDE_BY_ZERO on a zero norm,
        # so bit-identity is only defined on non-degenerate inputs;
        # the kernel's (more permissive) NaN behavior is pinned in
        # test_zero_norm_yields_nan_not_error below.
        rows.append((40, rows[0][1]))
        return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    def _theta_join_reference(self, df, threshold):
        """The pre-r11 formulation: theta join + _dot_scaled folds."""
        a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        a = a.withColumn("na", F.sqrt(_dot_scaled(F.col("va"), F.col("va"))))
        b = b.withColumn("nb", F.sqrt(_dot_scaled(F.col("vb"), F.col("vb"))))
        cos = _dot_scaled(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    @pytest.mark.parametrize("threshold", [-1.0, 0.0, 0.4, 0.95])
    def test_bit_identical_to_theta_join(self, spark, threshold):
        df = self._vecs(spark)
        got = cosine_pairs_vectorized(df, threshold=threshold).collect()
        want = self._theta_join_reference(df, threshold).collect()

        def key(rows):
            # exact doubles via repr — bit-identity is the contract
            return sorted((r["id_a"], r["id_b"], repr(r["cosine"])) for r in rows)

        assert key(got) == key(want)

    def test_zero_norm_yields_nan_not_error(self, spark):
        # The theta-join form raised ANSI DIVIDE_BY_ZERO on a zero-norm
        # vector; the kernel is deliberately more permissive — the
        # pair survives any threshold (NumPy NaN keeps the Spark
        # NaN-compares-greatest outcome) and its cosine lands as NULL
        # (Arrow's pandas NaN→null convention at the boundary).
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [0.0, 0.0])],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        rows = cosine_pairs_vectorized(df, threshold=0.5).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["cosine"] is None  # NaN → NULL at the Arrow boundary

    def test_query_block_boundaries(self, spark):
        # >256 collected rows exercises the q-block loop seam
        rows = [(i, [float((i * 7 + j) % 5) + 1.0 for j in range(4)]) for i in range(300)]
        df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
        got = cosine_pairs_vectorized(df, threshold=0.99).count()
        want = self._theta_join_reference(df, 0.99).count()
        assert got == want > 0
