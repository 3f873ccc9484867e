"""Round-12 optimization equivalence pins.

Round 12 changed operator INTERNALS only (job-count folds, one-pass
symmetrization, the distributed pair fallback); these tests pin that
the results stay bit-identical on adversarial literal frames.
"""

import pytest
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.operators.dedup import (
    dedup_clusters,
    dedup_clusters_star,
)
from fcs_etl_reactor_spark.operators.graphs import (
    hits_fixed_point,
    hits_reference,
    pagerank,
    pagerank_reference,
)
from fcs_etl_reactor_spark.operators.similarity import cosine_pairs_vectorized


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestChunkedPairFallback:
    """cosine_pairs_vectorized above max_side: the hash-chunked
    distributed form must equal the single-collect form row-for-row
    (same ids, bit-identical cosines)."""

    def _vecs(self, spark, n=37, d=8):
        rows = [
            (i, [((i * 31 + j * 17) % 19 - 9) / 7.0 for j in range(d)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    @pytest.mark.parametrize("max_side", [5, 12])
    def test_chunked_equals_single_pass(self, spark, max_side):
        df = self._vecs(spark)
        want = _rows(cosine_pairs_vectorized(df, threshold=0.2))
        got = _rows(cosine_pairs_vectorized(df, threshold=0.2, max_side=max_side))
        assert got == want and len(want) > 0

    def test_chunked_handles_negative_threshold(self, spark):
        # threshold below any cosine → all n(n-1)/2 pairs, each exactly once
        df = self._vecs(spark, n=13)
        got = _rows(cosine_pairs_vectorized(df, threshold=-2.0, max_side=4))
        assert len(got) == 13 * 12 // 2
        assert len({(a, b) for a, b, _ in got}) == len(got)

    def test_no_raise_above_cap(self, spark):
        # the pre-r12 form raised ValueError past the cap; now it computes
        df = self._vecs(spark, n=9)
        out = cosine_pairs_vectorized(df, threshold=0.9, max_side=3)
        assert out.columns == ["id_a", "id_b", "cosine"]
        out.count()  # executes the chunked plan


class TestIterativeFoldEquivalence:
    """The lazy-checkpoint/one-job-per-round folds must not change any
    value: pin Spark results against the pure-Python references."""

    _EDGES = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "e"), ("e", "d"), ("f", "a"),
    ]

    def test_pagerank_matches_reference(self, spark):
        df = spark.createDataFrame(self._EDGES, "src STRING, dst STRING")
        got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=3).collect()}
        assert got == pagerank_reference(self._EDGES, iters=3)

    def test_pagerank_empty_edges(self, spark):
        df = spark.createDataFrame([], "src STRING, dst STRING")
        out = pagerank(df, iters=2)
        assert out.columns == ["node", "rank_scaled"]
        assert out.count() == 0

    def test_hits_matches_reference(self, spark):
        df = spark.createDataFrame(self._EDGES, "src STRING, dst STRING")
        a, h = hits_fixed_point(df, iters=2)
        ra, rh = hits_reference(self._EDGES, iters=2)
        assert {r["node"]: r["a"] for r in a.collect()} == ra
        assert {r["node"]: r["h"] for r in h.collect()} == rh

    def test_cc_label_prop_and_star_agree(self, spark):
        # two components + an isolated pair; both CC implementations
        # (each with the round-12 lazy-checkpoint fold and the one-pass
        # symmetrization) must produce the identical assignment
        pairs = [(2, 1), (2, 3), (5, 4), (7, 6), (6, 8), (9, 9)]
        df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
        got_lp = _rows(dedup_clusters(df))
        got_star = _rows(dedup_clusters_star(df))
        want = sorted(
            [
                (1, 1, True), (2, 1, False), (3, 1, False),
                (4, 4, True), (5, 4, False),
                (6, 6, True), (7, 6, False), (8, 6, False),
            ]
        )
        # dedup_clusters keeps self-loop nodes (9,9) as their own
        # cluster; the star form drops self-pairs before contraction
        assert [r for r in got_lp if r[0] != 9] == want
        assert got_star == want


class TestShinglesWithCount:
    """with_count=True must emit the same (id, shingle) rows plus the
    doc's distinct-shingle count on every row."""

    def test_count_rides_rows(self, spark):
        texts = [(1, "a b c d"), (2, "a b"), (3, None), (4, "x y z x y z x y z")]
        df = spark.createDataFrame(texts, "doc_id BIGINT, text STRING")
        from fcs_etl_reactor_spark.operators.dedup import shingles

        plain = sorted(tuple(r) for r in shingles(df, "doc_id", "text", 2).collect())
        counted = shingles(df, "doc_id", "text", 2, with_count=True).collect()
        assert sorted((r.doc_id, r.shingle) for r in counted) == plain
        per_doc = {}
        for r in counted:
            per_doc.setdefault(r.doc_id, set()).add(r.shingle)
        assert all(r._n_sh == len(per_doc[r.doc_id]) for r in counted)
