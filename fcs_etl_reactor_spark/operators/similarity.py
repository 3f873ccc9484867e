"""Embedding similarity search (SURVEY.md §2.11 L3/L7).

Two paths:
- ``cosine_topk_exact``: brute-force cosine top-k via positional
  explode + exact decimal dot products. Oracle-checkable (bit-identical
  to DuckDB) — the correctness baseline.
- ``cosine_topk_fast``: zip_with/aggregate JVM fold over the arrays —
  no explode/shuffle for the dot product, one crossJoin with the
  (broadcast) query side. The bench path.
- ``lsh_topk``: random-hyperplane LSH bucketing so only same-bucket
  pairs are compared — the 100 TB path (candidate volume ∝ Σ bucket²,
  tunable by the number of hyperplanes). Seeded & deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1e12


def _dot_scaled(a, b) -> F.Column:
    """Deterministic dot product: per-element FLOOR((x*y)*1e12) → long,
    sequential integer fold (order-free because integers are exact),
    back to double. Bit-identical to an unnest+HUGEINT-sum oracle, but
    runs as a single array fold — no explode, no shuffle.
    """
    scaled = F.zip_with(
        a,
        b,
        lambda x, y: F.floor((x.cast("double") * y.cast("double")) * F.lit(_SCALE)).cast(
            "long"
        ),
    )
    total = F.aggregate(scaled, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return total.cast("double") / F.lit(_SCALE)




def cosine_topk_exact(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, match_id, cosine, rn) with rn ≤ k.

    Plan: broadcast the (smaller) query side, crossJoin against the
    corpus so each corpus partition scans independently — the only
    shuffle is the final per-query top-k window over |Q|·k-bounded
    data. Deterministic scaled-integer dot products keep parity with
    the SQL oracle at any partitioning.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot_scaled(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot_scaled(F.col(vec_col), F.col(vec_col))).alias("cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = (_dot_scaled(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))).alias(
        "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def cosine_topk_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k with the dot-product matrix computed by an
    Arrow-batched mapInPandas over the corpus — NumPy runs the SAME
    scaled-integer arithmetic as ``_dot_scaled`` (IEEE multiply →
    floor → int64 sum), so results are bit-identical to
    ``cosine_topk_exact`` and the SQL oracle, ~5× faster (measured:
    vectorized batch math replaces the interpreted per-pair lambda).

    The query side is collected to the driver and shipped in the UDF
    closure — the same smallness contract as a broadcast join build
    side (ANN query batches are bounded by design). The corpus scan
    stays fully distributed; per-query candidates then go through the
    usual top-k window.
    """
    import numpy as np

    # Enforce the smallness contract instead of trusting it: the query
    # side rides to every task in the UDF closure, so an unbounded
    # query DataFrame would OOM the driver *silently* at scale. limit()
    # makes the probe cheap (scan stops at the cap); callers with more
    # queries than this belong on lsh_topk/ivf_topk, whose query side
    # stays distributed.
    _MAX_QUERIES = 100_000
    qrows = queries.select(id_col, vec_col).limit(_MAX_QUERIES + 1).collect()
    if len(qrows) > _MAX_QUERIES:
        raise ValueError(
            f"cosine_topk_vectorized query side exceeds {_MAX_QUERIES} rows; "
            "it is driver-collected by design (broadcast build side). Use "
            "lsh_topk/ivf_topk for large query sets."
        )
    qids = [r[0] for r in qrows]
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # m × d
    qn = np.sqrt(
        np.floor(qmat * qmat * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
    )  # exact per-query norms, same arithmetic as _dot_scaled(v, v)

    out_id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"query_id {out_id_type}, match_id {out_id_type}, cosine double"

    # Block BOTH sides so the m'×b'×d scoring tensor stays ~2M elements
    # (~16 MB). Two measured failure modes motivate this: a fixed
    # corpus chunk lets the tensor grow linearly with |Q| and thrash
    # the allocator (q91 at 10× swung 0.7→5.7 s), and a monolithic
    # q-side tensor in the ~100 MB range pays seconds of first-touch
    # page faults per task on fresh worker memory (9.0 s first call vs
    # 0.08 s blocked for 2000×125×64, identical arithmetic).
    dim = max(qmat.shape[1], 1)
    _QB = 256
    chunk = max(16, 2_000_000 // (_QB * dim))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # b × d
            cn = np.sqrt(
                np.floor(cmat * cmat * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
            )
            mids = pdf[id_col].to_numpy()
            for j0 in range(0, len(pdf), chunk):
                c = cmat[j0 : j0 + chunk]
                mslice = mids[j0 : j0 + chunk]
                for i0 in range(0, len(qids), _QB):
                    qm = qmat[i0 : i0 + _QB]
                    dots = (
                        np.floor(qm[:, None, :] * c[None, :, :] * _SCALE)
                        .astype(np.int64)
                        .sum(axis=2)
                        / _SCALE
                    )  # m' × b'
                    cos = dots / (
                        qn[i0 : i0 + _QB, None] * cn[None, j0 : j0 + chunk]
                    )
                    m, b = cos.shape
                    yield pd.DataFrame(
                        {
                            "query_id": np.repeat(qids[i0 : i0 + _QB], b),
                            "match_id": np.tile(mslice, m),
                            "cosine": cos.ravel(),
                        }
                    )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def cosine_pairs_vectorized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.0,
    max_side: int = 100_000,
) -> DataFrame:
    """Exact all-pairs cosine over one table: (id_a, id_b, cosine) for
    id_a < id_b and cosine ≥ threshold, with the pair dot-product
    matrix computed by the same Arrow-batched NumPy kernel as
    ``cosine_topk_vectorized`` — IEEE multiply → floor-scale → int64
    sum, bit-identical to ``_dot_scaled`` and the HUGEINT SQL oracle.

    This replaces the theta-join form
    ``a.join(b, id_a < id_b).filter(_dot_scaled(va, vb)/... >= t)``,
    whose per-pair zip_with/aggregate lambdas run interpreted inside a
    BroadcastNestedLoopJoin (measured 50-67 s for 2k vectors at sf0.1;
    this kernel does the identical arithmetic in ~1 s). One side is
    driver-collected under the same smallness contract (and cap) as
    the top-k scorer's query side; the other side streams as Arrow
    batches, so the corpus scan stays fully distributed and the
    output is only the above-threshold pairs. At corpus scale the
    pair ARM is LSH/IVF candidates (q92/q89) — this exact arm is the
    verify/oracle baseline, same contract as cosine_topk_exact.

    Zero-norm edge: under ANSI (the Spark 4 default) the theta-join
    form RAISED DIVIDE_BY_ZERO on a zero-norm vector; this kernel is
    deliberately more permissive — the ``~(cos < threshold)`` mask
    keeps the pair under any threshold (mirroring Spark's
    NaN-compares-greatest ordering, and the long-standing behavior of
    ``cosine_topk_vectorized``), and its cosine lands as NULL (the
    Arrow boundary's pandas NaN→null convention). On
    non-degenerate inputs results are bit-identical to the theta-join
    form (pinned in tests/test_r11_optimizations.py).

    Above ``max_side`` rows the operator no longer raises (round-12):
    it falls back to a DISTRIBUTED chunked form — the id space is
    hash-split into ceil(2n/max_side) chunks, each chunk is collected
    (bounded by the same smallness contract), shipped as a broadcast
    variable, and streamed against the corpus through the identical
    kernel. Every unordered pair (a, b) with a < b is emitted exactly
    once, by the single chunk that owns a: the kernel's
    ``qs < match_id`` mask plus the disjoint hash partition make the
    union of chunk outputs equal the single-pass result row-for-row
    (pinned in tests/test_r12_optimizations.py with a forced-small
    max_side). Cost: one corpus scan per chunk — the exact-pair arm
    stays available at any size instead of ERRORing past the cap; at
    true corpus scale the right arm is still LSH/IVF candidates.
    """
    import numpy as np

    src = df.select(id_col, vec_col)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def _kernel(qids, qmat, qn, dim, bc=None):
        # Block BOTH sides so the m'×b'×d product tensor stays ~2M
        # elements (~16 MB): a monolithic q-side tensor (2000×125×64 ≈
        # 128 MB here) pays seconds of first-touch page faults PER TASK
        # on fresh worker memory and runs ~2× slower even warm
        # (measured 9.0 s first call vs 0.08 s blocked, identical
        # arithmetic). `dim` is passed explicitly because the broadcast
        # path has no qmat here — sizing the block from a placeholder
        # would defeat exactly this cap.
        dim = max(dim, 1)
        _QB = 256
        chunk = max(16, 2_000_000 // (_QB * dim))

        def score(batches):
            import pandas as pd

            if bc is not None:
                ids, qm_full, qn_full = bc.value
            else:
                ids, qm_full, qn_full = qids, qmat, qn
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                cn = np.sqrt(
                    np.floor(cmat * cmat * _SCALE).astype(np.int64).sum(axis=1)
                    / _SCALE
                )
                mids = pdf[id_col].to_numpy()
                for j0 in range(0, len(pdf), chunk):
                    c = cmat[j0 : j0 + chunk]
                    m = mids[j0 : j0 + chunk]
                    for i0 in range(0, len(ids), _QB):
                        qm = qm_full[i0 : i0 + _QB]
                        dots = (
                            np.floor(qm[:, None, :] * c[None, :, :] * _SCALE)
                            .astype(np.int64)
                            .sum(axis=2)
                            / _SCALE
                        )  # m' × b'
                        with np.errstate(divide="ignore", invalid="ignore"):
                            cos = dots / (
                                qn_full[i0 : i0 + _QB, None]
                                * cn[None, j0 : j0 + chunk]
                            )
                        qs = ids[i0 : i0 + _QB]
                        keep = (qs[:, None] < m[None, :]) & ~(cos < threshold)
                        qi, cj = np.nonzero(keep)
                        if len(qi):
                            yield pd.DataFrame(
                                {
                                    "id_a": qs[qi],
                                    "id_b": m[cj],
                                    "cosine": cos[qi, cj],
                                }
                            )

        return score

    def _arrays(rows):
        ids = np.array([r[0] for r in rows])
        qmat = np.array([r[1] for r in rows], dtype=np.float64)  # m × d
        qn = np.sqrt(
            np.floor(qmat * qmat * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
        )
        return ids, qmat, qn

    # Measured negative (round 12, kept for the record): repartitioning
    # the corpus side before the kernel so the O(m²·d) scoring spreads
    # over the cores LOSES on a cold one-shot run at fixture scale —
    # 3.1 s single-task vs 4.0 s at 5 tasks vs 5.2 s at 32, because
    # each extra task pays a Python-worker cold-start (pandas/numpy
    # import ≈ 1.5 s) that dwarfs its compute share; warm it wins
    # (0.75-0.96 s vs ~1 s), but the driver's protocol is cold. At
    # corpus scale the scan arrives with ample partitions anyway, so
    # the split is only ever injected in exactly the regime where it
    # loses. Left single-pass.
    rows = src.limit(max_side + 1).collect()
    if len(rows) <= max_side:
        qids, qmat, qn = _arrays(rows)
        return src.mapInPandas(
            _kernel(qids, qmat, qn, qmat.shape[1] if qmat.ndim == 2 else 1),
            schema,
        )

    # distributed fallback: hash-partition the collected side into
    # chunks of expected size max_side/2, one broadcast + one corpus
    # pass per chunk; chunks partition the id space, so the union is
    # the exact single-pass pair set.
    del rows
    n = src.count()
    n_chunks = max(2, int(-(-2 * n // max_side)))
    sc = df.sparkSession.sparkContext
    chunk_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks))
    out = None
    for i in range(n_chunks):
        crows = src.filter(chunk_of == i).collect()
        if not crows:
            continue
        arrs = _arrays(crows)
        del crows
        cdim = arrs[1].shape[1] if arrs[1].ndim == 2 else 1
        bc = sc.broadcast(arrs)
        part = src.mapInPandas(_kernel(None, None, None, cdim, bc=bc), schema)
        out = part if out is None else out.unionByName(part)
    if out is None:  # unreachable in practice (n > max_side > 0)
        return df.sparkSession.createDataFrame([], schema)
    return out


def _dot_fold(a, b):
    """JVM-side dot product: zip_with multiply + left-fold sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k with array folds (no positional
    explode): broadcast the query side, fold dot/norms per pair in
    whole-stage codegen. O(|Q|·|C|·d) flops, zero shuffle until the
    final per-query top-k."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot_fold(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot_fold(F.col(vec_col), F.col(vec_col))).alias("cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = (_dot_fold(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))).alias(
        "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def lsh_params_for(
    n_corpus: int,
    target_bucket: int = 25,
    collision_p: float = 0.60,
    target_recall: float = 0.85,
    max_tables: int = 32,
) -> tuple[int, int]:
    """Derive (n_planes, n_tables) from corpus size — the scaling law
    BENCH.md documents: bucket count tracks data
    (planes ≈ log2(n/target_bucket)) and tables are raised to hold
    recall ≈ 1 − (1 − p^planes)^tables, capped because candidate
    volume grows linearly in tables. ``collision_p`` is the per-plane
    collision probability of a relevant neighbor (1 − θ/π); the 0.60
    default is deliberately below the ~0.67 measured for the fixtures'
    rank-1 neighbors so the deeper top-k tail keeps its recall."""
    import math

    planes = max(4, math.ceil(math.log2(max(n_corpus, 2) / target_bucket)))
    p_table = collision_p**planes
    if p_table >= 1.0:
        return planes, 1
    tables = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_table))
    return planes, max(1, min(tables, max_tables))


def lsh_topk_auto(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """lsh_topk with (planes, tables) derived from the actual corpus
    size — the deployment form. The one count() job at plan-build is
    the same class of stats lookup tune_for_input does for shuffle
    parallelism (and is amortized by the prepared-plan cache)."""
    n_planes, n_tables = lsh_params_for(corpus.count())
    return lsh_topk(
        queries, corpus, id_col, vec_col, k, n_planes, seed, dim, n_tables
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG-based so
    no numpy dependency in the plan; quality is fine for bucketing)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    out_col: str = "bucket",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane (sign) LSH: bucket = bits of sign(v·h_i).

    Expression-generated per-plane dot products (constant-folded plane
    weights) — like compensation, a pure codegen projection.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = None
        for j, wgt in enumerate(plane):
            term = F.element_at(F.col(vec_col), j + 1).cast("double") * F.lit(wgt)
            dot = term if dot is None else dot + term
        bit = F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn(out_col, bucket)


def _array_from_components(pos_col: str, val_col: str) -> F.Column:
    """Reassemble an array from (pos, value) rows collected per group:
    collect_list order is nondeterministic, so sort the structs by
    position before projecting the values out."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(F.col(pos_col), F.col(val_col)))),
        lambda s: s[val_col],
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iterations: int = 1,
) -> DataFrame:
    """Coarse quantizer for IVF: deterministic seeds (the first
    ``n_centroids`` vectors by id) refined by ``iterations`` Lloyd
    steps, entirely as DataFrame ops (no driver-side collect).

    Returns (cluster_id INT, centroid ARRAY<DOUBLE>). K is small by
    construction, so every use site broadcasts this frame.
    """
    w = Window.orderBy(id_col)
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            (F.row_number().over(w) - 1).alias("cluster_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
    )
    cents = seeds
    for _ in range(iterations):
        assigned = ivf_assign(corpus, cents, vec_col=vec_col)
        comps = assigned.select(
            "cluster_id", F.posexplode(vec_col).alias("pos", "v")
        )
        cents = (
            comps.groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("mv"))
            .groupBy("cluster_id")
            .agg(_array_from_components("pos", "mv").alias("centroid"))
        )
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> DataFrame:
    """Attach the ``n_probe`` nearest (by cosine) cluster_ids to each
    row. n_probe=1 partitions the corpus; n_probe>1 is the query-side
    multi-probe. One broadcast nested-loop over K centroid rows — a
    pure scan at any corpus size; with n_probe=1 the arg-max collapses
    to a per-row max_by (no window, no shuffle)."""
    if n_probe == 1:
        # Map-side argmax, zero shuffle: pack all K centroids (with
        # precomputed norms) into ONE broadcast row, then fold over
        # that array per input row. Ties go to the lower cluster_id
        # (array is sorted by cluster_id; strict > keeps the first).
        packed = centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("cluster_id"),
                        F.col("centroid"),
                        F.sqrt(_dot_fold(F.col("centroid"), F.col("centroid"))).alias(
                            "cnorm"
                        ),
                    )
                )
            ).alias("cents")
        )
        vec = F.col(vec_col)
        vnorm = F.sqrt(_dot_fold(vec, vec))
        best = F.aggregate(
            F.col("cents"),
            F.struct(F.lit(-2.0).alias("sim"), F.lit(-1).alias("cluster_id")),
            lambda acc, c: F.when(
                _dot_fold(vec, c["centroid"]) / (vnorm * c["cnorm"]) > acc["sim"],
                F.struct(
                    (_dot_fold(vec, c["centroid"]) / (vnorm * c["cnorm"])).alias("sim"),
                    c["cluster_id"].alias("cluster_id"),
                ),
            ).otherwise(acc),
        )
        return (
            df.crossJoin(F.broadcast(packed))
            .select(*df.columns, best["cluster_id"].alias("cluster_id"))
        )
    sim = (
        _dot_fold(F.col(vec_col), F.col("centroid"))
        / (
            F.sqrt(_dot_fold(F.col(vec_col), F.col(vec_col)))
            * F.sqrt(_dot_fold(F.col("centroid"), F.col("centroid")))
        )
    ).alias("csim")
    pairs = df.crossJoin(F.broadcast(centroids)).select(*df.columns, "cluster_id", sim)
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), "cluster_id")
    ranked = pairs.withColumn("crn", F.row_number().over(w))
    return ranked.filter(F.col("crn") <= n_probe).drop("csim", "crn")


def ivf_params_for(
    n_corpus: int,
    target_cluster: int = 32,
    probe_frac: float = 0.30,
    max_centroids: int = 4096,
) -> tuple[int, int]:
    """Derive (n_centroids, n_probe) from corpus size — same principle
    as lsh_params_for: partition count tracks the data. Centroids ≈
    n/target_cluster keeps the per-cluster candidate list near
    ``target_cluster`` rows at any corpus size (the classic IVF sizing
    ≈ sqrt(n) emerges when target_cluster ≈ sqrt(n); a fixed divisor
    is the right knob here because the verify cost per query is
    n_probe·target_cluster); probing a fixed FRACTION of clusters
    holds recall roughly constant as the corpus grows, with candidate
    volume probe_frac·|corpus| — tunable, never |Q|·|C|."""
    import math

    n_centroids = max(4, min(max_centroids, round(max(n_corpus, 4) / target_cluster)))
    n_probe = max(1, math.ceil(n_centroids * probe_frac))
    return n_centroids, n_probe


def ivf_topk_auto(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ivf_topk with (n_centroids, n_probe) derived from the corpus
    size via ivf_params_for — the corpus count() here is a cheap
    column-pruned scan, the analogue of catalog row stats."""
    n_centroids, n_probe = ivf_params_for(corpus.count())
    return ivf_topk(
        queries, corpus, id_col=id_col, vec_col=vec_col, k=k,
        n_centroids=n_centroids, n_probe=n_probe,
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 1,
) -> DataFrame:
    """IVF-flat approximate cosine top-k: cluster the corpus once with
    a coarse quantizer, then each query scans only its ``n_probe``
    nearest clusters.

    The 100 TB shape: centroid training touches the corpus
    ``iterations`` times (scan + O(K·dim) shuffle), the corpus
    assignment is a single scan written partitioned by cluster_id, and
    each query's candidate set is an equi-join on cluster_id —
    candidate volume ~ (n_probe/n_centroids)·|corpus| instead of the
    brute-force |Q|·|C| cross product. Recall is tuned by n_probe.
    Deterministic end to end (seeded by vec_id order, integer-free
    ranking ties broken by id)."""
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, iterations)
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")),
        cents,
        vec_col="cv",
        n_probe=1,
    )
    q = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        cents,
        vec_col="qv",
        id_col="query_id",
        n_probe=n_probe,
    )
    # corpus rows live in exactly one cluster (n_probe=1 above), so the
    # equi-join below can never produce duplicate (query, match) pairs
    pairs = q.join(c, "cluster_id")
    qnorm = F.sqrt(_dot_fold(F.col("qv"), F.col("qv")))
    cnorm = F.sqrt(_dot_fold(F.col("cv"), F.col("cv")))
    cos = (_dot_fold(F.col("qv"), F.col("cv")) / (qnorm * cnorm)).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def _lsh_buckets_multi(
    df: DataFrame,
    id_name: str,
    vec_name: str,
    n_planes: int,
    n_tables: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """All L tables' sign-LSH buckets in one Arrow-batched pass:
    (id, vec, buckets ARRAY<LONG> of length n_tables). Uses the same
    LCG hyperplanes as ``lsh_bucket`` (seed + 7919·t per table)."""
    import numpy as np

    planes = np.array(
        [
            random_hyperplanes(dim, n_planes, seed + 7919 * t)
            for t in range(n_tables)
        ],
        dtype=np.float64,
    )  # L × n × d
    flat = planes.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    vec_type = df.schema[vec_name].dataType.simpleString()
    id_type = df.schema[id_name].dataType.simpleString()
    schema = f"{id_name} {id_type}, {vec_name} {vec_type}, buckets ARRAY<LONG>"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_name].to_numpy()).astype(np.float64)  # b × d
            bits = (v @ flat.T) > 0  # b × (L·n)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)  # b × L
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    vec_name: pdf[vec_name],
                    "buckets": list(buckets),
                }
            )

    return df.mapInPandas(gen, schema)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: compare only same-bucket pairs.

    At 100 TB the bucket equi-join replaces the crossJoin: candidate
    volume drops by ~2^n_planes per table. Single-table sign-LSH has
    collision probability (1 − θ/π)^n_planes per neighbor — poor for
    moderate-cosine neighbors — so recall is tuned with ``n_tables``
    independent bucketings (candidate recall 1 − (1 − p^n)^L, measured
    0.03 → 0.65 on the near-orthogonal fixtures at n=4, L=8). All L
    bucketings are computed in ONE Arrow pass per side (a b×(L·n)
    matrix multiply — per-table JVM expression chains cost L·n·dim
    Py4J calls to even build); candidates are deduped before the exact
    re-rank so each pair is scored once."""
    qb = _lsh_buckets_multi(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id", "qv", n_planes, n_tables, seed, dim,
    )
    cb = _lsh_buckets_multi(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")),
        "match_id", "cv", n_planes, n_tables, seed, dim,
    )
    q = qb.select("query_id", "qv", F.posexplode("buckets").alias("tbl", "bucket"))
    c = cb.select("match_id", "cv", F.posexplode("buckets").alias("tbl", "bucket"))
    cands = q.join(c, ["tbl", "bucket"]).select("query_id", "qv", "match_id", "cv")
    pairs = cands.dropDuplicates(["query_id", "match_id"])
    qnorm = F.sqrt(_dot_fold(F.col("qv"), F.col("qv")))
    cnorm = F.sqrt(_dot_fold(F.col("cv"), F.col("cv")))
    cos = (_dot_fold(F.col("qv"), F.col("cv")) / (qnorm * cnorm)).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    return (
        pairs.select("query_id", "match_id", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
