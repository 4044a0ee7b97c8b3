"""Approximate-nearest-neighbor search over embedding columns.

Two strategies over ``array<float>`` columns:

* **brute-force top-k** — the correctness baseline: queries × corpus
  join, exact cosine, window top-k.  The corpus side stays put; the
  (small) query side is broadcast, so the cost is one map-side pass
  over the corpus per batch of queries — at 100 TB this is the right
  plan whenever |queries| is small.
* **hyperplane-LSH bucketed** — the scale path for all-pairs /
  large-query workloads: sign-of-dot-product against a fixed set of
  hyperplanes gives each vector a bucket key; candidates only meet
  inside buckets (equi-join on the bucket key → normal shuffled hash
  join, never a cross join).

Determinism: dot products floor each per-element product at a fixed
scale and sum exact int64s, so similarity values are bit-identical
across partitionings, engines, and the fold/vectorized kernels;
ranking ties break by neighbor id.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fixed-point scale for portable exact sums: per-element products are
# floored at 1e-12 (floor of a double is bitwise-identical on every
# IEEE engine, unlike double→DECIMAL casts whose rounding rules differ
# between Spark and DuckDB), then summed as exact longs.  The 1e-12
# quantization is far below any meaningful similarity difference; what
# matters is that both engines compute the *identical* value.
_SCALE = 1e12


def drop_null_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exclude rows whose vector is NULL — broken upstream
    featurization produces them in real feeds, and a scalar None
    crashes every numpy batch path (np.vstack/astype).  Applied at
    every public DataFrame entry of this module; oracles state the
    identical ``embedding IS NOT NULL`` filter (r13 null-probe find).
    """
    return df.filter(F.col(vec_col).isNotNull())


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent, engine-portable dot product (double out)."""
    return (
        F.aggregate(
            F.zip_with(
                a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + F.floor(v * _SCALE).cast("long"),
        )
        / _SCALE
    ).cast("double")


def norm_exact(a: Column) -> Column:
    return F.sqrt(
        (
            F.aggregate(
                a.cast("array<double>"),
                F.lit(0).cast("long"),
                lambda acc, v: acc + F.floor(v * v * _SCALE).cast("long"),
            )
            / _SCALE
        ).cast("double")
    )


def cosine_exact(a: Column, b: Column) -> Column:
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))


# -- vectorized twins -------------------------------------------------------
# Same fixed-point formula, evaluated in numpy over Arrow batches.
# Bit-identical to the fold versions: the elementwise double product,
# the floor, and the int64 sum are all IEEE/exact operations with no
# order dependence — so these are drop-in replacements where the
# per-element fold's interpreter overhead dominates (every ANN scoring
# loop).  ~10× faster per pair than the interpreted aggregate.


def _np_fixed_dot(a, b):
    import numpy as np

    va = np.asarray(a, dtype=np.float64)
    vb = np.asarray(b, dtype=np.float64)
    return np.floor(va * vb * _SCALE).astype(np.int64).sum() / _SCALE


def dot_exact_vec(a: Column, b: Column) -> Column:
    # UDF built lazily: pandas_udf decoration needs an active session,
    # and this module must stay importable before one exists (the
    # driver imports __spark_entry__ → registry → here at startup)
    @F.pandas_udf("double")
    def _dot(x: pd.Series, y: pd.Series) -> pd.Series:
        import numpy as np

        # NULL propagates (SQL dot(NULL, v) is NULL): mask null cells
        # out of the batch — a scalar None breaks np.vstack (r13
        # null-probe find)
        valid = x.notna().to_numpy() & y.notna().to_numpy()
        if valid.all():
            # fast path for the overwhelmingly common all-valid batch:
            # no NaN-Series allocation, no boolean fancy-index copies
            # (the masked path cost the brute-force scorer +45 % even
            # when no NULLs existed — r13 driver control run)
            A = np.vstack(x.to_numpy()).astype(np.float64)
            B = np.vstack(y.to_numpy()).astype(np.float64)
            return pd.Series(
                np.floor(A * B * _SCALE).astype(np.int64).sum(axis=1) / _SCALE,
                index=x.index,
            )
        out = pd.Series(np.nan, index=x.index, dtype="float64")
        if valid.any():
            # whole-batch matrices: one C-level pass for the entire
            # Arrow batch instead of a Python loop per pair
            A = np.vstack(x[valid].to_numpy()).astype(np.float64)
            B = np.vstack(y[valid].to_numpy()).astype(np.float64)
            out[valid] = (
                np.floor(A * B * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
            )
        return out

    return _dot(a, b)


def norm_exact_vec(a: Column) -> Column:
    @F.pandas_udf("double")
    def _norm(x: pd.Series) -> pd.Series:
        import numpy as np

        valid = x.notna().to_numpy()
        if valid.all():
            # all-valid fast path — see _dot above
            A = np.vstack(x.to_numpy()).astype(np.float64)
            return pd.Series(
                np.sqrt(
                    np.floor(A * A * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
                ),
                index=x.index,
            )
        out = pd.Series(np.nan, index=x.index, dtype="float64")
        if valid.any():
            A = np.vstack(x[valid].to_numpy()).astype(np.float64)
            out[valid] = np.sqrt(
                np.floor(A * A * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
            )
        return out

    return _norm(a)


def cosine_exact_vec(a: Column, b: Column) -> Column:
    """Vectorized cosine with bit-identical results to cosine_exact."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    # nullif: a zero-norm vector (empty doc → zero embedding) must
    # yield NULL cosine like DuckDB x/0, not an ANSI crash; both
    # engines then sort NULLs last in the top-k windows
    return dot_exact_vec(ad, bd) / F.nullif(
        norm_exact_vec(ad) * norm_exact_vec(bd), F.lit(0.0)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast(queries) ⋈ corpus (no shuffle of the corpus), then
    a window top-k partitioned by query — the single shuffle is on
    query_id, sized |queries|×|corpus| rows *after* per-partition
    ranking prunes nothing (AQE coalesces).  Self-matches excluded.
    (A pre-scoring corpus repartition was measured and REJECTED here:
    the whole-batch numpy scoring is cheap enough that shuffling the
    vectors costs more than the added parallelism returns — unlike the
    MinHash signature stage, see dedup.minhash_lsh_pairs.)
    """
    corpus = drop_null_vectors(corpus, vec_col)
    queries = drop_null_vectors(queries, vec_col)
    # norms once per vector (not per pair): |q|+|c| norm evaluations
    # instead of 2·|q|·|c|
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", norm_exact_vec(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cn", norm_exact_vec(F.col("__cv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            # nullif: zero-norm vectors → NULL cosine like DuckDB x/0
            dot_exact_vec(F.col("__qv"), F.col("__cv"))
            / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0)),
        )
        .drop("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k Maximum-Inner-Product Search (unnormalized dot) —
    the retrieval scoring used when embedding magnitude carries signal
    (recommendation scores, learned rerankers), vs cosine's
    angle-only ranking in :func:`brute_force_topk`.

    Same scale shape as the cosine baseline: broadcast(queries) ⋈
    corpus (the corpus never shuffles), whole-batch numpy dot, window
    top-k on (query_id).  For the sublinear path, MIPS reduces to
    cosine by the norm-augmentation trick (:func:`mips_augment`,
    Bachrach et al. RecSys 2014) — augment corpus vectors with
    sqrt(M² − ‖x‖²) and queries with 0, then any cosine index
    (LSH/IVF here) answers MIPS."""
    corpus = drop_null_vectors(corpus, vec_col)
    queries = drop_null_vectors(queries, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot_score", dot_exact_vec(F.col("__qv"), F.col("__cv")))
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_score", "rank")
    )


def mips_augment(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The MIPS→cosine reduction: corpus x → [x, sqrt(M²−‖x‖²)]
    (M = max corpus norm, one 1-row broadcast aggregate), query
    q → [q, 0].  Augmented-cosine(q̂, x̂) = dot(q, x) / (‖q‖·M):
    for a fixed query that is a positive constant times the inner
    product, so cosine ranking over the augmented vectors IS the MIPS
    ranking — any cosine ANN index becomes a MIPS index
    (tests/test_round5_ops.py proves rank equivalence).  Pure
    Catalyst fold/concat expressions — no UDF, no shuffle beyond the
    broadcast of one scalar."""
    v = F.col(vec_col).cast("array<double>")
    c = corpus.select(F.col(id_col), v.alias("__v")).withColumn(
        "__nsq", F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x)
    )
    m2 = c.agg(F.max("__nsq").alias("__m2"))
    c_aug = c.crossJoin(F.broadcast(m2)).select(
        id_col,
        F.concat(
            F.col("__v"), F.array(F.sqrt(F.col("__m2") - F.col("__nsq")))
        ).alias("aug"),
    )
    q_aug = queries.select(
        F.col(id_col),
        F.concat(v, F.array(F.lit(0.0))).alias("aug"),
    )
    return c_aug, q_aug


def bucket_by_seed_planes(
    vectors: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector an LSH bucket from sign-of-dot against seed
    hyperplanes — the first ``n_planes`` vectors of the corpus itself
    (deterministic, data-derived, no RNG).

    Plan shape: corpus × broadcast(planes) → 8 rows per vector →
    groupBy(id) reassembles the bit-string ordered by plane id.  At
    scale this is a map-side broadcast join + one hash aggregate.
    Returns (id, bucket<string>).
    """
    import numpy as np

    vectors = drop_null_vectors(vectors, vec_col)
    # The planes are a tiny constant matrix: collect once at plan-build
    # time and close over it — ONE map-only pandas UDF assigns all bits
    # per vector (no cross join, no re-aggregation shuffle).  Bitwise
    # identical to the per-plane fold: same floor-scaled int sums.
    plane_rows = (
        vectors.filter(F.col(id_col) < n_planes)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    P = np.array(
        [r.v for r in sorted(plane_rows, key=lambda r: r[id_col])], dtype=np.float64
    )

    @F.pandas_udf("string")
    def _bucket(x: pd.Series) -> pd.Series:
        A = np.vstack(x.to_numpy()).astype(np.float64)
        # (rows, planes) fixed-point dots, sign → bit chars
        dots = np.stack(
            [
                np.floor(A * P[j] * _SCALE).astype(np.int64).sum(axis=1)
                for j in range(P.shape[0])
            ],
            axis=1,
        )
        bits = np.where(dots >= 0, "1", "0")
        return pd.Series(["".join(row) for row in bits])

    return vectors.select(
        F.col(id_col),
        _bucket(F.col(vec_col).cast("array<double>")).alias("bucket"),
    )


def bucketed_norm_corpus(
    vectors: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, bucket, nrm) in ONE corpus scan and ONE Python hop.

    Fuses :func:`bucket_by_seed_planes` with :func:`norm_exact_vec`
    and drops the ``emb ⋈ buckets`` vec_id self-join the ANN queries
    previously used to attach the bucket to the vector (guide §2.4 —
    remove shuffles outright; §4.1 — the vector column crosses the
    Arrow boundary once, not twice).  Bitwise-identical outputs: the
    plane dots and the norm use the same floor-scaled int64 kernel as
    the split form, and the inner join on the unique ``vec_id`` was a
    no-op row-wise (both sides derive from the same NULL-filtered
    scan), so (id, v, bucket, nrm) is row-for-row the old ``withb``.
    """
    import numpy as np

    vectors = drop_null_vectors(vectors, vec_col)
    plane_rows = (
        vectors.filter(F.col(id_col) < n_planes)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    P = np.array(
        [r.v for r in sorted(plane_rows, key=lambda r: r[id_col])], dtype=np.float64
    )

    @F.pandas_udf("bucket string, nrm double")
    def _bn(x: pd.Series) -> pd.DataFrame:
        A = np.vstack(x.to_numpy()).astype(np.float64)
        dots = np.stack(
            [
                np.floor(A * P[j] * _SCALE).astype(np.int64).sum(axis=1)
                for j in range(P.shape[0])
            ],
            axis=1,
        )
        bits = np.where(dots >= 0, "1", "0")
        nrm = np.sqrt(np.floor(A * A * _SCALE).astype(np.int64).sum(axis=1) / _SCALE)
        return pd.DataFrame(
            {"bucket": ["".join(row) for row in bits], "nrm": nrm}
        )

    # The bucket equi-join infers an isnotnull(bucket) constraint; on
    # a plain nullable UDF output the optimizer pushes that filter
    # below this projection and re-evaluates the UDF (guide §4.4 —
    # observed: two ArrowEvalPython per join side).  bucket is never
    # NULL (the UDF always emits a bit-string for a non-NULL vector),
    # so coalesce(bucket, '') makes the key statically non-null: the
    # inferred filter constant-folds away and the UDF runs once.
    # Kept DETERMINISTIC on purpose: asNondeterministic would also fix
    # the duplication but blocks pushing the query-side vec_id
    # pre-filters past the UDF (multiprobe/recall_eval select 10 query
    # vectors — that filter must reach the parquet scan).
    return (
        vectors.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("__bn", _bn(F.col("v")))
        .select(
            id_col,
            "v",
            F.coalesce(F.col("__bn.bucket"), F.lit("")).alias("bucket"),
            F.col("__bn.nrm").alias("nrm"),
        )
    )


def bucket_pair_dots(
    withb: DataFrame,
    id_col: str = "vec_id",
    per_query_limit: int | None = None,
) -> DataFrame:
    """All ordered same-bucket candidate pairs (id_a ≠ id_b) with the
    exact fixed-point dot: (bucket, query_id, neighbor_id, dot, qn, cn).

    Replaces the bucket self-join + per-pair scoring UDF of the LSH
    all-pairs queries.  That shape ships BOTH vectors across the Arrow
    boundary once per candidate pair — Σ df(bucket)² · dims · 8 bytes,
    QUADRATIC in bucket occupancy (measured 6+ GB of boundary bytes at
    the 20× replica, and the r13 driver saw a 4.79× wall step for a 2×
    data step) — and, worse, the planner broadcast the corpus side and
    ran the scoring UDF at the probe SCAN's parallelism.  Here each
    vector crosses the boundary ONCE per bucket (linear), the C(n,2)
    enumeration and the dot kernel run in blocked numpy inside one
    ``applyInPandas`` per bucket group, and only the 40-byte pair rows
    come back (guide §8: move heavy bytes once, decide on proxies;
    §4.2: whole-group native kernels).

    Bitwise-identical scores: per element floor((a·b)·1e12) → int64
    sum → /1e12, the same operation sequence as :func:`dot_exact_vec`.
    qn/cn pass through from the fused bucket+norm scan so the caller's
    ``dot / nullif(qn·cn, 0)`` cosine (NULL on zero norms) is the same
    JVM expression as before.

    Skew note: one bucket = one group; a pathological hot bucket is a
    straggler task here where the join form spread its pairs over
    probe partitions — at real scale the mitigation is more planes
    (buckets grow as 2^planes), which is the existing knob.

    ``per_query_limit=k`` prunes to each query's top-k candidates
    INSIDE the kernel, making the Python→JVM output linear in the
    corpus (3 rows/query) instead of quadratic in bucket occupancy.
    The prune is EXACT, not partial: a vector lives in exactly one
    bucket, so the group holds every candidate of each of its queries,
    and the selection key replicates the consumer window's total order
    — cosine DESC with Spark double semantics (NaN greatest) and
    NULL (zero-norm denominator) last, ties by neighbor_id ASC — so
    the downstream ``row_number() ≤ k`` filter keeps exactly the same
    rows and re-ranks the survivors identically.
    """
    import numpy as np

    empty = pd.DataFrame(
        {
            "bucket": pd.Series(dtype="str"),
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "dot": pd.Series(dtype="float64"),
            "qn": pd.Series(dtype="float64"),
            "cn": pd.Series(dtype="float64"),
        }
    )

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        A = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        d = A.shape[1]
        bucket = pdf["bucket"].iloc[0]
        # blocked pairwise fixed-point dots: bound the (chunk, n, d)
        # float64 temp at ~64 MB so a hot bucket cannot OOM the worker
        chunk = max(1, int((1 << 23) // max(n * d, 1)))
        qs, cs, dts = [], [], []
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            dots = (
                np.floor(A[s:e, None, :] * A[None, :, :] * _SCALE)
                .astype(np.int64)
                .sum(axis=2)
                / _SCALE
            )
            qi = np.repeat(np.arange(s, e), n)
            ci = np.tile(np.arange(n), e - s)
            keep = ids[qi] != ids[ci]
            qs.append(qi[keep])
            cs.append(ci[keep])
            dts.append(dots.ravel()[keep])
        qi = np.concatenate(qs)
        ci = np.concatenate(cs)
        dot = np.concatenate(dts)
        if per_query_limit is not None:
            # in-kernel exact top-k per query over the window's total
            # order: ascending key = -cosine with NaN → -inf (Spark
            # sorts NaN as the GREATEST double, so it ranks first in
            # DESC) and zero-denominator (NULL cosine downstream) →
            # +inf (NULLS LAST); ties by neighbor id ASC, matching
            # row_number() OVER (ORDER BY cosine DESC, neighbor_id)
            den = nrm[qi] * nrm[ci]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / den
            key = -cos
            key[np.isnan(cos)] = -np.inf
            key[den == 0.0] = np.inf
            order = np.lexsort((ids[ci], key, ids[qi]))
            qsorted = ids[qi][order]
            starts = np.zeros(len(order), dtype=bool)
            starts[0] = True
            starts[1:] = qsorted[1:] != qsorted[:-1]
            rank = np.arange(len(order)) - np.maximum.accumulate(
                np.where(starts, np.arange(len(order)), 0)
            )
            sel = order[rank < per_query_limit]
            qi, ci, dot = qi[sel], ci[sel], dot[sel]
        return pd.DataFrame(
            {
                "bucket": bucket,
                "query_id": ids[qi],
                "neighbor_id": ids[ci],
                "dot": dot,
                "qn": nrm[qi],
                "cn": nrm[ci],
            }
        )

    return withb.groupBy("bucket").applyInPandas(
        _pairs,
        schema=(
            "bucket string, query_id long, neighbor_id long, "
            "dot double, qn double, cn double"
        ),
    )


def seed_cell_norm_corpus(
    vectors: DataFrame,
    n_cents: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "v",
    with_norm: bool = True,
) -> DataFrame:
    """(id, v, cell, nrm?) in ONE corpus scan and ONE Python hop — the
    IVF coarse quantizer fused with the per-vector norm.

    Replaces the crossJoin(broadcast(cents)) → per-(vec, cent) dot UDF
    → row_number window → join-back-on-vec_id pipeline of the IVF
    queries (guide §2.4 — that shape shuffled the corpus twice and ran
    three Arrow hops; §4.1 — the vector crosses the boundary once).

    Bitwise-identical outputs by construction:

    * cell = argmax of the floor-scaled int64 dot against the
      ``n_cents`` lowest-id corpus vectors, ties broken by LOWEST
      cent_id — np.argmax returns the first maximum and the centroid
      matrix is cent_id-ordered, which replays the old
      ``row_number() OVER (ORDER BY dp DESC, cent_id)`` pick;
    * a NULL vector keeps the old NULL-dp semantics (dp NULL for every
      centroid → all tie → lowest cent_id wins, nrm NULL) — the IVF
      oracles do NOT null-filter, so neither does this kernel (unlike
      :func:`bucketed_norm_corpus`, whose oracles do);
    * nrm is the same floor-scaled int64 kernel as norm_exact_vec.

    coalesce(cell, first_cent_id) keeps the cell equi-join key
    statically non-null so the inferred isnotnull filter
    constant-folds instead of re-evaluating the UDF (guide §4.4).
    """
    import numpy as np

    cent_rows = (
        vectors.filter(F.col(id_col) < n_cents)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("cv"))
        .collect()
    )
    cent_rows = sorted(cent_rows, key=lambda r: r[id_col])
    if not cent_rows:
        # no centroids → the old inner join on the (empty) assignment
        # produced an empty corpus; replay that exactly
        out = vectors.select(id_col, vec_col).where(F.lit(False)).withColumn(
            "cell", F.lit(None).cast("bigint")
        )
        if with_norm:
            out = out.withColumn("nrm", F.lit(None).cast("double"))
        return out
    cid_tags = np.asarray([r[id_col] for r in cent_rows], dtype=np.int64)
    # a NULL centroid's dp is NULL on every row → it sorts below every
    # real dp and can only win an all-NULL tie, where the LOWEST
    # cent_id wins regardless: int64-min sentinel rows reproduce both.
    dim = next((len(r.cv) for r in cent_rows if r.cv is not None), 0)
    P = np.asarray(
        [
            r.cv if r.cv is not None else [0.0] * dim
            for r in cent_rows
        ],
        dtype=np.float64,
    )
    null_cent = np.asarray([r.cv is None for r in cent_rows], dtype=bool)
    first_cid = int(cid_tags[0]) if len(cid_tags) else -1

    @F.pandas_udf("cell bigint, nrm double")
    def _cn(x: pd.Series) -> pd.DataFrame:
        valid = x.notna().to_numpy()
        # all-NULL dp tie → lowest cent_id; nrm NULL (NaN → Arrow null)
        cells = np.full(len(x), first_cid, dtype=np.int64)
        nrm = np.full(len(x), np.nan, dtype=np.float64)
        if valid.any():
            A = np.vstack(x[valid].to_numpy()).astype(np.float64)
            d = np.empty((A.shape[0], P.shape[0]), dtype=np.int64)
            for j in range(P.shape[0]):
                if null_cent[j]:
                    d[:, j] = np.iinfo(np.int64).min
                else:
                    d[:, j] = (
                        np.floor(A * P[j] * _SCALE).astype(np.int64).sum(axis=1)
                    )
            cells[valid] = cid_tags[np.argmax(d, axis=1)]
            nrm[valid] = np.sqrt(
                np.floor(A * A * _SCALE).astype(np.int64).sum(axis=1) / _SCALE
            )
        return pd.DataFrame({"cell": cells, "nrm": nrm})

    out_cols = [
        F.col(id_col),
        F.col(vec_col),
        F.coalesce(F.col("__cn.cell"), F.lit(first_cid)).alias("cell"),
    ]
    if with_norm:
        out_cols.append(F.col("__cn.nrm").alias("nrm"))
    return (
        vectors.select(id_col, vec_col)
        .withColumn("__cn", _cn(F.col(vec_col).cast("array<double>")))
        .select(*out_cols)
    )


def hyperplane_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot LSH bucket key: one char per hyperplane ('1'/'0').

    Planes are plain float lists (deterministic, engine-portable —
    derived by the caller, e.g. from seed vectors of the corpus
    itself), so the oracle can rebuild identical buckets.
    """
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot_exact(vec_col, arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    broadcast_queries: bool = True,
) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates.

    Recall is approximate (that is the point); the join is an
    equi-join on the bucket key — shuffle-partitioned, no cross
    product, scales with bucket occupancy.

    ``broadcast_queries``: right for a query batch ≪ corpus (map-side
    join, corpus never shuffles).  Pass ``False`` for a large or
    all-pairs query side — the bucket equi-join then shuffles both
    sides instead of materializing the full query set on every
    executor (a scale-killer when queries ~ corpus).
    """
    corpus = drop_null_vectors(corpus, vec_col)
    queries = drop_null_vectors(queries, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    qside = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.join(qside, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine_exact_vec(F.col("__qv"), F.col("__cv")))
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "cosine_sim", "rank")
    )
