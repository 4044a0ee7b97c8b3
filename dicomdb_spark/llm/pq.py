"""Product-quantization ANN: train per-subspace codebooks, encode the
corpus as tiny code ids, score queries via asymmetric distance
computation (ADC) — the memory-side scale path for embedding search.

Why PQ at 100 TB: a 64-dim float64 vector is 512 bytes; its PQ code is
``m`` small ints (4 bytes here).  The corpus side of the search touches
ONLY the code table (a >100× shrink), and distances come from a
(query × m × k) lookup table that is broadcast — so the scan is a
map-side hash-join + sum over a table that fits in memory at any
corpus size.  Candidates never pairwise-join: ADC is additive over
subspaces, one groupBy(query, vector) sum.

Determinism doctrine (same as llm/clustering.py): codebooks come from
the deterministic k-means (lowest-id seeds, floor-scaled integer
distances, exact integer centroid sums), and ADC partial distances are
floor-scaled int64 — so ranks are bit-identical across engines,
partitionings, and re-runs, and a DuckDB oracle can replay training +
encoding + search end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dicomdb_spark.llm.clustering import assign_clusters, kmeans_fit
from dicomdb_spark.llm.similarity import _SCALE


def _sub(vec_col: str, s: int, sub_dim: int):
    """1-based slice of subspace ``s``."""
    return F.slice(F.col(vec_col), 1 + s * sub_dim, sub_dim)


def train_codebooks(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 8,
    iters: int = 1,
) -> list[list[list[float]]]:
    """Per-subspace deterministic k-means codebooks.

    Returns ``m`` centroid lists (each ≤ k × sub_dim floats — empty
    clusters vanish, identically in both engines).  Driver holds only
    m·k·sub_dim doubles; each subspace trains over the full corpus with
    the usual iterative-ML control loop.
    """
    books = []
    for s in range(m):
        sub = vectors.select(
            F.col(id_col), _sub(vec_col, s, sub_dim).alias("sv")
        )
        books.append(kmeans_fit(sub, id_col, "sv", k=k, iters=iters))
    return books


def encode(
    vectors: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "v",
    sub_dim: int = 16,
) -> DataFrame:
    """Corpus → (id, sub, code): the nearest codeword per subspace.
    Map-only (assignment against broadcast codebooks), unioned over
    subspaces — the 100×-smaller table every later search touches."""
    parts = []
    for s, book in enumerate(books):
        sub = vectors.select(F.col(id_col), _sub(vec_col, s, sub_dim).alias("sv"))
        parts.append(
            assign_clusters(sub, book, id_col, "sv").select(
                F.col(id_col), F.lit(s).alias("sub"), F.col("cid").alias("code")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def adc_lut(
    spark: SparkSession,
    queries: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "v",
    sub_dim: int = 16,
) -> DataFrame:
    """(query_id, sub, code, d_i): floor-scaled int64 squared distance
    from each query subvector to each codeword.  n_queries · m · k rows
    — broadcast-sized by construction (the query batch is small; the
    codebook is constant)."""
    rows = [
        (s, cid, [float(x) for x in cv])
        for s, book in enumerate(books)
        for cid, cv in enumerate(book)
    ]
    cb = spark.createDataFrame(rows, "sub int, code int, cv array<double>")
    m = len(books)
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        _sub(vec_col, s, sub_dim).alias("qv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select("query_id", "e.sub", "e.qv")
    d_i = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: F.floor((x - y) * (x - y) * F.lit(_SCALE)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return qsub.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "code", d_i.alias("d_i")
    )


def pq_topk(
    codes: DataFrame,
    lut: DataFrame,
    topk: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search: corpus codes hash-join the broadcast LUT on
    (sub, code), one exact-int sum per (query, vector), window top-k
    by smallest approximate distance (unique neighbor-id tiebreak).
    The corpus side never shuffles more than the (query × corpus)
    partial-sum aggregate — additive over subspaces, no pairwise
    vector math anywhere."""
    scored = (
        codes.join(
            F.broadcast(lut),
            ["sub", "code"],
        )
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("d_i").alias("adc_i"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_i").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("adc_i").cast("double") / F.lit(_SCALE)).alias("adc_dist"),
            "rank",
        )
    )
