"""Corpus-level training-data operations: mixing, packing, and
benchmark decontamination.

These are the operators a 100 TB pretraining pipeline runs AFTER
per-document scoring/dedup: choose what goes into the mix (stratified
deterministic sampling with per-stratum rates), keep evaluation sets
out of it (n-gram contamination join), and pack the survivors into
fixed-budget training sequences.

Determinism doctrine: sampling uses md5 of the document id compared
against a precomputed hex threshold — no RNG, no seed state; re-runs,
engine ports, and partitioning all reproduce the same mix.  This is
the standard "salted hash bucket" sampling trick; md5 because it is
bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dicomdb_spark.functions.text import token_count, tokens


def hash_threshold(rate: float) -> str:
    """Sampling rate → 8-hex lexicographic threshold: a document is
    kept when the first 8 hex chars of md5(id) sort below it.  Fixed-
    width lowercase hex compares identically to the numeric value in
    both engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(rate * 16**8), "08x")


def sample_hash(id_col: Column | str) -> Column:
    """The per-document sampling key: md5 of the id's decimal string."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, 8)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep rates, plus
    a ``mix_weight`` column (1/rate) so downstream loss weighting can
    undo the sampling bias.  Map-only — one scan, no shuffle, no RNG."""
    thr = F.lit(hash_threshold(default_rate))
    for name, rate in rates.items():
        thr = F.when(F.col(stratum_col) == name, F.lit(hash_threshold(rate))).otherwise(thr)
    rate_col = F.lit(float(default_rate))
    for name, rate in rates.items():
        rate_col = F.when(F.col(stratum_col) == name, F.lit(float(rate))).otherwise(rate_col)
    return (
        df.withColumn("__h", sample_hash(id_col))
        .filter(F.col("__h") < thr)
        .withColumn("mix_weight", (F.lit(1.0) / rate_col).cast("double"))
        .drop("__h")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    budget: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end to
    end in deterministic (shard, id) order and cut into ``budget``-
    token training sequences; a document belongs to the sequence its
    first token lands in.

    Packing is inherently sequential, so it runs PER SHARD — the
    window partitions by the shard key and shards pack in parallel
    (at scale: one shard ≈ one input partition, so the "sort" is a
    per-partition sort, not a global one).  Returns per-sequence
    stats: (shard, seq_id, n_docs, n_tokens, fill_ratio).
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_toks"),
    )
    placed = toks.withColumn(
        "seq_id", F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / budget)
    )
    return (
        placed.groupBy("shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .withColumn("fill_ratio", (F.col("n_tokens") / budget).cast("double"))
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least
    ``min_shared`` distinct word ``n``-grams with ANY benchmark
    document are flagged.

    Relational shape: both sides explode to distinct gram hashes, meet
    in an equi-join on the 128-bit md5 key, then one count per corpus
    doc.  Benchmark gram sets are small (eval suites), so the join is
    a broadcast; the corpus side never shuffles before the flag agg.
    """

    def gram_hashes(df: DataFrame, out_id: str) -> DataFrame:
        toks = F.transform(tokens(text_col), lambda t: F.lower(t))
        m = F.size(toks) - (n - 1)
        acc = F.slice(toks, 1, F.greatest(m, F.lit(0)))
        for j in range(1, n):
            acc = F.zip_with(
                acc,
                F.slice(toks, j + 1, F.greatest(m, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(acc)).alias("gram"),
        ).select(out_id, F.md5("gram").alias("gh"))

    corp = gram_hashes(corpus, "doc_id")
    bench = gram_hashes(benchmark, "bench_id").select("gh").distinct()
    shared = (
        corp.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.countDistinct("gh").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )
    return corpus.select(F.col(id_col).alias("doc_id")).join(
        shared, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        (F.coalesce("n_shared_grams", F.lit(0)) >= min_shared).alias("contaminated"),
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    cap: int = 3,
) -> DataFrame:
    """Per-domain document cap — the web-corpus quota pass (a handful
    of domains dominate any crawl; capping them is standard before
    training).  Extract the registrable host from the URL, rank each
    domain's documents by quality (unique id tiebreak), keep the top
    ``cap``.

    Plan: one regexp (map-only) + one window partitioned BY DOMAIN —
    the sort is per-domain, never global, so skew follows domain
    occupancy and the usual salting/AQE story applies to mega-domains.
    Emits every document with its rank and kept flag so downstream
    can either filter or audit.
    """
    d = df.select(
        F.col(id_col),
        F.col(quality_col),
        F.regexp_extract(F.col(url_col), r"https?://([^/]+)/", 1).alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    return d.withColumn("rank", F.row_number().over(w)).select(
        id_col,
        "domain",
        "rank",
        (F.col("rank") <= cap).alias("kept"),
    )


def _md5_bucket(tok, n_buckets: int):
    """First md5 byte of the token → 0..n_buckets-1; engine-portable
    (DuckDB twin: strpos-based hex digits)."""
    return (F.conv(F.substring(F.md5(tok), 1, 2), 16, 10).cast("long") % n_buckets)


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    min_parallelism: int | None = None,
) -> DataFrame:
    """DSIR-style importance weights via hashed unigram features
    (Xie et al.: Data Selection for LMs via Importance Resampling —
    public method): tokens hash into ``n_buckets`` buckets; each
    bucket gets the smoothed frequency ratio target/raw; a document's
    score is the average ratio over its tokens (> 1 ⇒ looks like the
    target distribution).

    Determinism: the ratio is floor-scaled to 1e4 from exact integer
    counts (each factor < 2^53, so the double products and division
    are correctly rounded and bit-identical across engines); the doc
    score is an exact int sum / count.

    Plan at 100 TB: one explode + two tiny (n_buckets-row) aggregates,
    a broadcast join of the 64-row ratio table back onto the exploded
    tokens, one groupBy(doc).  No shuffle ever carries more than the
    token stream, and the model state is constant-size.
    """
    if min_parallelism is not None:
        # small/unsplittable local input: one parquet row group fans
        # out to 1 task regardless of cores (same rationale and
        # default-off contract as dedup.minhash_lsh_pairs)
        df = df.repartition(min_parallelism)
    toks = df.select(
        F.col(id_col),
        target_filter.alias("__is_target"),
        F.explode(F.transform(tokens(text_col), lambda t: F.lower(t))).alias("tok"),
    ).select(id_col, "__is_target", _md5_bucket(F.col("tok"), n_buckets).alias("b"))
    stats = toks.groupBy("b").agg(
        F.count("*").alias("cnt_r"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("cnt_t"),
    )
    totals = stats.agg(
        F.sum("cnt_r").alias("n_r"), F.sum("cnt_t").alias("n_t")
    )
    ratio = stats.crossJoin(F.broadcast(totals)).select(
        "b",
        F.floor(
            (
                (F.col("cnt_t") + 1).cast("double")
                * (F.col("n_r") + n_buckets).cast("double")
                / (
                    (F.col("cnt_r") + 1).cast("double")
                    * (F.col("n_t") + n_buckets).cast("double")
                )
            )
            * 10000
        )
        .cast("long")
        .alias("r_i"),
    )
    return (
        toks.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_toks"), F.sum("r_i").alias("s_i"))
        .select(
            id_col,
            "n_toks",
            (F.col("s_i").cast("double") / (F.col("n_toks") * 10000.0)).alias(
                "dsir_score"
            ),
            (
                F.col("s_i").cast("double") / (F.col("n_toks") * 10000.0) > 1.0
            ).alias("selected"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted top-k sample (the Efraimidis–Spirakis
    A-Res shape, IPL 2006 — public method): priority = h / w where h
    is the uniform 32-bit md5 prefix of the id and w the weight —
    heavier documents get systematically smaller priorities, so the
    k smallest-priority rows are a weighted sample (the md5 hash
    plays the role of Efraimidis–Spirakis's uniform draw; the ratio
    keeps the arithmetic to one exact int→double division instead of
    the u^(1/w) power, whose libm rounding differs across engines).

    Deterministic: same corpus → same sample, independent of
    partitioning, re-runs, and engine — the property that makes
    pipeline re-runs and engine ports reproducible where RNG sampling
    is not.  Plan: map-only priority + ONE top-k (TakeOrdered at this
    size; at 100 TB swap the global limit for a per-partition
    rank-prefilter then limit — each partition only ever surfaces its
    own k smallest).
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    pr = h / F.col(weight_col).cast("double")
    # a NULL weight is unsampleable: its NULL priority would sort
    # NULLS FIRST here but NULLS LAST in SQL engines (r13 null-probe)
    return (
        df.filter(F.col(weight_col).isNotNull())
        .select(F.col(id_col), F.col(weight_col), pr.alias("priority"))
        .orderBy("priority", id_col)
        .limit(k)
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram LM quality score (the CCNet idea — score
    documents by how typical their n-grams are under a corpus LM —
    with frequency averages instead of log-perplexity so every number
    is a ratio of exact integer counts, never a transcendental).

    Per document: mean corpus frequency of its token bigrams (low ⇒
    unusual/garbled text) and the hapax fraction (share of bigrams
    seen nowhere else).  Documents need ≥ 2 tokens to have a bigram.

    Plan: tokenize once, adjacent-pair via array zip (row-local, no
    window), one bigram-keyed count (the "training" shuffle), one
    join back + doc aggregate.  Model state is the bigram count table
    — itself a DataFrame, so it scales like any aggregate, and a
    real deployment would md5 the bigrams down to fixed-width keys
    exactly like the dedup family."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    m = F.size(toks) - 1
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(m, F.lit(0))),
        F.slice(toks, 2, F.greatest(m, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = df.select(F.col(id_col), F.explode(bigrams).alias("bg"))
    model = bg.groupBy("bg").agg(F.count("*").alias("c"))
    return (
        bg.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.sum("c").cast("double") / F.count("*")).alias("avg_bigram_freq"),
            (
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("hapax_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 120,
    stride: int = 90,
) -> DataFrame:
    """Sliding-window character chunking (context-window preparation).

    Each document yields substrings starting at 1, 1+stride, ... while
    the start is inside the text; overlap = chunk_size - stride.  One
    sequence+posexplode per row — a narrow row-local expansion (no
    shuffle), so at 100 TB it parallelizes with the scan and the
    output is at most ceil(len/stride) rows per doc.  Chunk provenance
    (doc id, index, start offset) rides along for traceability.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    starts = F.sequence(F.lit(1), F.greatest(F.length(text_col), F.lit(1)), F.lit(stride))
    return df.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.substring(F.col(text_col), F.col("chunk_start"), F.lit(chunk_size)).alias("chunk"),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    iters: int = 3,
) -> DataFrame:
    """Train BPE merge rules on a corpus (Sennrich, Haddow & Birch,
    ACL 2016 — public method): start from character symbol streams,
    repeatedly count adjacent symbol pairs and merge the most
    frequent one.  Fully declarative on BOTH engines — the chosen
    pair never touches the driver (a 1-row argmax broadcasts into the
    next round's ``replace``), so the loop is the same
    fixed-iteration join+aggregate shape as PageRank / k-means.

    Determinism: pair counts are exact integer sums; the argmax
    tiebreak is (count DESC, pair ASC) byte order; ``replace``
    rewrites leftmost-nonoverlapping in both engines, which is
    exactly BPE's greedy left-to-right merge application.

    Stream encoding: symbols joined by TWO spaces, the whole stream
    wrapped in single spaces (`` a  b  a ``).  A merge then replaces
    ``" A  B "`` with ``" AB "`` — each match consumes only the inner
    half of its boundary separators, so ADJACENT matches still find
    their leading space (single-space encoding silently skips every
    other pair in an ABAB run) while symbol boundaries stay exact
    (``" a  bc "`` can never half-match a ``b``).

    Scale shape per round: state is the VOCABULARY (distinct word →
    symbol stream, counts welded on), not the corpus — the classic
    trick that makes BPE training cheap: the corpus is read once for
    word counts, then every round is one explode+sum over vocab-sized
    data, one broadcast of a single row, one map-side rewrite.

    Returns (step, pair, merged, pair_count) — the ordered merge
    table a tokenizer would apply (functions/text.py:
    bpe_symbol_stream applies such rules).
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy(F.lower("w").alias("w"))
        .agg(F.count("*").alias("cnt"))
    )
    stream = words.select(
        F.concat(
            F.lit(" "), F.rtrim(F.regexp_replace("w", "(.)", "$1  ")), F.lit(" ")
        ).alias("stream"),
        "cnt",
    ).persist()
    out = None
    for step in range(1, iters + 1):
        sy = stream.select(F.split(F.trim(F.col("stream")), "  ").alias("sy"), "cnt")
        pairs = sy.select(
            F.explode(
                F.expr(
                    "zip_with(slice(sy, 1, greatest(size(sy) - 1, 0)),"
                    "         slice(sy, 2, greatest(size(sy) - 1, 0)),"
                    "         (a, b) -> concat(a, ' ', b))"
                )
            ).alias("pr"),
            "cnt",
        )
        counts = pairs.groupBy("pr").agg(F.sum("cnt").alias("c"))
        best = (
            counts.orderBy(F.col("c").desc(), F.col("pr"))
            .limit(1)
            .select("pr", "c")
        )
        row = best.select(
            F.lit(step).alias("step"),
            F.col("pr").alias("pair"),
            F.replace(F.col("pr"), F.lit(" "), F.lit("")).alias("merged"),
            F.col("c").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        nxt = stream.crossJoin(F.broadcast(best)).select(
            F.replace(
                F.col("stream"),
                F.concat(
                    F.lit(" "),
                    F.replace(F.col("pr"), F.lit(" "), F.lit("  ")),
                    F.lit(" "),
                ),
                F.concat(
                    F.lit(" "),
                    F.replace(F.col("pr"), F.lit(" "), F.lit("")),
                    F.lit(" "),
                ),
            ).alias("stream"),
            "cnt",
        )
        stream = nxt.persist() if step < iters else nxt
    return out


def bpe_train_oracle(iters: int = 3) -> str:
    """DuckDB replay of :func:`bpe_train` — unrolled WITH chain, one
    (pairs, argmax, rewrite) layer per round, identical arithmetic."""
    toks = r"list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')"
    layers = [
        f"""w0 AS (
      SELECT lower(t.t) AS w, count(*) AS cnt
      FROM (SELECT unnest({toks}) AS t FROM documents) t
      GROUP BY 1),
    s0 AS (
      SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '
               AS stream, cnt
      FROM w0)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        layers.append(
            f"""p{i} AS (
      SELECT pr, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT unnest(list_transform(range(1, len(sy)),
                                         j -> sy[j] || ' ' || sy[j + 1])) AS pr,
                   cnt
            FROM (SELECT string_split(trim(stream), '  ') AS sy, cnt
                  FROM s{p}) t) u
      GROUP BY 1),
    b{i} AS (SELECT pr, c FROM p{i} ORDER BY c DESC, pr LIMIT 1),
    s{i} AS (
      SELECT replace(s.stream,
                     ' ' || replace(b.pr, ' ', '  ') || ' ',
                     ' ' || replace(b.pr, ' ', '') || ' ') AS stream, s.cnt
      FROM s{p} s CROSS JOIN b{i} b)"""
        )
    chain = ",\n    ".join(layers)
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS step, pr AS pair, replace(pr, ' ', '') AS merged, "
        f"c AS pair_count FROM b{i}"
        for i in range(1, iters + 1)
    )
    return f"WITH {chain}\n    {selects}"
