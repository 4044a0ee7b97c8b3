"""Document deduplication for training-data pipelines.

Four families, each expressed Spark-first:

* **exact** — content-hash groupBy.  One shuffle on a 128-bit key.
* **n-gram Jaccard** — shingle → inverted-index join → per-pair
  intersection counts.  The candidate join is on the shingle key, so
  only documents sharing ≥1 shingle ever meet (never O(n²)).
* **MinHash + LSH** — per-doc signature (k portable hash mins), banded
  into buckets; candidate pairs only within a bucket.  At 100 TB this
  is the scale path: signature computation is a map-only pass, and the
  bucket join's fan-out is controlled by (bands, rows-per-band).
* **SimHash** — per-token hash bit-votes → a compact bit fingerprint;
  duplicates = equal (or near-equal) fingerprints.

Portability note: every hash is ``md5`` (identical in Spark and
DuckDB), never ``xxhash64``/``hash`` (engine-specific), so the DuckDB
oracle can reproduce signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dicomdb_spark.operators.lineage import cut_lineage

from dicomdb_spark.functions.text import shingles, tokens

HEX = "0123456789abcdef"

# The pair-scoring operators persist their multi-consumer shingle
# frames (the explode feeds df-counts AND both verify sides), but the
# operator returns a LAZY DataFrame — there is no in-function point
# where the cache can be dropped without losing the reuse.  Handles
# are tracked here instead; long-running sessions (bench reps,
# repeated registry queries) call :func:`release_pair_caches` after
# materializing a result so superseded shingle caches don't pin
# storage memory until LRU eviction.
_PAIR_CACHES: list[DataFrame] = []

# Bound for sessions that never call release_pair_caches (ADVICE r6):
# once the tracked list exceeds this, the OLDEST handles are
# unpersisted and dropped on the next _track_cache — superseded
# shingle caches can't pin storage memory (or DataFrame refs) forever.
_PAIR_CACHE_CAP = 8


def _track_cache(df: DataFrame) -> DataFrame:
    while len(_PAIR_CACHES) >= _PAIR_CACHE_CAP:
        old = _PAIR_CACHES.pop(0)
        try:
            old.unpersist(False)
        except Exception:  # session already stopped
            pass
    _PAIR_CACHES.append(df)
    return df


def release_pair_caches(blocking: bool = False) -> int:
    """Unpersist every tracked pair-operator cache; returns the count.
    Safe at any time — unpersisting before an action only forfeits
    reuse, never correctness."""
    n = 0
    while _PAIR_CACHES:
        df = _PAIR_CACHES.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped
            pass
    return n


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5(content) groups with >1 member.

    Returns (content_hash, n_dups, keeper_id) — keeper = min id, the
    canonical deterministic survivor policy.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") >= 2)
    )


def minhash_signature(text_col: Column | str, num_hashes: int = 16, n: int = 3) -> Column:
    """MinHash signature: array of ``num_hashes`` hex-string minima.

    hash_i(shingle) = md5(i || ':' || shingle); the minimum is taken in
    lexicographic order, which equals numeric order for fixed-width
    lowercase hex.  Empty-shingle docs get NULL slots.
    """
    sh = shingles(text_col, n)

    def slot(i: int) -> Column:
        # NB: the lambda must be single-argument — a two-arg lambda
        # would be interpreted by F.transform as (element, index)
        prefix = f"{i}:"
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s)))
        )

    return F.array(*[slot(i) for i in range(num_hashes)])


def minhash_signatures_pandas(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """MinHash signatures computed map-only in Python (hashlib md5 is
    bit-identical to Spark/DuckDB md5), one batch pass per partition —
    no explode, no groupBy shuffle.  Tokenization replicates the SQL
    path exactly: split on Java's ASCII ``\\s`` class, drop empties,
    lowercase, 3-gram space-joined shingles, distinct.

    Returns (doc, m0..m{k-1}); docs without shingles are omitted
    (matching the relational path).
    """
    import hashlib
    import re
    from collections.abc import Iterator

    import pandas as pd

    n_chunks_per_md5 = 4
    n_seeds = (num_hashes + n_chunks_per_md5 - 1) // n_chunks_per_md5
    # Java \s (Spark split) is ASCII-only — Python's \s is unicode-aware,
    # so spell the class out to match the oracle byte-for-byte
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    out_cols = ["doc"] + [f"m{i}" for i in range(num_hashes)]
    schema = ", ".join(["doc long"] + [f"m{i} string" for i in range(num_hashes)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t.lower() for t in ws.split(text or "") if t]
                if len(toks) < n:
                    continue
                shingles_set = {
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                }
                row = [did]
                for j in range(n_seeds):
                    mins = [None] * n_chunks_per_md5
                    prefix = f"{j}:".encode()
                    for s in shingles_set:
                        h = hashlib.md5(prefix + s.encode()).hexdigest()
                        for k in range(n_chunks_per_md5):
                            c = h[k * 8 : k * 8 + 8]
                            if mins[k] is None or c < mins[k]:
                                mins[k] = c
                    for k in range(n_chunks_per_md5):
                        if j * n_chunks_per_md5 + k < num_hashes:
                            row.append(mins[k])
                rows.append(row)
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema=schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    min_parallelism: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id1 < id2, distinct).

    Signature → ``bands`` band-hashes (md5 of the concatenated band
    slice) → self-join per (band_idx, band_hash) bucket.  Docs with no
    shingles are excluded.  At scale: the signature pass is map-only;
    the bucket join shuffles on the band hash — bucket sizes are the
    only quadratic term, bounded by tuning bands×rows.

    ``min_parallelism``: repartition the corpus to this width before
    the CPU-heavy shingle/md5 stage.  Set it ONLY when the input has
    fewer splits than cores (small/unsplittable files — e.g. one local
    parquet row group fans out to 1 task regardless of cluster size);
    at real corpus scale input splits already exceed cores and the
    extra full shuffle of raw text would be pure cost, so it defaults
    off.  Measured local[32] @ sf0.1: 2.96 s → 1.12 s.
    """
    sig = minhash_signature_table(
        df, id_col, text_col, num_hashes=num_hashes, n=n,
        min_parallelism=min_parallelism,
    )
    return lsh_pairs_from_signatures(sig, num_hashes=num_hashes, bands=bands)


def minhash_signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    n: int = 3,
    min_parallelism: int | None = None,
) -> DataFrame:
    """The signature half of :func:`minhash_lsh_pairs` — (doc, m0..mk)
    — split out so a banding sweep (dedup_band_tuning) can persist ONE
    signature table and re-band it per configuration instead of paying
    the shingle+digest pass per config."""
    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    # Relational signature: explode shingles once, compute each of the
    # k hashes exactly once per shingle, take the k minima in ONE hash
    # aggregate.  (The array-column formulation — minhash_signature —
    # re-evaluates the shingle expression per hash slot; fine for a few
    # rows, quadratic-ish at corpus scale.)
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    )
    # hash-family economy: one md5 yields four independent 32-bit
    # (8-hex-char) chunks under the random-oracle model, so k hashes
    # cost k/4 md5 evaluations (25% faster signatures, same recall)
    aggs = []
    for j in range((num_hashes + 3) // 4):
        h = F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))
        for k in range(4):
            i = j * 4 + k
            if i < num_hashes:
                aggs.append(F.min(F.substring(h, k * 8 + 1, 8)).alias(f"m{i}"))
    return sh.groupBy("doc").agg(*aggs)


def lsh_pairs_from_signatures(
    sig: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The banding half of :func:`minhash_lsh_pairs`: band-hash the
    signature table and self-join per (band, bhash) bucket."""
    rows = num_hashes // bands
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col(f"m{b * rows + r}") for r in range(rows)]
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bhash")
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id1"), F.col("r.doc").alias("id2"))
        .distinct()
    )


def _df_capped_pair_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int,
    ub_keep,
) -> DataFrame:
    """Shared df-capped inverted-index core for the exact n-gram
    similarity joins: (id1, id2, inter, sz1, sz2) for every pair that
    shares at least one shingle with document frequency ≤ ``max_df``.

    The plain inverted index generates a candidate row per shared
    shingle OCCURRENCE, so its cost is Σ df(s)² — quadratic in bucket
    size, and web-scale corpora have pathological hot shingles
    (boilerplate trigrams in 10⁶+ docs).  The cap bounds every bucket:
    candidate generation costs ≤ |shingles|·max_df², and a hot shingle
    (df > max_df, carrying ~no similarity signal — it fails to
    discriminate by definition) never enters the pair join.

    Exactness: the cap gates only CANDIDATE GENERATION.  Scores are
    recomputed row-locally from the full per-doc shingle arrays
    (``array_intersect``, the PPJoin-style verify), so a surviving
    pair's inter/sz values are exact — the cap's only semantic effect
    is dropping pairs whose every shared shingle is hot, which is the
    documented contract (mirrored in the DuckDB oracles).

    Between candidate generation and the array verify sits a LOSSLESS
    upper-bound prune: the capped join yields each pair's count of
    shared cold-shingle HASHES (xxhash64 — the pair join never touches
    the shingle strings, so the shuffled sort key is 8 bytes instead
    of a 3-token text; a hash collision can only INFLATE the count),
    and the hot contribution is bounded by min(hot₁, hot₂) (hotᵢ =
    doc i's shingles above the cap), so true_inter ≤ cold_inter ≤
    the joined count + min(hot₁, hot₂).  ``ub_keep(ub, sz1, sz2)``
    decides with that bound; callers phrase the metric's threshold
    test over the bound (monotone in inter), subtracting an epsilon so
    float roundoff can only keep, never drop — and since both
    collision inflation and the epsilon only ever KEEP extra
    candidates, and every survivor is re-scored exactly from the full
    arrays, the output is unchanged.  On dense small-vocabulary
    corpora this prunes ~99.9% of candidates before any array touches
    a shuffle (measured 1.96 M → ~2 k at sf0.1).  Document-frequency
    counting (the cap itself) stays on the true shingle strings: a
    collision there could merge two dfs past the cap and DROP a pair,
    which would change results.
    """
    sets = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingles(text_col, n)).alias("__shs"),
    )
    # sets feeds the explode AND both verify sides — materialize the
    # CPU-dense tokenize/shingle once (multi-consumer persist
    # discipline, same as the PageRank loop invariants)
    sets = _track_cache(sets.persist())
    sh = sets.select("doc", F.explode("__shs").alias("shingle"))
    keep = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("shingle")
    )
    # drop the shingle STRING at the earliest point it is no longer
    # needed: everything downstream (self-join key, count) works on
    # the 8-byte hash, shrinking the two big exchanges (guide: shuffle
    # fewer bytes / narrower types)
    cold = sh.join(keep, "shingle").select(
        "doc", F.xxhash64("shingle").alias("__shk")
    )
    # per-doc totals (full distinct-shingle size, hot count) are
    # annotated onto the COLD rows *before* the pair join, so the pair
    # aggregate can carry them via max() and the prune runs directly on
    # the aggregate output — zero per-pair stat joins downstream
    # (measured: the post-agg s1/s2 joins over the ~2M-pair set cost
    # more than the whole pair aggregate)
    stats = (
        cold.groupBy("doc")
        .agg(F.count("*").alias("__csz"))
        .join(sets.select("doc", F.size("__shs").alias("__sz")), "doc")
        .select("doc", "__sz", (F.col("__sz") - F.col("__csz")).alias("__hot"))
    )
    cold_ann = cold.join(stats, "doc")
    # shared-cold-shingle count per pair.  Instead of the sorted
    # self-join (two reads of the posting exchange + a sort-merge on
    # the key), gather each posting bucket ONCE and enumerate its
    # C(df,2) pairs in-plan with array higher-order functions: the cap
    # bounds every bucket at max_df docs, so the per-group state is
    # ≤ max_df structs and the expansion is the same ≤ |shingles|·
    # max_df² rows the join produced — one exchange on the key, no
    # join, no sort (measured 7.4 s → 4.5 s for this subplan at
    # sf0.1).  array_sort orders the structs by doc (first field), so
    # x-before-y enumeration reproduces the join's doc< ordering;
    # colliding same-doc occurrences yield id1 = id2 rows, filtered
    # exactly as the join's a.doc < b.doc predicate did.
    cold_pairs = (
        cold_ann.groupBy("__shk")
        .agg(F.expr("array_sort(collect_list(struct(doc, __sz, __hot)))").alias("ds"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds)), "
                    "y -> struct(x.doc AS id1, y.doc AS id2, "
                    "x.__sz AS sz1, x.__hot AS __h1, "
                    "y.__sz AS sz2, y.__hot AS __h2))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .filter(F.col("id1") != F.col("id2"))
        .groupBy("id1", "id2")
        .agg(
            F.count("*").alias("__ci"),
            F.max("sz1").alias("sz1"),
            F.max("__h1").alias("__h1"),
            F.max("sz2").alias("sz2"),
            F.max("__h2").alias("__h2"),
        )
    )
    ub = F.col("__ci") + F.least(F.col("__h1"), F.col("__h2"))
    survivors = cold_pairs.filter(ub_keep(ub, F.col("sz1"), F.col("sz2"))).select(
        "id1", "id2"
    )
    return (
        survivors.join(sets.select(F.col("doc").alias("id1"), F.col("__shs").alias("__sa")), "id1")
        .join(sets.select(F.col("doc").alias("id2"), F.col("__shs").alias("__sb")), "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("__sa", "__sb")).alias("inter"),
            F.size("__sa").alias("sz1"),
            F.size("__sb").alias("sz2"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    min_parallelism: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Inverted-index shape: explode distinct shingles, self-join on the
    shingle (co-occurrence = candidate), count shared shingles per
    pair, then |A∩B| / (|A|+|B|−|A∩B|).  Only pairs sharing at least
    one shingle are scored, so cost follows shingle-bucket sizes, not
    n².  Returns (id1, id2, jaccard) above threshold.
    ``min_parallelism``: see minhash_lsh_pairs — local small-file
    fan-out for the CPU-bound shingle stage only.
    ``max_df``: document-frequency cap on the candidate join (see
    :func:`_df_capped_pair_scores`) — REQUIRED at corpus scale, where
    hot boilerplate shingles make the uncapped self-join quadratic;
    pairs sharing only hot shingles are dropped, surviving scores are
    exact.  ``None`` keeps the exhaustive join (small/curated sets).
    """
    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    if max_df is not None:
        # jaccard is monotone in inter: J(inter) = inter/(sz1+sz2-inter),
        # so the bound test J(ub) ≥ t − ε is a lossless prune
        def ub_keep(ub, sz1, sz2):
            return ub * (1.0 + threshold) >= threshold * (sz1 + sz2) - 1e-9

        scored = _df_capped_pair_scores(df, id_col, text_col, n, max_df, ub_keep)
        return (
            scored.withColumn(
                "jaccard",
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id1", "id2", "jaccard")
        )
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    )
    # sh feeds three consumers (both join sides + sizes) and Spark does
    # not reuse the exchange across them — materialize the CPU-dense
    # tokenize/shingle/explode once (same multi-consumer persist
    # discipline as the PageRank loop invariants)
    sh = _track_cache(sh.persist())
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    sz1 = sizes.select(F.col("doc").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("doc").alias("id2"), F.col("sz").alias("sz2"))
    return (
        pairs.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Shingle-set Jaccard join with PREFIX FILTERING (Chaudhuri,
    Ganti & Kaushik, "A Primitive Operator for Similarity Joins", ICDE
    2006; Xiao et al., PPJoin, WWW 2008 — public methods).

    The plain inverted index (ngram_jaccard_pairs) generates a
    candidate pair for EVERY shared shingle, so frequent shingles
    create near-quadratic bucket blow-ups.  Prefix filtering is the
    standard at-scale fix: order each document's shingles by ascending
    global document frequency (rarest first, ties by text) and keep
    only the first ``|d| − ⌈t·|d|⌉ + 1`` as join keys — if J(A,B) ≥ t
    the two prefixes MUST share an element, so the pruning is LOSSLESS
    while the join keys become the rarest (smallest-bucket) shingles.
    The threshold is the exact rational num/den, so prefix lengths are
    integer arithmetic, not float; same element domain and threshold →
    bit-identical output to ngram_jaccard_pairs, by construction.

    Plan: per-doc distinct-shingle ARRAYS persist once; an explode
    feeds a document-frequency WINDOW count over the shingle partition
    (one exchange — attaching df with an agg + join back would shuffle
    the same exploded stream on the same key and then pay a second
    read or, worse, tempt the optimizer into broadcasting the exploded
    stream, which is a measured scale/latency killer) and a
    per-document window that ranks each doc's shingles rarest-first;
    the ranked PREFIX table persists so its pipeline runs once, not
    once per self-join side; the PRUNED pair join runs on
    ``xxhash64`` of the prefix shingles only — 8-byte shuffle keys; a
    hash collision can only ADD a candidate pair, and every candidate
    is verified exactly below, while every true J ≥ t pair still
    shares a true prefix shingle and therefore its hash, so the
    pruning stays LOSSLESS.  Verification is ROW-LOCAL — candidate
    pairs equi-join the two per-doc arrays and ``array_intersect``
    counts |A∩B| without another shuffle fan-out (the PPJoin verify
    step; a relational re-join of candidates against all occurrences
    was measured 5× slower).  Every join is an equi-join; the
    quadratic surface (pair generation) touches only rare-shingle
    buckets.  Returns (id1, id2, jaccard ≥ t).
    """
    from pyspark.sql import Window

    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    sets = df.select(
        F.col(id_col).alias("doc"),
        F.array_sort(F.array_distinct(shingles(text_col, n))).alias("shs"),
    ).persist()
    _track_cache(sets)
    tok = sets.select("doc", F.size("shs").alias("sz"), F.explode("shs").alias("tok"))
    # document frequency as an unordered window count over the shingle
    # partition: same value as groupBy(tok).count() joined back (tok
    # comes from per-doc DISTINCT arrays), one exchange instead of
    # agg + join, and nothing for the planner to mis-broadcast
    ranked = tok.withColumn(
        "df", F.count("*").over(Window.partitionBy("tok"))
    ).withColumn(
        "r",
        F.row_number().over(Window.partitionBy("doc").orderBy("df", "tok")),
    )
    # prefix length = sz − ceil(t·sz) + 1, with ceil as exact integer
    # arithmetic: ceil(num·sz/den) = floor((num·sz + den − 1)/den)
    plen = (
        F.col("sz")
        - F.floor(
            (F.col("sz") * threshold_num + (threshold_den - 1)) / threshold_den
        )
        + 1
    )
    prefix = (
        ranked.filter(F.col("r") <= plen)
        .select("doc", F.xxhash64("tok").alias("tok"), "r", "sz")
        .persist()
    )
    _track_cache(prefix)
    # PPJoin positional filter: a shared prefix token at ranks (rA, rB)
    # bounds the overlap by 1 + min(szA−rA, szB−rB); J ≥ t needs
    # overlap ≥ num·(szA+szB)/(num+den), so pairs whose bound falls
    # short are pruned INSIDE the join (row-local integer test) before
    # the distinct — candidates drop before they cost a shuffle.
    o_bound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.r"), F.col("b.sz") - F.col("b.r")
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (
                o_bound * (threshold_num + threshold_den)
                >= threshold_num * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .distinct()
    )
    a_sets = sets.select(F.col("doc").alias("id1"), F.col("shs").alias("__sa"))
    b_sets = sets.select(F.col("doc").alias("id2"), F.col("shs").alias("__sb"))
    return (
        cand.join(a_sets, "id1")
        .join(b_sets, "id2")
        .withColumn("inter", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn("sz1", F.size("__sa"))
        .withColumn("sz2", F.size("__sb"))
        # threshold test in exact integers (inter·den ≥ num·union), the
        # reported jaccard as the one double division both engines share
        .filter(
            F.col("inter") * threshold_den
            >= threshold_num * (F.col("sz1") + F.col("sz2") - F.col("inter"))
        )
        .select(
            "id1",
            "id2",
            (
                F.col("inter").cast("long")
                / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("long")
            ).alias("jaccard"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    min_parallelism: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Near-superset pairs: shingle containment |A∩B| / min(|A|,|B|).

    Catches substring-style duplication that Jaccard misses — a short
    document wholly contained in a longer one scores 1.0 here while
    its Jaccard can be arbitrarily low.  Same inverted-index join
    shape as ``ngram_jaccard_pairs`` (cost follows shingle-bucket
    sizes, never n²).  Returns (id1, id2, containment).
    ``min_parallelism``: see minhash_lsh_pairs.
    ``max_df``: document-frequency cap on the candidate join (see
    :func:`_df_capped_pair_scores`) — bounds hot-shingle buckets at
    corpus scale; surviving scores stay exact.
    """
    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    if max_df is not None:
        # containment is monotone in inter with a fixed denominator, so
        # ub/min(sz) ≥ t − ε is a lossless prune
        def ub_keep(ub, sz1, sz2):
            return ub >= threshold * F.least(sz1, sz2) - 1e-9

        scored = _df_capped_pair_scores(df, id_col, text_col, n, max_df, ub_keep)
        return (
            scored.withColumn(
                "containment",
                F.col("inter") / F.least(F.col("sz1"), F.col("sz2")),
            )
            .filter(F.col("containment") >= threshold)
            .select("id1", "id2", "containment")
        )
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    )
    # sh feeds three consumers (both join sides + sizes) and Spark does
    # not reuse the exchange across them — materialize the CPU-dense
    # tokenize/shingle/explode once (same multi-consumer persist
    # discipline as the PageRank loop invariants)
    sh = _track_cache(sh.persist())
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    sz1 = sizes.select(F.col("doc").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("doc").alias("id2"), F.col("sz").alias("sz2"))
    return (
        pairs.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn(
            "containment", F.col("inter") / F.least(F.col("sz1"), F.col("sz2"))
        )
        .filter(F.col("containment") >= threshold)
        .select("id1", "id2", "containment")
    )


def prefix_filter_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 10,
    min_parallelism: int | None = None,
) -> DataFrame:
    """:func:`ngram_containment_pairs` with a LOSSLESS prefix filter —
    the containment adaptation of the Chaudhuri/PPJoin pruning.

    Containment ≥ t on min(|A|,|B|) means the SMALLER document S must
    overlap the other by ⌈t·|S|⌉ elements, so S's
    ``|S| − ⌈t·|S|⌉ + 1`` rarest shingles (global-df order, ties by
    text) must hit the other document's full set.  Candidates are
    therefore generated ASYMMETRICALLY: prefix tokens of the
    smaller-by-size side join the other side's full occurrence list
    (size ties broken by id).  A hot shingle ranks LAST in every
    prefix, so hot buckets pair only with rare-token prefixes — the
    near-quadratic bucket blow-up of the plain inverted index never
    forms.  Same threshold arithmetic (exact rational), same verify
    (row-local array_intersect), bit-identical output by
    construction.

    The df attach, the persisted prefix table, and the ``xxhash64``
    pair-join key follow :func:`prefix_filter_jaccard_pairs` (see its
    docstring for the losslessness argument — collisions only ADD
    candidates, which the exact row-local verify then scores).
    """
    from pyspark.sql import Window

    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    sets = df.select(
        F.col(id_col).alias("doc"),
        F.array_sort(F.array_distinct(shingles(text_col, n))).alias("shs"),
    ).persist()
    _track_cache(sets)
    tok = sets.select(
        "doc", F.size("shs").alias("sz"), F.explode("shs").alias("tok")
    )
    ranked = tok.withColumn(
        "df", F.count("*").over(Window.partitionBy("tok"))
    ).withColumn(
        "r",
        F.row_number().over(Window.partitionBy("doc").orderBy("df", "tok")),
    )
    plen = (
        F.col("sz")
        - F.floor(
            (F.col("sz") * threshold_num + (threshold_den - 1)) / threshold_den
        )
        + 1
    )
    prefix = (
        ranked.filter(F.col("r") <= plen)
        .select("doc", F.xxhash64("tok").alias("tok"), "sz")
        .persist()
    )
    _track_cache(prefix)
    full = tok.select(
        F.col("doc").alias("fdoc"),
        F.xxhash64("tok").alias("tok"),
        F.col("sz").alias("fsz"),
    )
    cand = (
        prefix.join(
            full,
            (prefix["tok"] == full["tok"])
            & (
                (prefix["sz"] < full["fsz"])
                | ((prefix["sz"] == full["fsz"]) & (prefix["doc"] < full["fdoc"]))
            ),
        )
        .select(
            F.least(F.col("doc"), F.col("fdoc")).alias("id1"),
            F.greatest(F.col("doc"), F.col("fdoc")).alias("id2"),
        )
        .distinct()
    )
    a_sets = sets.select(F.col("doc").alias("id1"), F.col("shs").alias("__sa"))
    b_sets = sets.select(F.col("doc").alias("id2"), F.col("shs").alias("__sb"))
    return (
        cand.join(a_sets, "id1")
        .join(b_sets, "id2")
        .withColumn("inter", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn("msz", F.least(F.size("__sa"), F.size("__sb")))
        .withColumn("containment", F.col("inter") / F.col("msz"))
        # the FINAL test mirrors ngram_containment_pairs bit-for-bit
        # (double compare against the same literal); the rational
        # num/den is used only for the prefix length, where 9/10 ≤
        # the double 0.9 keeps the pruning lossless
        .filter(F.col("containment") >= threshold_num / threshold_den)
        .select("id1", "id2", "containment")
    )


def simhash(text_col: Column | str, bits: int = 16) -> Column:
    """SimHash fingerprint over lowercase tokens → long.

    Per token: md5 → first ``bits/4`` hex chars → bit votes (+1 when
    the bit is set, −1 otherwise); fingerprint bit b = sign of vote
    sum.  All portable expressions (instr over a hex alphabet instead
    of engine-specific bit intrinsics).
    """
    toks = F.transform(tokens(text_col), lambda t: F.md5(F.lower(t)))
    out = F.lit(0).cast("long")
    for b in range(bits):
        hex_pos = b // 4 + 1  # 1-based char in md5 hex
        bit_in_nibble = 3 - (b % 4)  # hex digit's bit, MSB-first
        # vote_b = Σ over tokens of (bit ? 1 : −1)
        vote = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                (
                    (F.instr(F.lit(HEX), F.substring(h, hex_pos, 1)) - 1)
                    .cast("int")
                    .bitwiseAND(F.lit(1 << bit_in_nibble))
                )
                > 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        out = out + F.when(vote > 0, F.lit(1 << (bits - 1 - b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_relational(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    min_parallelism: int | None = None,
) -> DataFrame:
    """SimHash per document, relational formulation → (id, simhash).

    Explode tokens, md5 each token ONCE, then ``bits`` conditional-sum
    aggregates in a single hash aggregate.  Identical semantics to the
    ``simhash`` column expression but linear in total tokens (the
    column form re-evaluates the token array per bit — 16× the hash
    work).  Documents with zero tokens produce no row (match the
    column form by pre-filtering empties).
    ``min_parallelism``: see minhash_lsh_pairs.
    """
    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    ).select(F.col(id_col), F.md5(F.lower(F.col("__t"))).alias("h"))
    votes = []
    for b in range(bits):
        hex_pos = b // 4 + 1
        mask = 1 << (3 - (b % 4))
        bit_set = (
            (F.instr(F.lit(HEX), F.substring(F.col("h"), hex_pos, 1)) - 1)
            .cast("int")
            .bitwiseAND(F.lit(mask))
            > 0
        )
        votes.append(
            F.sum(F.when(bit_set, F.lit(1)).otherwise(F.lit(-1))).alias(f"v{b}")
        )
    g = tok.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(
            F.col(f"v{b}") > 0, F.lit(1 << (bits - 1 - b)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return g.select(F.col(id_col), fp.alias("simhash"))


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Exact-simhash duplicate groups (hamming-0 buckets).

    Hamming ≤ k near-dup is ``simhash_near_pairs`` below (pigeonhole
    block buckets — same equi-join shape, never all-pairs).
    """
    return (
        simhash_relational(df, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") >= 2)
    )


def _hamming_blocks(bits: int, k: int) -> list[tuple[int, int]]:
    """(shift, mask) for k+1 near-equal blocks covering ``bits`` MSB-first.

    Pigeonhole: two fingerprints within hamming distance k must agree
    exactly on at least one of k+1 disjoint blocks — the classic
    near-duplicate bucketing (Manku/Jain/Sarma, WWW'07, public).
    """
    n_blocks = k + 1
    base, extra = divmod(bits, n_blocks)
    blocks, hi = [], bits
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        hi -= width
        blocks.append((hi, (1 << width) - 1))
    return blocks


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    k: int = 2,
    min_parallelism: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs with hamming distance ≤ k.

    Candidate generation is an equi-join on (block_idx, block_value)
    buckets from the pigeonhole split — only fingerprints sharing an
    exact block ever meet, so cost follows bucket occupancy, never n².
    Verification is an exact popcount on the XOR (bit_count is
    engine-portable).  Returns (id1 < id2, hamming), hamming-0 pairs
    included.
    """
    sig = simhash_relational(df, id_col, text_col, bits, min_parallelism)
    blocks = _hamming_blocks(bits, k)
    banded = sig.select(
        F.col(id_col).alias("doc"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftright("simhash", shift).bitwiseAND(F.lit(mask)).alias("bval"),
                    )
                    for i, (shift, mask) in enumerate(blocks)
                ]
            )
        ).alias("bb"),
    ).select("doc", "simhash", "bb.block", "bb.bval")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("id1"),
            F.col("r.doc").alias("id2"),
            F.col("l.simhash").alias("__s1"),
            F.col("r.simhash").alias("__s2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("__s1").bitwiseXOR(F.col("__s2")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= k)
        .select("id1", "id2", "hamming")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Exact duplicated-substring detection at n-gram granularity:
    every maximal run of token positions whose n-grams also occur in
    some OTHER document ("Deduplicating Training Data Makes Language
    Models Better" finds these with a suffix array; the Spark-first
    equivalent is relational).

    Plan: tokenize ONCE (posexplode), build each position's n-gram
    with ``lead`` over a per-document window (one window pass — all
    leads share the frame), md5 it, then ONE shuffle keyed on the
    128-bit gram hash where min(id)≠max(id) over the hash-partition
    window marks grams spanning >1 document (countDistinct isn't a
    window function, but for "≥2 distinct" min≠max is equivalent and
    is — and it avoids both the aggregate+equi-join-back AND the
    double computation of the gram lineage that a self-join costs).
    Finally gaps-and-islands (pos − row_number) merges adjacent
    duplicated positions into maximal spans.

    At 100 TB: the per-document window is bounded by document length
    (no global sort); the gram-hash shuffle is uniform (md5 keys);
    each gram moves exactly once.  Returns (doc_id, span_start,
    span_end, span_tokens), positions 0-based inclusive.
    """
    from pyspark.sql import Window

    if min_parallelism is not None:
        df = df.repartition(min_parallelism)
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    tok = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    grams = (
        tok.select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].alias("__tail"),
        )
        .filter(F.col("__tail").isNotNull())
        .select(id_col, "pos", F.md5("gram").alias("gh"))
    )
    gw = Window.partitionBy("gh")
    hits = (
        grams.withColumn("__mn", F.min(id_col).over(gw))
        .withColumn("__mx", F.max(id_col).over(gw))
        .filter(F.col("__mn") != F.col("__mx"))
        .select(id_col, "pos")
    )
    w2 = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn("isl", F.col("pos") - F.row_number().over(w2))
    return (
        isl.groupBy(id_col, "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def min_label_components(
    pairs: DataFrame,
    iters: int = 3,
    persist_edges: bool = True,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Connected components over a near-duplicate pair list by
    min-label propagation: every vertex starts as its own label; each
    round it takes the minimum label among itself and its neighbors.

    ``iters`` rounds resolve any component whose diameter ≤ iters —
    dedup graphs are near-cliques (every member pairs with most
    others), so a small constant converges; both engine and oracle run
    the SAME fixed rounds, so results stay comparable even on a
    pathological chain.  Each round is one shuffle keyed by vertex id
    (messages = edges ⋈ labels, then a min agg) — the lightweight
    relational form of the classic large-star/small-star algorithm.

    Returns (doc_id, component) for every vertex that appears in a
    pair; component = the propagated minimum member id.

    ``persist_edges`` (default on) materializes the edge and vertex
    tables before the loop — every round references edges once and
    the label lineage re-derives the (possibly expensive) upstream
    pair computation per reference otherwise: composed over the
    minhash candidate join, the unpersisted 3-round loop re-runs the
    whole signature pipeline ~7× (measured sf0.1: 7.6 s → 1.1 s).
    Same loop-invariant discipline as graph.pagerank.

    ``broadcast_labels`` (default off): dedup graphs have vertex sets
    bounded by the candidate-pair population — usually ≪ corpus and
    16 bytes/vertex of label state — so, exactly like
    graph.pagerank's broadcast_ranks, hinting the per-round label
    table as the broadcast side turns every round into a map-side
    join over the cached edge list + one small min-aggregate, no
    large shuffle.  Opt-in because it is wrong when components span
    a web-scale vertex population.
    """
    verts = (
        pairs.select(F.col("id1").alias("doc_id"))
        .unionAll(pairs.select(F.col("id2").alias("doc_id")))
        .distinct()
    )
    # SELF-LOOPS make each round a single join+aggregate: min over
    # N(v) ∪ {v} ≡ least(own, min over N(v)), so the label table is
    # referenced ONCE per round.  The textbook two-reference form
    # (join msgs back onto labels) doubles the uncached label lineage
    # every round — 2^iters plan copies, measured as a 7.5 s
    # pipeline that this rewrite (with the edge persist) takes to
    # ~1 s at sf0.1 — while this form keeps the lineage linear,
    # exactly like the pagerank loop.
    edges = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionAll(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .unionAll(verts.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst")))
    )
    if persist_edges:
        # hash-partition the materialized edges BY THE JOIN KEY, not
        # round-robin: every round equi-joins on src, and the
        # checkpointed LogicalRDD preserves hashpartitioning(src), so
        # the per-round join reuses this partitioning (zero edge
        # exchanges across the loop) instead of re-shuffling the edge
        # list each round — the property that makes shuffle-join label
        # propagation viable at web scale, and locally it also
        # rebalances the 3-way union's partition blowup.
        # localCheckpoint rather than persist: it TRUNCATES lineage,
        # so each round's plan is a scan of materialized state instead
        # of a nested InMemoryRelation chain over the (possibly
        # UDF-heavy) pair tree — composed over the brute-force cosine
        # pair join, the persist-chain form produced a 2,560-node
        # executed plan (704 Exchange, every round re-nesting the pair
        # subtree) whose planning alone dominated, and whose eviction
        # under storage pressure silently replayed every round.
        edges = edges.repartition(
            pairs.sparkSession.sparkContext.defaultParallelism, "src"
        ).transform(cut_lineage)
    hint = F.broadcast if broadcast_labels else (lambda df: df)
    labels = verts.select("doc_id", F.col("doc_id").alias("lbl"))
    for _ in range(iters):
        labels = (
            edges.join(hint(labels), edges["src"] == labels["doc_id"])
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lbl").alias("lbl"))
        )
        if persist_edges:
            # Materialize EVERY round's label state, not just the
            # edges: round k's broadcast (or the final consumer) then
            # reads round k−1's materialized RDD — one edge-join per
            # round.  Unmaterialized, each broadcast collect replays
            # all prior rounds from scratch, an O(iters²) recompute
            # that measured 5.2 s (components) + 9.0 s (final
            # anti-join re-deriving the whole chain again) inside the
            # sf0.1 dedup pipeline.  Label state is 16 B/vertex — the
            # same per-iteration discipline as Pregel superstep state;
            # superseded rounds' blocks are freed by the
            # ContextCleaner when their references drop.
            labels = labels.transform(cut_lineage)
    return labels.select("doc_id", F.col("lbl").alias("component"))
