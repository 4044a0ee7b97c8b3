"""registry chunk 6/8 — mechanical split of the monolithic registry.py (round 10); original lines 21462-25651.  Registration order preserved."""
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from dicomdb_spark.operators.lineage import cut_lineage
from dicomdb_spark.functions import scalars, text, vectors  # noqa: F401 (vectors used via llm)
from dicomdb_spark.io import load_table
from dicomdb_spark.llm import dedup as ldedup
from dicomdb_spark.llm import corpus as lcorpus
from dicomdb_spark.llm import rerank as lrerank
from dicomdb_spark.llm import similarity as lsim
from dicomdb_spark.operators import aggregates as agg
from dicomdb_spark.operators import joins as oj
from dicomdb_spark.operators import windows as ow
from dicomdb_spark.session import local_fanout
from dicomdb_spark.registry._core import register
from dicomdb_spark.registry.q01 import (
    _SQL_DOCS2,
    _SQL_TOKS,
    _SQL_TOKS_RAW,
    _docs_with_dupes,
    _minhash_pairs_cte,
)
from dicomdb_spark.registry.q05 import _SQL_BARS, _SQL_CL, _bars, _cl_col


# ---------------------------------------------------------------------------
# Round-7 continuation batch D: text-quality / corpus-curation signals.
# ---------------------------------------------------------------------------


@register(
    "text_readability_fk",
    f"""
    WITH t AS (SELECT doc_id, lower(text) AS lt, {_SQL_TOKS_RAW} AS tk
               FROM documents),
    m AS (SELECT doc_id,
                 CAST(len(tk) AS BIGINT) AS n_words,
                 CAST(len(list_filter(string_split_regex(lt, '[.!?]+'),
                                      x -> length(trim(x)) > 0)) AS BIGINT)
                   AS n_sentences,
                 CAST(length(regexp_replace(lt, '[aeiouy]+', 'a', 'g'))
                      - length(regexp_replace(
                          regexp_replace(lt, '[aeiouy]+', 'a', 'g'),
                          'a', '', 'g')) AS BIGINT) AS n_syllables
          FROM t)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             AS flesch_ease
    FROM m WHERE n_words > 0 AND n_sentences > 0
    """,
)
def text_readability_fk(spark, sf_dir):
    """Flesch reading-ease per document (Flesch, 1948): 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with syllables
    approximated as maximal vowel-group runs — the classic heuristic
    every readability-aware quality filter uses when a dictionary
    isn't affordable at corpus scale.  The vowel-group count uses a
    collapse-to-marker regex (every group becomes a single 'a'; the
    only 'a's left ARE markers), so both engines count identically
    with two linear regex passes; everything is row-local map work."""
    docs = load_table(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    tk = text.tokens("text")
    g1 = F.regexp_replace(lt, "[aeiouy]+", "a")
    m = docs.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_words"),
        F.size(
            F.filter(
                F.split(lt, r"[.!?]+"), lambda x: F.length(F.trim(x)) > 0
            )
        )
        .cast("long")
        .alias("n_sentences"),
        (F.length(g1) - F.length(F.regexp_replace(g1, "a", "")))
        .cast("long")
        .alias("n_syllables"),
    )
    return m.filter((F.col("n_words") > 0) & (F.col("n_sentences") > 0)).select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        (
            F.lit(206.835)
            - 1.015
            * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
            - 84.6
            * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
        ).alias("flesch_ease"),
    )


@register(
    "text_numeric_density",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS_RAW} AS tk FROM documents),
    m AS (SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(length(text)
                      - length(regexp_replace(text, '[0-9]', '', 'g'))
                      AS BIGINT) AS digit_chars,
                 CAST(length(regexp_replace(
                        regexp_replace(text, '[0-9]+', '0', 'g'),
                        '[^0-9]', '', 'g')) AS BIGINT) AS digit_groups,
                 CAST(len(tk) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(tk, x -> regexp_matches(x, '[0-9]')))
                      AS BIGINT) AS numeric_tokens
          FROM t)
    SELECT doc_id, n_chars, digit_chars, digit_groups, n_tokens, numeric_tokens,
           CAST(digit_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
             AS digit_density
    FROM m WHERE n_chars > 0
    """,
)
def text_numeric_density(spark, sf_dir):
    """Numeric-content profile per document: digit characters, digit
    RUNS (collapse-to-marker regex), and tokens containing digits —
    the C4/Gopher-family signal that separates prose from tables,
    logs, and serial-number spam (high digit density ⇒ drop or route
    to a structured pipeline).  Pure row-local regex/array column
    expressions, map-only."""
    docs = load_table(spark, sf_dir, "documents")
    tk = text.tokens("text")
    t = F.col("text")
    m = docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", "")))
        .cast("long")
        .alias("digit_chars"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(t, "[0-9]+", "0"), "[^0-9]", ""
            )
        )
        .cast("long")
        .alias("digit_groups"),
        F.size(tk).cast("long").alias("n_tokens"),
        F.size(F.filter(tk, lambda x: x.rlike("[0-9]")))
        .cast("long")
        .alias("numeric_tokens"),
    )
    return m.filter(F.col("n_chars") > 0).select(
        "doc_id", "n_chars", "digit_chars", "digit_groups", "n_tokens",
        "numeric_tokens",
        (
            F.col("digit_chars").cast("double") / F.col("n_chars").cast("double")
        ).alias("digit_density"),
    )


@register(
    "text_ngram_novelty",
    f"""
    WITH tk AS (SELECT source, {_SQL_TOKS} AS tk FROM documents),
    bg AS (SELECT DISTINCT source,
                  unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                                        i -> tk[i] || ' ' || tk[i + 1])) AS bg
           FROM tk),
    df AS (SELECT bg, CAST(count(*) AS BIGINT) AS df FROM bg GROUP BY 1)
    SELECT bg.source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty_rate
    FROM bg JOIN df ON df.bg = bg.bg
    GROUP BY 1
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Cross-source bigram novelty: per source, the fraction of its
    DISTINCT bigrams that appear in no other source — the diversity /
    contamination screen data-mixing runs use to decide whether a new
    source actually adds content or just re-serves the web (novelty
    ≈ 0 ⇒ near-duplicate of the existing mix).  Distinct-(source,
    bigram) aggregate, a bigram-grain document-frequency join, one
    per-source rollup — all vocabulary-bounded after the first
    distinct."""
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select(
        "source", F.explode(text.shingles("text", 2)).alias("bg")
    ).distinct()
    df = bg.groupBy("bg").agg(F.count("*").cast("long").alias("df"))
    return (
        bg.join(df, "bg")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
            (
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            ).alias("novelty_rate"),
        )
    )


@register(
    "corpus_language_balance_t2",
    """
    WITH l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1),
    n AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM l),
    s AS (SELECT l.lang, l.n_docs,
                 CAST(l.n_docs AS DOUBLE) / CAST(n.n AS DOUBLE) AS p,
                 CAST(floor(sqrt(CAST(l.n_docs AS DOUBLE) / CAST(n.n AS DOUBLE))
                            * 1000000000.0) AS BIGINT) AS sc
          FROM l CROSS JOIN n),
    t AS (SELECT CAST(SUM(sc) AS BIGINT) AS tot FROM s)
    SELECT s.lang, s.n_docs, s.p,
           CAST(s.sc AS DOUBLE) / CAST(t.tot AS DOUBLE) AS weight,
           CAST(s.sc AS DOUBLE) / CAST(t.tot AS DOUBLE) / s.p
             AS oversample_factor
    FROM s CROSS JOIN t
    """,
)
def corpus_language_balance_t2(spark, sf_dir):
    """Temperature-smoothed language sampling weights at T = 2:
    w_l ∝ p_l^(1/T) = √p_l — the multilingual rebalancing rule from
    the mBERT/XLM-R recipe that up-samples tail languages without
    letting them dominate.  T = 2 is the one temperature expressible
    with bit-portable math (p^(1/2) = sqrt, correctly rounded on both
    engines; libm pow is not); the cross-language normalizer sums
    floor-scaled int64 terms, so the reduction is order-independent.
    Output: per-language share, weight, oversample factor."""
    docs = load_table(spark, sf_dir, "documents")
    lng = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    n = lng.agg(F.sum("n_docs").cast("long").alias("n"))
    p = F.col("n_docs").cast("double") / F.col("n").cast("double")
    s = lng.crossJoin(n).select(
        "lang", "n_docs",
        p.alias("p"),
        F.floor(F.sqrt(p) * 1000000000.0).cast("long").alias("sc"),
    )
    t = s.agg(F.sum("sc").cast("long").alias("tot"))
    w = F.col("sc").cast("double") / F.col("tot").cast("double")
    return s.crossJoin(t).select(
        "lang", "n_docs", "p",
        w.alias("weight"),
        (w / F.col("p")).alias("oversample_factor"),
    )


@register(
    "corpus_chunk_overlap_audit",
    f"""
    WITH t AS (SELECT doc_id, CAST(len({_SQL_TOKS_RAW}) AS BIGINT) AS n_tok
               FROM documents),
    c AS (SELECT doc_id, n_tok,
                 CAST(1 + floor(CAST(greatest(n_tok - 100, 0) AS DOUBLE)
                                / 80.0) AS BIGINT) AS n_chunks
          FROM t WHERE n_tok > 0),
    e AS (SELECT doc_id, n_tok, n_chunks, unnest(range(0, n_chunks)) AS i
          FROM c),
    l AS (SELECT doc_id, n_tok, n_chunks,
                 least(100, n_tok - 80 * i) AS chunk_len
          FROM e)
    SELECT doc_id, n_tok AS n_tokens, n_chunks,
           CAST(SUM(chunk_len) AS BIGINT) AS sum_chunk_tokens,
           CAST(SUM(chunk_len) - n_tok AS BIGINT) AS overlap_tokens,
           CAST(min(chunk_len) AS BIGINT) AS min_chunk_len
    FROM l GROUP BY 1, 2, 3
    """,
)
def corpus_chunk_overlap_audit(spark, sf_dir):
    """Sliding-window chunking audit (window 100 tokens, stride 80 —
    the RAG/pretraining overlap-20 recipe): per document, the chunk
    count from the closed form 1 + ⌊max(n−100,0)/80⌋, the summed chunk
    lengths, and the implied overlap (Σlen − n) — the invariant a
    chunker must satisfy for no token to be dropped (min_chunk_len > 0
    proves the tail chunk is non-empty).  One sequence-explode per doc
    (fan-out n/80, linear), exact integers throughout."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(text.tokens("text")).cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    c = t.select(
        "doc_id", "n_tok",
        (
            1
            + F.floor(
                F.greatest(F.col("n_tok") - 100, F.lit(0)).cast("double") / 80.0
            )
        )
        .cast("long")
        .alias("n_chunks"),
    )
    e = c.select(
        "doc_id", "n_tok", "n_chunks",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
            "i"
        ),
    )
    ln = e.select(
        "doc_id", "n_tok", "n_chunks",
        F.least(F.lit(100).cast("long"), F.col("n_tok") - 80 * F.col("i")).alias(
            "chunk_len"
        ),
    )
    return ln.groupBy(
        F.col("doc_id"), F.col("n_tok").alias("n_tokens"), F.col("n_chunks")
    ).agg(
        F.sum("chunk_len").cast("long").alias("sum_chunk_tokens"),
        (F.sum("chunk_len") - F.first("n_tok")).cast("long").alias("overlap_tokens"),
        F.min("chunk_len").cast("long").alias("min_chunk_len"),
    )


@register(
    "text_term_burstiness",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents),
    tc AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    top AS (SELECT w, CAST(SUM(c) AS BIGINT) AS total
            FROM tc GROUP BY 1 ORDER BY total DESC, w LIMIT 20),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    m AS (SELECT top.w, top.total,
                 CAST(count(*) AS BIGINT) AS n_docs_with,
                 CAST(SUM(tc.c * tc.c) AS BIGINT) AS sxx
          FROM top JOIN tc ON tc.w = top.w
          GROUP BY 1, 2)
    SELECT m.w AS term, m.total, m.n_docs_with,
           (CAST(m.sxx AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)
            - (CAST(m.total AS DOUBLE) / CAST(nd.n_docs AS DOUBLE))
              * (CAST(m.total AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)))
           / (CAST(m.total AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)) AS vmr
    FROM m CROSS JOIN nd
    """,
)
def text_term_burstiness(spark, sf_dir):
    """Term burstiness (variance-to-mean ratio of per-document counts,
    zeros included) for the 20 highest-frequency tokens: VMR ≈ 1 ⇒
    Poisson scatter (function words), VMR ≫ 1 ⇒ bursty topical terms
    (Church & Gale, 1995) — the signal that separates stopword
    candidates from content words better than raw frequency.  The
    top-k pick is orderBy().limit() (distributed TakeOrdered, no
    global window); moments are exact integers; docs without the term
    enter through the closed form (they add 0 to both sums)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.transform(text.tokens("text"), F.lower)).alias("w")
    )
    tc = tok.groupBy("w", "doc_id").agg(F.count("*").cast("long").alias("c"))
    top = (
        tc.groupBy("w")
        .agg(F.sum("c").cast("long").alias("total"))
        .orderBy(F.desc("total"), "w")
        .limit(20)
    )
    nd = docs.agg(F.count("*").cast("long").alias("n_docs"))
    m = top.join(tc, "w").groupBy("w", "total").agg(
        F.count("*").cast("long").alias("n_docs_with"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sxx"),
    )
    mean = F.col("total").cast("double") / F.col("n_docs").cast("double")
    ex2 = F.col("sxx").cast("double") / F.col("n_docs").cast("double")
    return m.crossJoin(nd).select(
        F.col("w").alias("term"), "total", "n_docs_with",
        ((ex2 - mean * mean) / mean).alias("vmr"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch E: graph/embedding/layout/ops/ML kernels.
# ---------------------------------------------------------------------------


@register(
    "graph_lcc",
    f"""
    {_minhash_pairs_cte()},
    e AS (SELECT id1 AS src, id2 AS dst FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
    deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS degree
            FROM e GROUP BY 1),
    tri AS (SELECT e1.id1 AS a, e1.id2 AS b, e2.id2 AS c
            FROM pairs e1
            JOIN pairs e2 ON e2.id1 = e1.id2
            JOIN pairs e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2),
    tv AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
             SELECT a AS v FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri) t
           GROUP BY 1)
    SELECT deg.v AS doc_id, deg.degree,
           CAST(coalesce(tv.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN CAST(2 * coalesce(tv.n_tri, 0) AS DOUBLE)
                     / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
                ELSE 0.0 END AS lcc
    FROM deg LEFT JOIN tv ON tv.v = deg.v
    """,
)
def graph_lcc(spark, sf_dir):
    """Local clustering coefficient per vertex of the near-dup graph:
    lcc(v) = 2·T(v)/(deg(v)(deg(v)−1)) (Watts & Strogatz, Nature
    1998) — true dup clusters are cliques (lcc ≈ 1), banding
    false-positive chains sit near 0, so the LCC histogram is the
    graph-level precision gauge.  One oriented triangle enumeration
    (each triangle counted once, credited to its 3 vertices), one
    degree aggregate, a vertex-grain left join."""
    pairs = ldedup.minhash_lsh_pairs(
        _docs_with_dupes(spark, sf_dir),
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        min_parallelism=local_fanout(spark),
    ).persist()
    e = pairs.select(F.col("id1").alias("v")).unionAll(
        pairs.select(F.col("id2").alias("v"))
    )
    deg = e.groupBy("v").agg(F.count("*").cast("long").alias("degree"))
    e1 = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    e2 = pairs.select(F.col("id1").alias("b"), F.col("id2").alias("c"))
    e3 = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
    tv = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )
    nt = F.coalesce("n_tri", F.lit(0)).cast("long")
    return deg.join(tv, "v", "left").select(
        F.col("v").alias("doc_id"),
        "degree",
        nt.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            (2 * nt).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )


@register(
    "emb_quantile_clip",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    d AS (SELECT CAST(i.i AS INTEGER) AS dim, v[i.i] AS val
          FROM e, unnest(range(1, len(v) + 1)) i(i)),
    st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(val * 10000) AS BIGINT)) AS BIGINT) AS s1,
                  CAST(SUM(CAST(floor(val * 10000) AS BIGINT)
                           * CAST(floor(val * 10000) AS BIGINT)) AS BIGINT)
                    AS s2
           FROM d GROUP BY 1),
    b AS (SELECT dim, n,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0 AS mean,
                 sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / CAST(n AS DOUBLE) / 10000.0 AS std
          FROM st)
    SELECT b.dim, b.n, b.mean, b.std,
           b.mean - 2.0 * b.std AS clip_lo,
           b.mean + 2.0 * b.std AS clip_hi,
           CAST(SUM(CASE WHEN d.val < b.mean - 2.0 * b.std THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           CAST(SUM(CASE WHEN d.val > b.mean + 2.0 * b.std THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above
    FROM d JOIN b ON b.dim = d.dim
    GROUP BY 1, 2, 3, 4
    """,
)
def emb_quantile_clip(spark, sf_dir):
    """Per-dimension 2σ clipping plan for the embedding column: mean
    and σ from exact floor-scaled integer moments, the clip interval
    [μ−2σ, μ+2σ], and how many values each side would clip — the
    outlier-robust normalization pass run before int8 quantization
    (emb_int8_quantize) so a single rogue dimension doesn't consume
    the quantizer's range.  Two passes over the exploded (dim, value)
    stream: a 64-group moment aggregate, then a count-vs-bounds join
    back — both map-side-combining, no window."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    ).select((F.col("pos") + 1).cast("int").alias("dim"), "val")
    x = F.floor(F.col("val") * 10000).cast("long")
    st = d.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("long").alias("s1"),
        F.sum(x * x).cast("long").alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd / 10000.0
    std = (
        F.sqrt(
            nd * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / nd
        / 10000.0
    )
    b = st.select("dim", "n", mean.alias("mean"), std.alias("std"))
    lo = F.col("mean") - 2.0 * F.col("std")
    hi = F.col("mean") + 2.0 * F.col("std")
    return (
        d.join(b, "dim")
        .groupBy("dim", "n", "mean", "std")
        .agg(
            F.sum(F.when(F.col("val") < lo, 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("val") > hi, 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
        .select(
            "dim", "n", "mean", "std",
            lo.alias("clip_lo"), hi.alias("clip_hi"),
            "n_below", "n_above",
        )
    )


@register(
    "layout_range_partition_plan",
    """
    WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x
               FROM orders),
    st AS (SELECT CAST(min(x) AS BIGINT) AS mn, CAST(max(x) AS BIGINT) AS mx,
                  CAST(count(*) AS BIGINT) AS n
           FROM v),
    h AS (SELECT CAST(floor(CAST((v.x - st.mn) * 128 AS DOUBLE)
                            / CAST(st.mx - st.mn + 1 AS DOUBLE)) AS BIGINT)
                   AS bucket,
                 CAST(count(*) AS BIGINT) AS bn
          FROM v CROSS JOIN st GROUP BY 1),
    cc AS (SELECT bucket, bn,
                  CAST(SUM(bn) OVER (ORDER BY bucket) AS BIGINT) AS cum
           FROM h),
    t AS (SELECT k.range AS k, st.n, st.mn, st.mx,
                 CAST(floor(CAST(k.range * st.n AS DOUBLE) / 32.0) AS BIGINT)
                   AS thr
          FROM st CROSS JOIN range(1, 32) k)
    SELECT CAST(t.k AS BIGINT) AS part, t.thr AS target_rows,
           CAST(arg_min(cc.bucket, cc.bucket) AS BIGINT) AS boundary_bucket,
           CAST(t.mn AS DOUBLE) / 100.0
             + CAST((arg_min(cc.bucket, cc.bucket) + 1)
                    * (t.mx - t.mn + 1) AS DOUBLE) / 128.0 / 100.0
             AS boundary_value,
           CAST(arg_min(cc.cum, cc.bucket) AS BIGINT) AS rows_below
    FROM t JOIN cc ON cc.cum >= t.thr
    GROUP BY t.k, t.thr, t.mn, t.mx
    """,
)
def layout_range_partition_plan(spark, sf_dir):
    """Balanced range-partition boundary planning from a 128-bin
    histogram — the sampling step `repartitionByRange` runs before
    any global sort, made explicit and auditable: 31 boundary values
    splitting the sort key into 32 near-equal partitions, each with
    its achieved cumulative row count (skew shows up as rows_below
    deviating from target_rows).  One scan builds the histogram; the
    cumulative window runs over the FIXED 128-row bucket table (the
    one allowlisted global-sort shape); boundaries come from a 31×128
    bounded join.  This is the planner a 100 TB sort consults so no
    partition exceeds executor memory."""
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    st = v.agg(
        F.min("x").cast("long").alias("mn"),
        F.max("x").cast("long").alias("mx"),
        F.count("*").cast("long").alias("n"),
    )
    h = (
        v.crossJoin(st)
        .select(
            F.floor(
                ((F.col("x") - F.col("mn")) * 128).cast("double")
                / (F.col("mx") - F.col("mn") + 1).cast("double")
            )
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("bn"))
    )
    cc = h.select(
        "bucket", "bn",
        F.sum("bn").over(Window.orderBy("bucket")).cast("long").alias("cum"),
    )
    t = st.select(
        "n", "mn", "mx",
        F.explode(F.sequence(F.lit(1), F.lit(31))).alias("k"),
    ).select(
        "k", "n", "mn", "mx",
        F.floor((F.col("k") * F.col("n")).cast("double") / 32.0)
        .cast("long")
        .alias("thr"),
    )
    j = t.join(cc, F.col("cum") >= F.col("thr"))
    return j.groupBy(
        F.col("k").cast("long").alias("part"),
        F.col("thr").alias("target_rows"),
        "mn", "mx",
    ).agg(
        F.min_by("bucket", "bucket").cast("long").alias("boundary_bucket"),
        (
            F.col("mn").cast("double") / 100.0
            + (
                (F.min_by("bucket", "bucket") + 1)
                * (F.col("mx") - F.col("mn") + 1)
            ).cast("double")
            / 128.0
            / 100.0
        ).alias("boundary_value"),
        F.min_by("cum", "bucket").cast("long").alias("rows_below"),
    ).select(
        "part", "target_rows", "boundary_bucket", "boundary_value", "rows_below"
    )


@register(
    "ops_slo_burn_rate",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n_total,
                      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_err
               FROM events GROUP BY 1),
    w AS (SELECT day, n_total, n_err,
                 CAST(SUM(n_total) OVER w7 AS BIGINT) AS t7,
                 CAST(SUM(n_err) OVER w7 AS BIGINT) AS e7
          FROM d
          WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, n_total, n_err,
           CAST(n_err AS DOUBLE) / CAST(n_total AS DOUBLE) / 0.01 AS burn_1d,
           CAST(e7 AS DOUBLE) / CAST(t7 AS DOUBLE) / 0.01 AS burn_7d,
           CAST(CASE WHEN CAST(n_err AS DOUBLE) / CAST(n_total AS DOUBLE) / 0.01
                          > 1.0 THEN 1 ELSE 0 END AS BIGINT) AS fast_burn,
           CAST(CASE WHEN CAST(e7 AS DOUBLE) / CAST(t7 AS DOUBLE) / 0.01
                          > 1.0 THEN 1 ELSE 0 END AS BIGINT) AS slow_burn
    FROM w
    """,
)
def ops_slo_burn_rate(spark, sf_dir):
    """SLO error-budget burn rate (the SRE multiwindow alert): with a
    99% success objective, burn = error_rate / 0.01; burn > 1 on the
    1-day window is the fast-burn page, burn > 1 on the trailing
    7-day window the slow-burn ticket (Google SRE workbook, ch. 5).
    Events collapse to the bounded day grain first, so the 7-day
    rolling sums are exact integers over a calendar-bounded window —
    the day-grain global order is the allowlisted bounded shape."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )
    w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    w = d.select(
        "day", "n_total", "n_err",
        F.sum("n_total").over(w7).cast("long").alias("t7"),
        F.sum("n_err").over(w7).cast("long").alias("e7"),
    )
    b1 = F.col("n_err").cast("double") / F.col("n_total").cast("double") / 0.01
    b7 = F.col("e7").cast("double") / F.col("t7").cast("double") / 0.01
    return w.select(
        "day", "n_total", "n_err",
        b1.alias("burn_1d"),
        b7.alias("burn_7d"),
        F.when(b1 > 1.0, 1).otherwise(0).cast("long").alias("fast_burn"),
        F.when(b7 > 1.0, 1).otherwise(0).cast("long").alias("slow_burn"),
    )


@register(
    "ml_ridge_closed_form",
    """
    WITH f AS (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS x1,
             CAST(floor(c.c_acctbal) AS BIGINT) AS x2,
             CAST(floor(CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                             AS DOUBLE) / 100000.0) AS BIGINT) AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x1) AS BIGINT) AS sx1,
                 CAST(SUM(x2) AS BIGINT) AS sx2,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x1 * x1) AS BIGINT) AS sx11,
                 CAST(SUM(x1 * x2) AS BIGINT) AS sx12,
                 CAST(SUM(x2 * x2) AS BIGINT) AS sx22,
                 CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
                 CAST(SUM(x2 * y) AS BIGINT) AS sx2y
          FROM f),
    a AS (SELECT lam.lam, n,
                 CAST(n AS DOUBLE) * CAST(sx11 AS DOUBLE)
                   - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
                   + lam.lam AS a11,
                 CAST(n AS DOUBLE) * CAST(sx12 AS DOUBLE)
                   - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE) AS a12,
                 CAST(n AS DOUBLE) * CAST(sx22 AS DOUBLE)
                   - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                   + lam.lam AS a22,
                 CAST(n AS DOUBLE) * CAST(sx1y AS DOUBLE)
                   - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1,
                 CAST(n AS DOUBLE) * CAST(sx2y AS DOUBLE)
                   - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2,
                 CAST(sx1 AS DOUBLE) AS sx1d, CAST(sx2 AS DOUBLE) AS sx2d,
                 CAST(sy AS DOUBLE) AS syd
          FROM m CROSS JOIN (SELECT CAST(unnest([0.0, 1000000.0, 1000000000.0])
                                         AS DOUBLE) AS lam) lam)
    SELECT lam, n,
           (a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12) AS beta1,
           (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) AS beta2,
           (syd
            - (a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12) * sx1d
            - (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) * sx2d)
           / CAST(n AS DOUBLE) AS beta0
    FROM a
    """,
)
def ml_ridge_closed_form(spark, sf_dir):
    """Ridge regression shrinkage path in closed form: the
    a_ols_two_feature normal equations with λ added to the centered
    Gram diagonal, solved for λ ∈ {0, 10⁶, 10⁹} (λ = 0 reproduces
    OLS; the scale matches the n²-scaled centered moments).  The
    sufficient statistics are computed ONCE — the λ sweep is a 3-row
    literal explode over the 1-row moment table, which is exactly why
    closed-form ridge is free at 100 TB: one aggregate, any number of
    regularization candidates."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.count("o_orderkey").cast("long").alias("x1"),
            F.floor(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100000.0
            )
            .cast("long")
            .alias("y"),
        )
        .select("x1", "y", F.floor(F.col("c_acctbal")).cast("long").alias("x2"))
    )
    m = f.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("sx2y"),
    )
    lam = m.select(
        "*",
        F.explode(
            F.array(F.lit(0.0), F.lit(1000000.0), F.lit(1000000000.0))
        ).alias("lam"),
    )
    nd = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11 = nd * d("sx11") - d("sx1") * d("sx1") + F.col("lam")
    a12 = nd * d("sx12") - d("sx1") * d("sx2")
    a22 = nd * d("sx22") - d("sx2") * d("sx2") + F.col("lam")
    c1 = nd * d("sx1y") - d("sx1") * d("sy")
    c2 = nd * d("sx2y") - d("sx2") * d("sy")
    det = a11 * a22 - a12 * a12
    b1 = (a22 * c1 - a12 * c2) / det
    b2 = (a11 * c2 - a12 * c1) / det
    return lam.select(
        "lam", "n",
        b1.alias("beta1"),
        b2.alias("beta2"),
        ((d("sy") - b1 * d("sx1") - b2 * d("sx2")) / nd).alias("beta0"),
    )


@register(
    "w_seasonal_decompose",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS x
               FROM events GROUP BY 1, 2),
    tr AS (SELECT event_type, day, x,
                  CAST(SUM(x) OVER w AS BIGINT) AS s7,
                  CAST(count(*) OVER w AS BIGINT) AS nw
           FROM d
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (SELECT event_type, day, x,
                   CAST(s7 AS DOUBLE) / 7.0 AS trend,
                   CAST(floor((CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
                              * 100.0) AS BIGINT) AS di
            FROM tr WHERE nw = 7),
    se AS (SELECT event_type, CAST(dayofweek(day) AS BIGINT) AS dow,
                  CAST(SUM(di) AS BIGINT) AS sdi,
                  CAST(count(*) AS BIGINT) AS ndi
           FROM det GROUP BY 1, 2)
    SELECT det.event_type, det.day,
           CAST(det.x AS DOUBLE) / 100.0 AS actual,
           det.trend / 100.0 AS trend,
           CAST(se.sdi AS DOUBLE) / CAST(se.ndi AS DOUBLE) / 100.0 / 100.0
             AS seasonal,
           (CAST(det.x AS DOUBLE) - det.trend) / 100.0
             - CAST(se.sdi AS DOUBLE) / CAST(se.ndi AS DOUBLE) / 100.0 / 100.0
             AS residual
    FROM det JOIN se ON se.event_type = det.event_type
                    AND se.dow = CAST(dayofweek(det.day) AS BIGINT)
    """,
)
def w_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of each stream's daily total
    (the classical-decomposition half of STL): trend = centered 7-day
    moving average, seasonal = day-of-week mean of the detrended
    series, residual = the rest.  The detrended values are
    floor-scaled to int64 BEFORE the day-of-week mean (cross-day
    reduction stays order-independent); the moving average is a
    partitioned integer window sum over the bounded day grain; the
    seasonal join is 7 rows per series."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    tr = d.select(
        "event_type", "day", "x",
        F.sum("x").over(w7).cast("long").alias("s7"),
        F.count("*").over(w7).cast("long").alias("nw"),
    )
    trend = F.col("s7").cast("double") / 7.0
    det = tr.filter(F.col("nw") == 7).select(
        "event_type", "day", "x",
        trend.alias("trend"),
        F.floor((F.col("x").cast("double") - trend) * 100.0)
        .cast("long")
        .alias("di"),
    )
    se = det.groupBy(
        "event_type", F.dayofweek("day").cast("long").alias("dow")
    ).agg(
        F.sum("di").cast("long").alias("sdi"),
        F.count("*").cast("long").alias("ndi"),
    )
    dta, sea = det.alias("dt"), se.alias("se")
    seas_q = (
        F.col("se.sdi").cast("double")
        / F.col("se.ndi").cast("double")
        / 100.0
        / 100.0
    )
    return (
        dta.join(
            sea,
            (F.col("se.event_type") == F.col("dt.event_type"))
            & (F.col("se.dow") == F.dayofweek(F.col("dt.day")).cast("long")),
        )
        .select(
            F.col("dt.event_type").alias("event_type"),
            F.col("dt.day").alias("day"),
            (F.col("dt.x").cast("double") / 100.0).alias("actual"),
            (F.col("dt.trend") / 100.0).alias("trend"),
            seas_q.alias("seasonal"),
            (
                (F.col("dt.x").cast("double") - F.col("dt.trend")) / 100.0
                - seas_q
            ).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch F: segmentation, experiment design,
# drawdown structure, market profile, sketch merge law, source
# similarity, capacity forecasting.
# ---------------------------------------------------------------------------


@register(
    "a_rfm_segmentation",
    """
    WITH f AS (SELECT o_custkey,
                      CAST(count(*) AS BIGINT) AS frequency,
                      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS monetary_c,
                      CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS last_day
               FROM orders GROUP BY 1),
    an AS (SELECT CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS anchor
           FROM orders),
    r AS (SELECT f.o_custkey, f.frequency, f.monetary_c,
                 CAST(datediff('day', f.last_day, an.anchor) AS BIGINT)
                   AS recency_days
          FROM f CROSS JOIN an),
    q AS (SELECT o_custkey, recency_days, frequency, monetary_c,
                 CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                      AS BIGINT) AS r_quint,
                 CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
                      AS BIGINT) AS f_quint,
                 CAST(ntile(5) OVER (ORDER BY monetary_c, o_custkey)
                      AS BIGINT) AS m_quint
          FROM r)
    SELECT o_custkey, recency_days, frequency, monetary_c,
           r_quint, f_quint, m_quint,
           CAST(100 * r_quint + 10 * f_quint + m_quint AS BIGINT) AS rfm_code
    FROM q
    """,
)
def a_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation (Hughes, 1994): recency / frequency /
    monetary quintile scores and the composite RFM code — the
    workhorse marketing segmentation.  Each quintile is a DISTRIBUTED
    ntile: monotone_range_bucket splits the measure into 64 range
    buckets, bucketed_running produces the global rank without a
    single-partition sort, ntile_from_rank reconstructs the
    SQL-standard tile assignment — the round-7 scale-safe rank recipe
    applied three times over the unbounded customer dimension
    (recency ranks DESCENDING so quintile 5 = most recent, matching
    the convention)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("monetary_c"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
    )
    an = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor"))
    r = f.crossJoin(an).select(
        "o_custkey", "frequency", "monetary_c",
        F.datediff(F.col("anchor"), F.col("last_day")).cast("long").alias(
            "recency_days"
        ),
    )
    # persist the customer-grain feature frame: the three quintile
    # passes each reference it 3× (bucket stats, offsets, rank join),
    # so an unpersisted lineage re-scans the orders fact ~10× — the
    # cache turns that into ONE fact scan + nine cheap dimension reads
    r = r.crossJoin(r.agg(F.count("*").cast("long").alias("__n"))).persist()

    def quint(df, measure, asc, out):
        ranked = ow.bucketed_running(
            ow.monotone_range_bucket(df, measure, ascending=asc),
            [F.col(measure) if asc else F.col(measure).desc(), "o_custkey"],
            rn_col="__rn",
        )
        # r13 optimization (guide §3.3/§5): each pass references its
        # input 3× (range stats, bucket counts, rank join-back), so
        # chaining three passes on raw lineage re-nested the upstream
        # subtree per reference — the executed plan reached 463
        # Exchanges and re-ran pass 1 up to 9×.  localCheckpoint per
        # pass (|customers|-row state) keeps the consumer plan flat.
        return (
            ranked.withColumn(
                out, ow.ntile_from_rank(F.col("__rn"), F.col("__n"), 5)
            )
            .drop("__rn")
            .transform(cut_lineage)
        )

    q = quint(r, "recency_days", False, "r_quint")
    q = quint(q, "frequency", True, "f_quint")
    q = quint(q, "monetary_c", True, "m_quint").drop("__n")
    return q.select(
        "o_custkey", "recency_days", "frequency", "monetary_c",
        F.col("r_quint").cast("long").alias("r_quint"),
        F.col("f_quint").cast("long").alias("f_quint"),
        F.col("m_quint").cast("long").alias("m_quint"),
        (100 * F.col("r_quint") + 10 * F.col("f_quint") + F.col("m_quint"))
        .cast("long")
        .alias("rfm_code"),
    )


@register(
    "a_power_analysis",
    """
    WITH u AS (SELECT event_type,
                      CAST(count(*) AS BIGINT) AS n_events,
                      CAST(count(DISTINCT (user_id, CAST(ts AS DATE)))
                           AS BIGINT) AS n_users
               FROM events GROUP BY 1),
    t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                   * CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_all
          FROM events),
    p AS (SELECT u.event_type, u.n_events, u.n_users,
                 CAST(u.n_users AS DOUBLE) / CAST(t.n_all AS DOUBLE) AS p1
          FROM u CROSS JOIN t)
    SELECT event_type, n_events, n_users, p1,
           p1 * 1.1 AS p2,
           (1.959963984540054
              * sqrt(2.0 * ((p1 + p1 * 1.1) / 2.0)
                     * (1.0 - (p1 + p1 * 1.1) / 2.0))
            + 0.8416212335729143
              * sqrt(p1 * (1.0 - p1) + p1 * 1.1 * (1.0 - p1 * 1.1)))
           * (1.959963984540054
              * sqrt(2.0 * ((p1 + p1 * 1.1) / 2.0)
                     * (1.0 - (p1 + p1 * 1.1) / 2.0))
            + 0.8416212335729143
              * sqrt(p1 * (1.0 - p1) + p1 * 1.1 * (1.0 - p1 * 1.1)))
           / ((p1 * 1.1 - p1) * (p1 * 1.1 - p1)) AS n_per_arm
    FROM p WHERE p1 > 0.0 AND p1 * 1.1 < 1.0
    """,
)
def a_power_analysis(spark, sf_dir):
    """A/B sample-size planning per stream: users needed PER ARM to
    detect a 10% relative lift in the stream's user-day reach
    proportion at α = 0.05 (two-sided), power = 0.80 — the two-proportion z
    formula n = (z_{α/2}√(2p̄q̄) + z_β√(p₁q₁+p₂q₂))²/Δ² every
    experimentation platform runs before launch.  The z constants are
    IDENTICAL literals on both sides (no inverse-normal at runtime);
    the proportion comes from exact distinct counts; the rest is one
    shared expression chain."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    u = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct(F.col("user_id"), day).cast("long").alias("n_users"),
    )
    t = ev.agg(
        (
            F.countDistinct("user_id") * F.countDistinct(day)
        )
        .cast("long")
        .alias("n_all")
    )
    p1 = F.col("n_users").cast("double") / F.col("n_all").cast("double")
    p = u.crossJoin(t).select(
        "event_type", "n_events", "n_users", p1.alias("p1")
    )
    za, zb = 1.959963984540054, 0.8416212335729143
    p1c = F.col("p1")
    p2 = p1c * 1.1
    pbar = (p1c + p2) / 2.0
    s = za * F.sqrt(2.0 * pbar * (1.0 - pbar)) + zb * F.sqrt(
        p1c * (1.0 - p1c) + p2 * (1.0 - p2)
    )
    return p.filter((p1c > 0.0) & (p2 < 1.0)).select(
        "event_type", "n_events", "n_users", "p1",
        p2.alias("p2"),
        (s * s / ((p2 - p1c) * (p2 - p1c))).alias("n_per_arm"),
    )


@register(
    "w_underwater_duration",
    f"""
    WITH {_SQL_BARS},
    c AS (SELECT event_type, day, p,
                 CAST(max(p) OVER (PARTITION BY event_type ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS peak,
                 CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                      AS BIGINT) AS rn
          FROM bars),
    uw AS (SELECT event_type, day, rn,
                  rn - CAST(row_number() OVER (PARTITION BY event_type
                                               ORDER BY day) AS BIGINT) AS isl
           FROM c WHERE p < peak),
    ep AS (SELECT event_type, isl, CAST(count(*) AS BIGINT) AS dur,
                  CAST(min(day) AS DATE) AS start_day
           FROM uw GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_episodes,
           CAST(max(dur) AS BIGINT) AS max_underwater_days,
           CAST(SUM(dur) AS BIGINT) AS total_underwater_days,
           CAST(min(start_day) AS DATE) AS first_drawdown_start
    FROM ep GROUP BY 1
    """,
)
def w_underwater_duration(spark, sf_dir):
    """Drawdown episode structure per series: running-peak underwater
    flags grouped into episodes by the gaps-and-islands rank trick
    (rn − rn_within_flagged is constant inside each contiguous run),
    then episode count / longest / total underwater days — TIME under
    water, the recovery-focused complement to w_max_drawdown's depth.
    Two partitioned windows over the bounded day grain and one
    aggregate; no joins."""
    bars = _bars(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("day")
    c = bars.select(
        "event_type", "day", "p",
        F.max("p")
        .over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("peak"),
        F.row_number().over(wl).cast("long").alias("rn"),
    )
    uw = c.filter(F.col("p") < F.col("peak")).select(
        "event_type", "day", "rn",
        (F.col("rn") - F.row_number().over(wl).cast("long")).alias("isl"),
    )
    ep = uw.groupBy("event_type", "isl").agg(
        F.count("*").cast("long").alias("dur"),
        F.min("day").alias("start_day"),
    )
    return ep.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_episodes"),
        F.max("dur").cast("long").alias("max_underwater_days"),
        F.sum("dur").cast("long").alias("total_underwater_days"),
        F.min("start_day").alias("first_drawdown_start"),
    )


@register(
    "w_volume_profile",
    f"""
    WITH {_SQL_BARS},
    t AS (SELECT event_type, {_SQL_CL} AS cl, vol FROM bars),
    st AS (SELECT event_type, CAST(min(cl) AS BIGINT) AS mn,
                  CAST(max(cl) AS BIGINT) AS mx
           FROM t GROUP BY 1),
    b AS (SELECT t.event_type,
                 CAST(floor(CAST((t.cl - st.mn) * 20 AS DOUBLE)
                            / CAST(st.mx - st.mn + 1 AS DOUBLE)) AS BIGINT)
                   AS bucket,
                 st.mn, st.mx, t.vol
          FROM t JOIN st ON st.event_type = t.event_type),
    v AS (SELECT event_type, bucket, mn, mx,
                 CAST(SUM(vol) AS BIGINT) AS volume,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM b GROUP BY 1, 2, 3, 4),
    m AS (SELECT event_type, CAST(max(volume * 1000 + bucket) AS BIGINT) AS enc
          FROM v GROUP BY 1)
    SELECT v.event_type, v.bucket,
           CAST(v.mn AS DOUBLE) / 100.0
             + CAST(v.bucket * (v.mx - v.mn + 1) AS DOUBLE) / 20.0 / 100.0
             AS price_lo,
           CAST(v.mn AS DOUBLE) / 100.0
             + CAST((v.bucket + 1) * (v.mx - v.mn + 1) AS DOUBLE) / 20.0 / 100.0
             AS price_hi,
           v.volume, v.n_days,
           CAST(CASE WHEN v.volume * 1000 + v.bucket = m.enc
                     THEN 1 ELSE 0 END AS BIGINT) AS is_poc
    FROM v JOIN m ON m.event_type = v.event_type
    """,
)
def w_volume_profile(spark, sf_dir):
    """Volume profile / market profile per series: activity volume
    binned by PRICE LEVEL (20 range buckets of the daily close proxy)
    with the point of control (the highest-volume bucket) flagged —
    where a market spent its time, not when (Steidlmayer's market
    profile).  The POC argmax is integer-encoded (volume·1000 +
    bucket: ties resolve to the higher bucket identically on both
    engines); buckets come from per-series min/max stats, one
    aggregate each."""
    bars = _bars(spark, sf_dir)
    t = bars.select("event_type", _cl_col().alias("cl"), "vol")
    st = t.groupBy("event_type").agg(
        F.min("cl").cast("long").alias("mn"),
        F.max("cl").cast("long").alias("mx"),
    )
    b = t.join(st, "event_type").select(
        "event_type",
        F.floor(
            ((F.col("cl") - F.col("mn")) * 20).cast("double")
            / (F.col("mx") - F.col("mn") + 1).cast("double")
        )
        .cast("long")
        .alias("bucket"),
        "mn", "mx", "vol",
    )
    v = b.groupBy("event_type", "bucket", "mn", "mx").agg(
        F.sum("vol").cast("long").alias("volume"),
        F.count("*").cast("long").alias("n_days"),
    )
    m = v.groupBy("event_type").agg(
        F.max(F.col("volume") * 1000 + F.col("bucket"))
        .cast("long")
        .alias("enc")
    )
    return v.join(m, "event_type").select(
        "event_type", "bucket",
        (
            F.col("mn").cast("double") / 100.0
            + (F.col("bucket") * (F.col("mx") - F.col("mn") + 1)).cast("double")
            / 20.0
            / 100.0
        ).alias("price_lo"),
        (
            F.col("mn").cast("double") / 100.0
            + ((F.col("bucket") + 1) * (F.col("mx") - F.col("mn") + 1)).cast(
                "double"
            )
            / 20.0
            / 100.0
        ).alias("price_hi"),
        "volume", "n_days",
        F.when(
            F.col("volume") * 1000 + F.col("bucket") == F.col("enc"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("is_poc"),
    )


@register(
    "sketch_tdigest_merge",
    """
    WITH v AS (SELECT event_type, event_id,
                      CAST(floor(value * 10000) AS BIGINT) AS x
               FROM events),
    st AS (SELECT event_type, CAST(min(x) AS BIGINT) AS mn,
                  CAST(max(x) AS BIGINT) AS mx
           FROM v GROUP BY 1),
    bk AS (SELECT v.event_type, v.event_id, v.x,
                  CAST(floor(CAST((v.x - st.mn) * 128 AS DOUBLE)
                             / CAST(st.mx - st.mn + 1 AS DOUBLE)) AS BIGINT)
                    AS bucket
           FROM v JOIN st ON st.event_type = v.event_type),
    full_c AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS bn,
                      CAST(SUM(x) AS BIGINT) AS bs
               FROM bk GROUP BY 1, 2),
    half AS (SELECT event_type, bucket, event_id % 2 AS h,
                    CAST(count(*) AS BIGINT) AS bn,
                    CAST(SUM(x) AS BIGINT) AS bs
             FROM bk GROUP BY 1, 2, 3),
    merged AS (SELECT event_type, bucket, CAST(SUM(bn) AS BIGINT) AS bn,
                      CAST(SUM(bs) AS BIGINT) AS bs
               FROM half GROUP BY 1, 2)
    SELECT f.event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN f.bn = m.bn AND f.bs = m.bs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_equal,
           CAST(max(abs(f.bn - m.bn)) AS BIGINT) AS max_count_diff
    FROM full_c f JOIN merged m ON m.event_type = f.event_type
                              AND m.bucket = f.bucket
    GROUP BY 1
    """,
)
def sketch_tdigest_merge(spark, sf_dir):
    """Merge law for the fixed-scale quantile sketch
    (sketch_tdigest_quantiles): centroids built independently on two
    disjoint halves (event_id parity) and merged by plain per-bucket
    addition must equal the centroids built on the whole stream —
    EXACTLY, because the scale function (global min/max) is shared and
    (count, Σx) are associative.  The law is what makes the sketch a
    one-pass 100 TB rollup: per-partition states combine upward
    without re-reading data.  Same oracle style as sketch_hll_merge /
    sketch_cms_merge: n_equal == n_buckets is the proof."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("x"),
    )
    st = v.groupBy("event_type").agg(
        F.min("x").cast("long").alias("mn"),
        F.max("x").cast("long").alias("mx"),
    )
    bk = v.join(st, "event_type").select(
        "event_type", "event_id", "x",
        F.floor(
            ((F.col("x") - F.col("mn")) * 128).cast("double")
            / (F.col("mx") - F.col("mn") + 1).cast("double")
        )
        .cast("long")
        .alias("bucket"),
    )
    full_c = bk.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("bn"),
        F.sum("x").cast("long").alias("bs"),
    )
    half = bk.groupBy(
        "event_type", "bucket", (F.col("event_id") % 2).alias("h")
    ).agg(
        F.count("*").cast("long").alias("bn"),
        F.sum("x").cast("long").alias("bs"),
    )
    merged = half.groupBy("event_type", "bucket").agg(
        F.sum("bn").cast("long").alias("bn"),
        F.sum("bs").cast("long").alias("bs"),
    )
    fa, ma = full_c.alias("f"), merged.alias("m")
    return (
        fa.join(
            ma,
            (F.col("m.event_type") == F.col("f.event_type"))
            & (F.col("m.bucket") == F.col("f.bucket")),
        )
        .groupBy(F.col("f.event_type").alias("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(
                F.when(
                    (F.col("f.bn") == F.col("m.bn"))
                    & (F.col("f.bs") == F.col("m.bs")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_equal"),
            F.max(F.abs(F.col("f.bn") - F.col("m.bn")))
            .cast("long")
            .alias("max_count_diff"),
        )
    )


@register(
    "text_source_cosine",
    f"""
    WITH tok AS (SELECT source, unnest({_SQL_TOKS}) AS w FROM documents),
    vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS total
              FROM tok GROUP BY 1 ORDER BY total DESC, w LIMIT 200),
    tc AS (SELECT tok.source, tok.w, CAST(count(*) AS BIGINT) AS c
           FROM tok JOIN vocab ON vocab.w = tok.w
           GROUP BY 1, 2),
    nrm AS (SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2
            FROM tc GROUP BY 1),
    dot AS (SELECT a.source AS s1, b.source AS s2,
                   CAST(SUM(a.c * b.c) AS BIGINT) AS dp
            FROM tc a JOIN tc b ON b.w = a.w AND a.source < b.source
            GROUP BY 1, 2)
    SELECT dot.s1, dot.s2, dot.dp,
           CAST(dot.dp AS DOUBLE)
             / (sqrt(CAST(n1.n2 AS DOUBLE)) * sqrt(CAST(n2.n2 AS DOUBLE)))
             AS cosine
    FROM dot JOIN nrm n1 ON n1.source = dot.s1
    JOIN nrm n2 ON n2.source = dot.s2
    """,
)
def text_source_cosine(spark, sf_dir):
    """Pairwise source similarity as term-frequency cosine over the
    top-200 global vocabulary: the corpus-mixing diagnostic that says
    which sources are stylistic duplicates BEFORE paying for
    embedding-level dedup (high cosine → route to
    dedup_cross_source_matrix).  The vocab cap is a distributed
    top-k (orderBy().limit, no global window) and bounds the
    pairwise join at |vocab|·|sources|² regardless of corpus size;
    dot products and norms are exact integers, cosine one √·√
    division."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.transform(text.tokens("text"), F.lower)).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").cast("long").alias("total"))
        .orderBy(F.desc("total"), "w")
        .limit(200)
    )
    tc = (
        tok.join(vocab.select("w"), "w")
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    nrm = tc.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    a, b = tc.alias("a"), tc.alias("b")
    dot = (
        a.join(
            b,
            (F.col("b.w") == F.col("a.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dp"))
    )
    n1 = nrm.select(F.col("source").alias("s1"), F.col("n2").alias("n2a"))
    n2 = nrm.select(F.col("source").alias("s2"), F.col("n2").alias("n2b"))
    return dot.join(n1, "s1").join(n2, "s2").select(
        "s1", "s2", "dp",
        (
            F.col("dp").cast("double")
            / (
                F.sqrt(F.col("n2a").cast("double"))
                * F.sqrt(F.col("n2b").cast("double"))
            )
        ).alias("cosine"),
    )


@register(
    "ops_capacity_forecast",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    ix AS (SELECT event_type, n,
                  CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                       AS BIGINT) AS i
           FROM d),
    m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nn,
                 CAST(SUM(i) AS BIGINT) AS si,
                 CAST(SUM(n) AS BIGINT) AS sn,
                 CAST(SUM(i * i) AS BIGINT) AS sii,
                 CAST(SUM(i * n) AS BIGINT) AS sin_
          FROM ix GROUP BY 1),
    b AS (SELECT event_type, nn,
                 (CAST(nn AS DOUBLE) * CAST(sin_ AS DOUBLE)
                  - CAST(si AS DOUBLE) * CAST(sn AS DOUBLE))
                 / (CAST(nn AS DOUBLE) * CAST(sii AS DOUBLE)
                    - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)) AS slope,
                 (CAST(sn AS DOUBLE)
                  - (CAST(nn AS DOUBLE) * CAST(sin_ AS DOUBLE)
                     - CAST(si AS DOUBLE) * CAST(sn AS DOUBLE))
                    / (CAST(nn AS DOUBLE) * CAST(sii AS DOUBLE)
                       - CAST(si AS DOUBLE) * CAST(si AS DOUBLE))
                    * CAST(si AS DOUBLE))
                 / CAST(nn AS DOUBLE) AS intercept
          FROM m)
    SELECT b.event_type, CAST(h.range AS BIGINT) AS horizon_days,
           b.slope, b.intercept,
           b.intercept + b.slope * CAST(b.nn + h.range AS DOUBLE)
             AS forecast_events
    FROM b CROSS JOIN range(1, 8) h
    """,
)
def ops_capacity_forecast(spark, sf_dir):
    """Capacity forecast per stream: OLS trend of daily event volume
    against the day index (closed-form slope/intercept from exact
    integer moments), extrapolated 1–7 days ahead — the linear
    capacity-planning baseline every autoscaler / quota review starts
    from.  The day index is a partitioned row_number over the bounded
    calendar; the 7 horizons are a literal explode of the per-series
    1-row model, so the forecast costs nothing beyond the one
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    ix = d.select(
        "event_type", "n",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("i"),
    )
    m = ix.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nn"),
        F.sum("i").cast("long").alias("si"),
        F.sum("n").cast("long").alias("sn"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sii"),
        F.sum(F.col("i") * F.col("n")).cast("long").alias("sin_"),
    )
    nnd = F.col("nn").cast("double")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    # nullif: a single-observation window → Sxx 0 → NULL like DuckDB
    slope = (nnd * dd("sin_") - dd("si") * dd("sn")) / F.nullif(
        nnd * dd("sii") - dd("si") * dd("si"), F.lit(0.0)
    )
    intercept = (dd("sn") - slope * dd("si")) / nnd
    b = m.select(
        "event_type", "nn", slope.alias("slope"), intercept.alias("intercept")
    )
    h = b.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("horizon")
    )
    return h.select(
        "event_type",
        F.col("horizon").cast("long").alias("horizon_days"),
        "slope", "intercept",
        (
            F.col("intercept")
            + F.col("slope") * (F.col("nn") + F.col("horizon")).cast("double")
        ).alias("forecast_events"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch G: TextRank keywords, cohort LTV,
# MinHash-estimator accuracy audit, Lorenz curve, weekend effect.
# ---------------------------------------------------------------------------


def _textrank_oracle() -> str:
    from dicomdb_spark.operators.graph import pagerank_oracle_ctes

    ctes, final = pagerank_oracle_ctes("edges", iters=3, damping=0.85)
    return f"""
    WITH tk0 AS (SELECT {_SQL_TOKS} AS tk FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                                        i -> tk[i] || ' ' || tk[i + 1])) AS bg
           FROM tk0),
    tok AS (SELECT unnest(tk) AS w FROM tk0),
    vocab AS (SELECT w FROM (
      SELECT w, count(*) AS c, row_number() OVER (ORDER BY count(*) DESC, w)
               AS rn
      FROM tok GROUP BY 1) t WHERE rn <= 100),
    pe AS (SELECT DISTINCT split_part(bg, ' ', 1) AS a,
                  split_part(bg, ' ', 2) AS b
           FROM bg),
    und AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
            FROM pe
            WHERE a <> b
              AND a IN (SELECT w FROM vocab) AND b IN (SELECT w FROM vocab)),
    edges AS (SELECT lo AS src, hi AS dst FROM und
              UNION ALL SELECT hi AS src, lo AS dst FROM und),
    {ctes}
    SELECT node AS keyword, CAST(r AS DOUBLE) / 1000000000000.0 AS score,
           CAST(pos AS BIGINT) AS pos
    FROM (SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS pos
          FROM {final}) t
    WHERE pos <= 20
    """


@register("text_textrank_keywords", _textrank_oracle())
def text_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the word co-occurrence graph — undirected edges
    between ADJACENT tokens restricted to the top-100 vocabulary, 3
    damped iterations, top-20 words by stationary score.  Reuses the
    floor-scaled integer PageRank kernel (operators/graph.py) so all
    rounds are bit-replayable; the vocabulary cap is a distributed
    top-k, the graph is ≤100 nodes regardless of corpus size, and the
    final pos window runs on a LIMIT(20) result.  The
    graph-centrality complement to text_rake_keywords' degree
    heuristic."""
    from dicomdb_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.transform(text.tokens("text"), F.lower)).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(100)
        .select("w")
    )
    bg = docs.select(F.explode(text.shingles("text", 2)).alias("bg"))
    pe = bg.select(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("a"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("b"),
    ).distinct()
    va = vocab.select(F.col("w").alias("a"))
    vb = vocab.select(F.col("w").alias("b"))
    und = (
        pe.filter(F.col("a") != F.col("b"))
        .join(va, "a")
        .join(vb, "b")
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
    )
    edges = und.select(
        F.col("lo").alias("src"), F.col("hi").alias("dst")
    ).unionAll(und.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
    r = graph.pagerank(edges, iters=3, damping=0.85)
    w = Window.orderBy(F.col("r").desc(), F.col("node"))
    return (
        r.orderBy(F.col("r").desc(), F.col("node"))
        .limit(20)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(
            F.col("node").alias("keyword"),
            (F.col("r").cast("double") / 1e12).alias("score"),
            "pos",
        )
    )


@register(
    "a_cohort_ltv_curve",
    """
    WITH o AS (SELECT o_custkey,
                      CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                           AS BIGINT) AS mix,
                      CAST(floor(o_totalprice * 100) AS BIGINT) AS rev_c
               FROM orders),
    fc AS (SELECT o_custkey, CAST(min(mix) AS BIGINT) AS cohort_mix
           FROM o GROUP BY 1),
    cs AS (SELECT cohort_mix, CAST(count(*) AS BIGINT) AS cohort_size
           FROM fc GROUP BY 1),
    r AS (SELECT fc.cohort_mix, o.mix - fc.cohort_mix AS age_months,
                 CAST(SUM(o.rev_c) AS BIGINT) AS rev_c
          FROM o JOIN fc ON fc.o_custkey = o.o_custkey
          GROUP BY 1, 2),
    c AS (SELECT cohort_mix, age_months, rev_c,
                 CAST(SUM(rev_c) OVER (PARTITION BY cohort_mix
                                       ORDER BY age_months) AS BIGINT)
                   AS cum_rev_c
          FROM r)
    SELECT c.cohort_mix, CAST(c.age_months AS BIGINT) AS age_months,
           cs.cohort_size, c.cum_rev_c,
           CAST(c.cum_rev_c AS DOUBLE) / CAST(cs.cohort_size AS DOUBLE) / 100.0
             AS ltv_per_customer
    FROM c JOIN cs ON cs.cohort_mix = c.cohort_mix
    """,
)
def a_cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by
    first-purchase month, cumulative revenue per cohort tracked by
    account age — the revenue twin of a_cohort_retention's user
    counts, and the payback-period input every acquisition-spend
    decision reads.  Month index is exact integer arithmetic
    (y·12+m), the running LTV is a PARTITIONED cumsum over the
    bounded (cohort, age) grid, revenue stays integer cents until the
    final per-customer division."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("mix"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("rev_c"),
    )
    fc = o.groupBy("o_custkey").agg(F.min("mix").cast("long").alias("cohort_mix"))
    cs = fc.groupBy("cohort_mix").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    r = (
        o.join(fc, "o_custkey")
        .groupBy(
            "cohort_mix", (F.col("mix") - F.col("cohort_mix")).alias("age_months")
        )
        .agg(F.sum("rev_c").cast("long").alias("rev_c"))
    )
    c = r.select(
        "cohort_mix", "age_months", "rev_c",
        F.sum("rev_c")
        .over(Window.partitionBy("cohort_mix").orderBy("age_months"))
        .cast("long")
        .alias("cum_rev_c"),
    )
    return c.join(cs, "cohort_mix").select(
        "cohort_mix",
        F.col("age_months").cast("long").alias("age_months"),
        "cohort_size", "cum_rev_c",
        (
            F.col("cum_rev_c").cast("double")
            / F.col("cohort_size").cast("double")
            / 100.0
        ).alias("ltv_per_customer"),
    )


def _minhash_jaccard_est_oracle() -> str:
    agree = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(16)
    )
    return f"""
    {_minhash_pairs_cte()},
    ds AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY 1),
    inter AS (SELECT p.id1, p.id2, CAST(count(*) AS BIGINT) AS i
              FROM pairs p
              JOIN ds d1 ON d1.doc_id = p.id1
              JOIN ds d2 ON d2.doc_id = p.id2 AND d2.s = d1.s
              GROUP BY 1, 2)
    SELECT p.id1, p.id2,
           CAST({agree} AS BIGINT) AS n_agree,
           CAST({agree} AS DOUBLE) / 16.0 AS est_jaccard,
           CAST(coalesce(i.i, 0) AS DOUBLE)
             / CAST(s1.n + s2.n - coalesce(i.i, 0) AS DOUBLE) AS exact_jaccard
    FROM pairs p
    JOIN sig a ON a.doc_id = p.id1
    JOIN sig b ON b.doc_id = p.id2
    JOIN sz s1 ON s1.doc_id = p.id1
    JOIN sz s2 ON s2.doc_id = p.id2
    LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
    """


@register("dedup_minhash_jaccard_est", _minhash_jaccard_est_oracle())
def dedup_minhash_jaccard_est(spark, sf_dir):
    """MinHash estimator accuracy audit: for every LSH candidate pair,
    the signature-agreement Jaccard estimate (matching slots / 16 —
    the unbiased estimator MinHash exists to provide, Broder 1997)
    next to the EXACT shingle-set Jaccard.  The residual distribution
    is how you choose the signature width: est−exact spread ~
    1/√k.  Exact Jaccards are computed only for the bucket-bounded
    candidate list (never all pairs); the signature table is built
    once and reused for both banding and agreement."""
    docs = _docs_with_dupes(spark, sf_dir)
    sig = ldedup._track_cache(
        ldedup.minhash_signature_table(
            docs, "doc_id", "text", num_hashes=16,
            min_parallelism=local_fanout(spark),
        ).persist()
    )
    pairs = ldedup._track_cache(
        ldedup.lsh_pairs_from_signatures(sig, num_hashes=16, bands=4).persist()
    )
    # exact Jaccard per candidate, verified ROW-LOCALLY over per-doc
    # distinct-shingle arrays semi-reduced to pair members (the
    # er_threshold_sweep / dedup_bbit_minhash_audit idiom — see those
    # for the measured 5×-worse full-corpus-array negative result).
    # size ≥ 1 mirrors the old inner join on the exploded size table.
    pdocs = pairs.select(F.explode(F.array("id1", "id2")).alias("doc")).distinct()
    sets = ldedup._track_cache(
        docs.select(F.col("doc_id").alias("doc"), "text")
        .join(pdocs, "doc", "left_semi")
        .select("doc", F.array_distinct(text.shingles("text", 3)).alias("shs"))
        .filter(F.size("shs") >= 1)
        .persist()
    )
    sa = sig.select(
        F.col("doc").alias("id1"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(16)]
    )
    sb = sig.select(
        F.col("doc").alias("id2"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(16)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(16)
    )
    ii = F.size(F.array_intersect("__sa", "__sb")).cast("long")
    return (
        pairs.join(sa, "id1")
        .join(sb, "id2")
        .join(
            sets.select(F.col("doc").alias("id1"), F.col("shs").alias("__sa")),
            "id1",
        )
        .join(
            sets.select(F.col("doc").alias("id2"), F.col("shs").alias("__sb")),
            "id2",
        )
        .withColumn("n1", F.size("__sa").cast("long"))
        .withColumn("n2", F.size("__sb").cast("long"))
        .select(
            "id1", "id2",
            agree.cast("long").alias("n_agree"),
            (agree.cast("double") / 16.0).alias("est_jaccard"),
            (
                ii.cast("double")
                / (F.col("n1") + F.col("n2") - ii).cast("double")
            ).alias("exact_jaccard"),
        )
    )


@register(
    "a_lorenz_curve_points",
    """
    WITH s AS (SELECT o_custkey,
                      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS spend_c
               FROM orders GROUP BY 1),
    q AS (SELECT o_custkey, spend_c,
                 CAST(ntile(10) OVER (ORDER BY spend_c, o_custkey) AS BIGINT)
                   AS decile
          FROM s),
    d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(spend_c) AS BIGINT) AS spend_c
          FROM q GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(spend_c) AS BIGINT) AS ts FROM d),
    c AS (SELECT decile, n, spend_c,
                 CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cn,
                 CAST(SUM(spend_c) OVER (ORDER BY decile) AS BIGINT) AS cspend
          FROM d)
    SELECT c.decile,
           CAST(c.cn AS DOUBLE) / CAST(t.tn AS DOUBLE) AS cum_pop_share,
           CAST(c.cspend AS DOUBLE) / CAST(t.ts AS DOUBLE) AS cum_spend_share,
           CAST(c.cn AS DOUBLE) / CAST(t.tn AS DOUBLE)
             - CAST(c.cspend AS DOUBLE) / CAST(t.ts AS DOUBLE) AS lorenz_gap
    FROM c CROSS JOIN t
    """,
)
def a_lorenz_curve_points(spark, sf_dir):
    """Lorenz curve of customer spend at decile resolution: cumulative
    population share vs cumulative spend share, plus the gap (whose
    2× integral is the Gini a_gini_skew reports as a scalar) — the
    standard concentration VISUALIZATION, here as data points.  The
    decile assignment is the distributed ntile recipe (range-bucket
    rank over the unbounded customer dimension, no single-partition
    sort); the cumulative window then runs over the 10-row decile
    table — bounded by construction."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend_c")
    )
    # persist: the decile pass references the customer aggregate 3×
    s = s.crossJoin(s.agg(F.count("*").cast("long").alias("__n"))).persist()
    ranked = ow.bucketed_running(
        ow.monotone_range_bucket(s, "spend_c", ascending=True),
        ["spend_c", "o_custkey"],
        rn_col="__rn",
    )
    q = ranked.withColumn(
        "decile", ow.ntile_from_rank(F.col("__rn"), F.col("__n"), 10).cast("long")
    )
    d = q.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("spend_c").cast("long").alias("spend_c"),
    )
    t = d.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("spend_c").cast("long").alias("ts"),
    )
    c = d.select(
        "decile", "n", "spend_c",
        F.sum("n").over(Window.orderBy("decile")).cast("long").alias("cn"),
        F.sum("spend_c").over(Window.orderBy("decile")).cast("long").alias(
            "cspend"
        ),
    )
    pop = F.col("cn").cast("double") / F.col("tn").cast("double")
    sp = F.col("cspend").cast("double") / F.col("ts").cast("double")
    return c.crossJoin(t).select(
        "decile",
        pop.alias("cum_pop_share"),
        sp.alias("cum_spend_share"),
        (pop - sp).alias("lorenz_gap"),
    )


@register(
    "a_weekend_effect",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS x
               FROM events GROUP BY 1, 2),
    g AS (SELECT event_type,
                 CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END AS wknd,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s,
                 CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                     / 10000.0) AS BIGINT)) AS BIGINT) AS ssk
          FROM d GROUP BY 1, 2),
    p AS (SELECT w.event_type,
                 w.n AS n_wknd, e.n AS n_wkdy,
                 CAST(w.s AS DOUBLE) / CAST(w.n AS DOUBLE) / 100.0 AS mean_wknd,
                 CAST(e.s AS DOUBLE) / CAST(e.n AS DOUBLE) / 100.0 AS mean_wkdy,
                 greatest(CAST(w.n AS DOUBLE) * (CAST(w.ssk AS DOUBLE) * 10000.0)
                          - CAST(w.s AS DOUBLE) * CAST(w.s AS DOUBLE), 0.0)
                 / CAST(w.n AS DOUBLE) / CAST(w.n AS DOUBLE) AS var_wknd,
                 greatest(CAST(e.n AS DOUBLE) * (CAST(e.ssk AS DOUBLE) * 10000.0)
                          - CAST(e.s AS DOUBLE) * CAST(e.s AS DOUBLE), 0.0)
                 / CAST(e.n AS DOUBLE) / CAST(e.n AS DOUBLE) AS var_wkdy
          FROM (SELECT * FROM g WHERE wknd = 1) w
          JOIN (SELECT * FROM g WHERE wknd = 0) e
            ON e.event_type = w.event_type)
    SELECT event_type, n_wknd, n_wkdy, mean_wknd, mean_wkdy,
           mean_wknd / mean_wkdy AS weekend_lift,
           (mean_wknd - mean_wkdy)
             / sqrt(var_wknd / CAST(n_wknd AS DOUBLE) / 10000.0
                    + var_wkdy / CAST(n_wkdy AS DOUBLE) / 10000.0) AS t_stat
    FROM p
    """,
)
def a_weekend_effect(spark, sf_dir):
    """Weekend-vs-weekday effect per stream: mean daily total on
    weekend days vs weekdays, the lift ratio, and a Welch-style t
    statistic from exact integer moments — the day-of-week seasonality
    significance check behind staffing and campaign-timing calls.
    One day-grain aggregate, one 2-cell-per-stream split, one shared
    expression chain; the x² moment is floor-rescaled per day so the
    variance is order-independent."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    xd = F.col("x").cast("double")
    g = d.groupBy(
        "event_type",
        F.when(F.dayofweek("day").isin(1, 7), 1).otherwise(0).alias("wknd"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.floor(xd * xd / 10000.0).cast("long")).cast("long").alias("ssk"),
    )
    wk = g.filter(F.col("wknd") == 1).alias("w")
    wd = g.filter(F.col("wknd") == 0).alias("e")
    mw = F.col("w.s").cast("double") / F.col("w.n").cast("double") / 100.0
    me = F.col("e.s").cast("double") / F.col("e.n").cast("double") / 100.0
    # greatest-0 clamps: floor-scaling can push a constant side's
    # radicand fractionally negative — DuckDB sqrt(negative) ERRORS,
    # so both engines clamp identically (a_generalized_esd discipline)
    vw = F.greatest(
        F.col("w.n").cast("double") * (F.col("w.ssk").cast("double") * 10000.0)
        - F.col("w.s").cast("double") * F.col("w.s").cast("double"),
        F.lit(0.0),
    ) / F.col("w.n").cast("double") / F.col("w.n").cast("double")
    ve = F.greatest(
        F.col("e.n").cast("double") * (F.col("e.ssk").cast("double") * 10000.0)
        - F.col("e.s").cast("double") * F.col("e.s").cast("double"),
        F.lit(0.0),
    ) / F.col("e.n").cast("double") / F.col("e.n").cast("double")
    p = wk.join(wd, F.col("e.event_type") == F.col("w.event_type")).select(
        F.col("w.event_type").alias("event_type"),
        F.col("w.n").alias("n_wknd"),
        F.col("e.n").alias("n_wkdy"),
        mw.alias("mean_wknd"),
        me.alias("mean_wkdy"),
        # nullif: zero weekday mean / zero pooled variance → NULL like
        # DuckDB x/0, instead of an ANSI crash
        (mw / F.nullif(me, F.lit(0.0))).alias("weekend_lift"),
        (
            (mw - me)
            / F.nullif(F.sqrt(
                vw / F.col("w.n").cast("double") / 10000.0
                + ve / F.col("e.n").cast("double") / 10000.0
            ), F.lit(0.0))
        ).alias("t_stat"),
    )
    return p


# ---------------------------------------------------------------------------
# Round-7 continuation batch H: ER operating-point sweep, growth
# accounting.
# ---------------------------------------------------------------------------


def _er_threshold_sweep_oracle() -> str:
    return f"""
    {_minhash_pairs_cte()},
    ds AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY 1),
    inter AS (SELECT p.id1, p.id2, CAST(count(*) AS BIGINT) AS i
              FROM pairs p
              JOIN ds d1 ON d1.doc_id = p.id1
              JOIN ds d2 ON d2.doc_id = p.id2 AND d2.s = d1.s
              GROUP BY 1, 2),
    sc AS (SELECT p.id1, p.id2,
                  CAST(coalesce(i.i, 0) AS DOUBLE)
                    / CAST(s1.n + s2.n - coalesce(i.i, 0) AS DOUBLE) AS j,
                  CASE WHEN p.id1 < 1000000
                        AND (p.id2 = p.id1 + 1000000
                             OR p.id2 = p.id1 + 2000000) THEN 1 ELSE 0 END
                    AS truth
           FROM pairs p
           JOIN sz s1 ON s1.doc_id = p.id1
           JOIN sz s2 ON s2.doc_id = p.id2
           LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2),
    tt AS (SELECT CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                       + SUM(CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_truth
           FROM documents),
    th AS (SELECT CAST(unnest([40, 50, 60, 70, 80, 90]) AS BIGINT) AS t)
    SELECT th.t AS threshold_pct,
           CAST(SUM(CASE WHEN sc.j * 100.0 >= CAST(th.t AS DOUBLE)
                          AND sc.truth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN sc.j * 100.0 >= CAST(th.t AS DOUBLE)
                          AND sc.truth = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           tt.n_truth,
           CAST(SUM(CASE WHEN sc.j * 100.0 >= CAST(th.t AS DOUBLE)
                          AND sc.truth = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(tt.n_truth AS DOUBLE) AS recall
    FROM th CROSS JOIN sc CROSS JOIN tt
    GROUP BY 1, 4
    """


@register("er_threshold_sweep", _er_threshold_sweep_oracle())
def er_threshold_sweep(spark, sf_dir):
    """Entity-resolution operating-point sweep: exact Jaccard scored
    over the LSH candidate list, evaluated against the PLANTED dup
    truth (exact copies at id+10⁶, near copies at id+2·10⁶) for six
    match thresholds — the precision/recall curve a dedup deployment
    tunes its accept threshold on.  The sweep is a 6-row literal cross
    join over the bucket-bounded scored-pair table (scores computed
    once, thresholds free); truth labels are pure id arithmetic
    anchored to the BASE document (copy↔near pairs of the same base
    are unlabeled and count as fp — conservative precision), so the
    oracle is exact."""
    docs = _docs_with_dupes(spark, sf_dir)
    sig = ldedup._track_cache(
        ldedup.minhash_signature_table(
            docs, "doc_id", "text", num_hashes=16,
            min_parallelism=local_fanout(spark),
        ).persist()
    )
    pairs = ldedup._track_cache(
        ldedup.lsh_pairs_from_signatures(sig, num_hashes=16, bands=4).persist()
    )
    # exact Jaccard per candidate, verified ROW-LOCALLY: per-doc
    # distinct-shingle arrays, SEMI-REDUCED to docs that appear in some
    # candidate pair BEFORE the arrays are built (broadcasting /
    # caching array payloads for the whole corpus measured 5× slower
    # than the exploded string join it replaced; reduced to pair
    # members it is strictly cheaper).  size(array_intersect) == the
    # old explode + shingle-string equi-join + count (the PPJoin verify
    # idiom — shingle strings never shuffle); size ≥ 1 mirrors the old
    # inner join on the exploded size table (shingle-less docs drop).
    pdocs = pairs.select(F.explode(F.array("id1", "id2")).alias("doc")).distinct()
    sets = ldedup._track_cache(
        docs.select(F.col("doc_id").alias("doc"), "text")
        .join(pdocs, "doc", "left_semi")
        .select("doc", F.array_distinct(text.shingles("text", 3)).alias("shs"))
        .filter(F.size("shs") >= 1)
        .persist()
    )
    ii = F.size(F.array_intersect("__sa", "__sb")).cast("long")
    sc = (
        pairs.join(
            sets.select(F.col("doc").alias("id1"), F.col("shs").alias("__sa")),
            "id1",
        )
        .join(
            sets.select(F.col("doc").alias("id2"), F.col("shs").alias("__sb")),
            "id2",
        )
        .withColumn("n1", F.size("__sa").cast("long"))
        .withColumn("n2", F.size("__sb").cast("long"))
        .select(
            "id1", "id2",
            (ii.cast("double") / (F.col("n1") + F.col("n2") - ii).cast("double"))
            .alias("j"),
            F.when(
                (F.col("id1") < 1000000)
                & (
                    (F.col("id2") == F.col("id1") + 1000000)
                    | (F.col("id2") == F.col("id1") + 2000000)
                ),
                1,
            )
            .otherwise(0)
            .alias("truth"),
        )
    )
    base = load_table(spark, sf_dir, "documents")
    tt = base.agg(
        (
            F.sum(F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0))
            + F.sum(F.when(F.col("doc_id") % 9 == 0, 1).otherwise(0))
        )
        .cast("long")
        .alias("n_truth")
    )
    th = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(t) for t in (40, 50, 60, 70, 80, 90)])
            ).alias("t0")
        )
        .select(F.col("t0").cast("long").alias("t"))
    )
    hit = F.col("j") * 100.0 >= F.col("t").cast("double")
    return (
        th.crossJoin(sc)
        .crossJoin(tt)
        .groupBy(F.col("t").alias("threshold_pct"), "n_truth")
        .agg(
            F.sum(F.when(hit & (F.col("truth") == 1), 1).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(hit & (F.col("truth") == 0), 1).otherwise(0))
            .cast("long")
            .alias("fp"),
            (
                F.sum(F.when(hit & (F.col("truth") == 1), 1).otherwise(0))
                .cast("double")
                / F.first("n_truth").cast("double")
            ).alias("recall"),
        )
        .select("threshold_pct", "tp", "fp", "n_truth", "recall")
    )


@register(
    "a_growth_accounting",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    fs AS (SELECT user_id, CAST(min(day) AS DATE) AS first_day
           FROM ud GROUP BY 1),
    j AS (SELECT c.user_id, c.day,
                 CASE WHEN f.first_day = c.day THEN 1 ELSE 0 END AS is_new,
                 CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS was_active
          FROM ud c
          JOIN fs f ON f.user_id = c.user_id
          LEFT JOIN ud p ON p.user_id = c.user_id
                        AND p.day = c.day - INTERVAL 1 DAY),
    cur AS (SELECT day,
                   CAST(count(*) AS BIGINT) AS dau,
                   CAST(SUM(is_new) AS BIGINT) AS new_users,
                   CAST(SUM(CASE WHEN is_new = 0 AND was_active = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS retained,
                   CAST(SUM(CASE WHEN is_new = 0 AND was_active = 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
            FROM j GROUP BY 1),
    prev AS (SELECT CAST(day + INTERVAL 1 DAY AS DATE) AS day,
                    CAST(count(*) AS BIGINT) AS prev_dau
             FROM ud GROUP BY 1)
    SELECT cur.day, cur.dau, cur.new_users, cur.retained, cur.resurrected,
           CAST(coalesce(prev.prev_dau, 0) - cur.retained AS BIGINT)
             AS churned
    FROM cur LEFT JOIN prev ON prev.day = cur.day
    """,
)
def a_growth_accounting(spark, sf_dir):
    """Daily growth accounting (the Social Capital framework): DAU
    decomposed into new / retained / resurrected, plus churned =
    yesterday's actives who didn't return — the identity
    DAU(t) = new + retained + resurrected and
    DAU(t−1) = retained + churned every growth dashboard reconciles.
    One distinct user-day aggregate, a first-seen join, one
    self-equi-join on (user, day−1) — all user-grain, no window over
    the user dimension."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    fs = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    prev = ud.select("user_id", F.date_add("day", 1).alias("day")).withColumn(
        "was_active", F.lit(1)
    )
    j = (
        ud.join(fs, "user_id")
        .join(prev, ["user_id", "day"], "left")
        .select(
            "day",
            F.when(F.col("first_day") == F.col("day"), 1).otherwise(0).alias(
                "is_new"
            ),
            F.coalesce("was_active", F.lit(0)).alias("was_active"),
        )
    )
    cur = j.groupBy("day").agg(
        F.count("*").cast("long").alias("dau"),
        F.sum("is_new").cast("long").alias("new_users"),
        F.sum(F.when((F.col("is_new") == 0) & (F.col("was_active") == 1), 1).otherwise(0))
        .cast("long")
        .alias("retained"),
        F.sum(F.when((F.col("is_new") == 0) & (F.col("was_active") == 0), 1).otherwise(0))
        .cast("long")
        .alias("resurrected"),
    )
    pd_ = ud.groupBy(F.date_add("day", 1).alias("day")).agg(
        F.count("*").cast("long").alias("prev_dau")
    )
    return cur.join(pd_, "day", "left").select(
        "day", "dau", "new_users", "retained", "resurrected",
        (F.coalesce("prev_dau", F.lit(0)) - F.col("retained"))
        .cast("long")
        .alias("churned"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch I: multimodal near-dup fingerprints,
# event study, difference-in-differences, k-fold audit, Simpson check.
# ---------------------------------------------------------------------------


@register(
    "multimodal_payload_near_dup",
    f"""
    WITH {_SQL_DOCS2},
    p AS (SELECT doc_id, lower(hex(encode(text))) AS hx FROM docs2),
    k AS (SELECT doc_id, md5(hx) AS ek,
                 md5(substring(hx, 1, 512)) AS pk
          FROM p),
    ex AS (SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM k a JOIN k b ON b.ek = a.ek AND a.doc_id < b.doc_id),
    pf AS (SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM k a JOIN k b ON b.pk = a.pk AND a.doc_id < b.doc_id)
    SELECT id1, id2, 'exact' AS match_type FROM ex
    UNION ALL
    SELECT pf.id1, pf.id2, 'prefix' AS match_type
    FROM pf LEFT JOIN ex ON ex.id1 = pf.id1 AND ex.id2 = pf.id2
    WHERE ex.id1 IS NULL
    """,
)
def multimodal_payload_near_dup(spark, sf_dir):
    """Binary-payload near-duplicate detection WITHOUT decoding: exact
    matches by full-payload digest, near matches by a 256-byte-prefix
    fingerprint (same container header + leading content ⇒ same
    bucket) — the cheap first pass a media dedup pipeline runs before
    any perceptual hash, here over the opaque payload column from
    multimodal.binarize.  Byte-level fingerprints go through the
    lowercase hex encoding so both engines hash identical strings
    (DuckDB has no BLOB md5/substring); payloads never shuffle — only
    32-char digests do — and the candidate join is bucket-bounded.
    The planted near-copies (appended tails) land exactly in the
    prefix class, the planted exact copies in the exact class."""
    from dicomdb_spark.llm import multimodal as mm

    payloads = mm.binarize(_docs_with_dupes(spark, sf_dir))
    hx = F.lower(F.hex(F.col("payload")))
    k = payloads.select(
        "doc_id",
        F.md5(hx).alias("ek"),
        F.md5(F.substring(hx, 1, 512)).alias("pk"),
    )
    a, b = k.alias("a"), k.alias("b")
    ex = a.join(
        b,
        (F.col("b.ek") == F.col("a.ek"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
    )
    pf = a.join(
        b,
        (F.col("b.pk") == F.col("a.pk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
    )
    exact = ex.select("id1", "id2", F.lit("exact").alias("match_type"))
    prefix_only = (
        pf.join(ex.withColumn("__e", F.lit(1)), ["id1", "id2"], "left")
        .filter(F.col("__e").isNull())
        .select("id1", "id2", F.lit("prefix").alias("match_type"))
    )
    return exact.unionAll(prefix_only)


@register(
    "w_event_study",
    """
    WITH ed AS (SELECT CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n_err
                FROM events WHERE event_type = 'error' GROUP BY 1),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(SUM(n_err) AS BIGINT) AS s,
                  CAST(SUM(n_err * n_err) AS BIGINT) AS ss
           FROM ed),
    ev AS (SELECT ed.day FROM ed CROSS JOIN st
           WHERE (CAST(ed.n_err AS DOUBLE)
                  - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                 / (sqrt(CAST(st.n AS DOUBLE) * CAST(st.ss AS DOUBLE)
                         - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
                    / CAST(st.n AS DOUBLE)) > 1.0),
    rev AS (SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT))
                        AS BIGINT) AS rev_c
            FROM events GROUP BY 1),
    al AS (SELECT CAST(datediff('day', ev.day, rev.day) AS BIGINT) AS rel_day,
                  rev.rev_c
           FROM ev JOIN rev ON rev.day >= ev.day - INTERVAL 3 DAY
                           AND rev.day <= ev.day + INTERVAL 3 DAY)
    SELECT rel_day, CAST(count(*) AS BIGINT) AS n_obs,
           CAST(SUM(rev_c) AS BIGINT) AS rev_c_sum,
           CAST(SUM(rev_c) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0
             AS mean_rev
    FROM al GROUP BY 1
    """,
)
def w_event_study(spark, sf_dir):
    """Event-study alignment (MacKinlay, JEL 1997): days whose error
    count sits >1σ above the series mean are 'events'; the total
    daily activity value is aligned on the −3..+3 day offsets around
    each event and averaged per offset — the abnormal-window shape incident post-mortems and
    announcement studies both read.  Event selection is a 1-row
    moment broadcast; the alignment is a ±3-day band join on the
    bounded day grain (≤7 probes per event day); revenue sums stay
    exact cents."""
    ev = load_table(spark, sf_dir, "events")
    ed = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("n_err"))
    )
    st = ed.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_err").cast("long").alias("s"),
        F.sum(F.col("n_err") * F.col("n_err")).cast("long").alias("ss"),
    )
    nd = F.col("n").cast("double")
    z = (F.col("n_err").cast("double") - F.col("s").cast("double") / nd) / (
        F.sqrt(
            nd * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / nd
    )
    evd = ed.crossJoin(st).filter(z > 1.0).select(F.col("day").alias("eday"))
    rev = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    al = evd.join(
        rev,
        (rev.day >= F.date_sub(F.col("eday"), 3))
        & (rev.day <= F.date_add(F.col("eday"), 3)),
    ).select(
        F.datediff(F.col("day"), F.col("eday")).cast("long").alias("rel_day"),
        "rev_c",
    )
    return al.groupBy("rel_day").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("rev_c").cast("long").alias("rev_c_sum"),
        (
            F.sum("rev_c").cast("double") / F.count("*").cast("double") / 100.0
        ).alias("mean_rev"),
    )


@register(
    "a_did_estimator",
    """
    WITH u AS (SELECT user_id,
                      CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS treated,
                      CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 1 ELSE 0 END AS post,
                      CAST(floor(value * 100) AS BIGINT) AS v
               FROM events),
    c AS (SELECT treated, post,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS s,
                 CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                                     / 10000.0) AS BIGINT)) AS BIGINT) AS ssk
          FROM u GROUP BY 1, 2),
    m AS (SELECT treated, post, n,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
                 ((CAST(n AS DOUBLE) * (CAST(ssk AS DOUBLE) * 10000.0)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0
                   / CAST(n AS DOUBLE) AS var_mean
          FROM c)
    SELECT tp.mean - tr.mean - (cp.mean - cr.mean) AS did,
           tp.mean - tr.mean AS delta_treated,
           cp.mean - cr.mean AS delta_control,
           sqrt(tp.var_mean + tr.var_mean + cp.var_mean + cr.var_mean)
             AS se_did,
           (tp.mean - tr.mean - (cp.mean - cr.mean))
             / sqrt(tp.var_mean + tr.var_mean + cp.var_mean + cr.var_mean)
             AS z_did
    FROM (SELECT * FROM m WHERE treated = 1 AND post = 1) tp
    CROSS JOIN (SELECT * FROM m WHERE treated = 1 AND post = 0) tr
    CROSS JOIN (SELECT * FROM m WHERE treated = 0 AND post = 1) cp
    CROSS JOIN (SELECT * FROM m WHERE treated = 0 AND post = 0) cr
    """,
)
def a_did_estimator(spark, sf_dir):
    """Difference-in-differences: (treated post−pre) − (control
    post−pre) over event values, with the planted assignment
    user_id % 3 (documented synthetic treatment — the estimator shape
    is the deliverable) and post = the month's second half.  The
    classic parallel-trends causal estimate (Card & Krueger, AER
    1994) from ONE 4-cell aggregate; the z uses the independent-cell
    variance sum, every moment floor-scaled exact."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    u = ev.select(
        F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("treated"),
        F.when(day >= F.lit("2024-01-16").cast("date"), 1)
        .otherwise(0)
        .alias("post"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    vd = F.col("v").cast("double")
    c = u.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.floor(vd * vd / 10000.0).cast("long")).cast("long").alias("ssk"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd / 100.0
    var_mean = (
        (
            nd * (F.col("ssk").cast("double") * 10000.0)
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / nd
        / nd
    ) / 10000.0 / nd
    m = c.select("treated", "post", "n", mean.alias("mean"), var_mean.alias("var_mean"))

    def cell(t, p, tag):
        return m.filter((F.col("treated") == t) & (F.col("post") == p)).select(
            F.col("mean").alias(f"m_{tag}"), F.col("var_mean").alias(f"v_{tag}")
        )

    j = (
        cell(1, 1, "tp")
        .crossJoin(cell(1, 0, "tr"))
        .crossJoin(cell(0, 1, "cp"))
        .crossJoin(cell(0, 0, "cr"))
    )
    dt = F.col("m_tp") - F.col("m_tr")
    dc = F.col("m_cp") - F.col("m_cr")
    se = F.sqrt(
        F.col("v_tp") + F.col("v_tr") + F.col("v_cp") + F.col("v_cr")
    )
    return j.select(
        (dt - dc).alias("did"),
        dt.alias("delta_treated"),
        dc.alias("delta_control"),
        se.alias("se_did"),
        ((dt - dc) / se).alias("z_did"),
    )


@register(
    "ml_kfold_assignment",
    """
    WITH f AS (SELECT c_custkey, c_mktsegment,
                      CAST(floor(c_acctbal) AS BIGINT) AS bal,
                      CAST(strpos('0123456789abcdef',
                                  substr(md5('fold:' || CAST(c_custkey AS VARCHAR)), 1, 1)) - 1
                           AS BIGINT) % 5 AS fold
               FROM customer)
    SELECT fold, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(bal) AS BIGINT) AS bal_sum,
           CAST(SUM(bal) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bal_mean,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM f GROUP BY 1
    """,
)
def ml_kfold_assignment(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment (salted-md5
    fold ids — reproducible across engines, machines, and reruns,
    unlike RNG splits) with the per-fold balance audit every CV setup
    should run: fold sizes, outcome-proxy means, segment coverage.
    A skewed fold here invalidates the CV variance estimate before
    any model is trained.  One map-only hash + one aggregate."""
    from dicomdb_spark.functions.sketches import _hex_int

    cust = load_table(spark, sf_dir, "customer")
    fold = (
        _hex_int(
            F.md5(F.concat(F.lit("fold:"), F.col("c_custkey").cast("string"))), 1
        )
        % 5
    ).cast("long")
    f = cust.select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal")).cast("long").alias("bal"),
        fold.alias("fold"),
    )
    return f.groupBy("fold").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("bal").cast("long").alias("bal_sum"),
        (F.sum("bal").cast("double") / F.count("*").cast("double")).alias(
            "bal_mean"
        ),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )


@register(
    "a_simpson_paradox_audit",
    """
    WITH f AS (SELECT c.c_mktsegment AS seg,
                      CAST(floor(c.c_acctbal) AS BIGINT) AS x,
                      CAST(floor(CAST(SUM(CAST(floor(o.o_totalprice * 100)
                                              AS BIGINT)) AS DOUBLE)
                                 / 100000.0) AS BIGINT) AS y
               FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
               GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal),
    m AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM f GROUP BY 1),
    o AS (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
                 CAST(SUM(sy) AS BIGINT) AS sy,
                 CAST(SUM(sxx) AS BIGINT) AS sxx,
                 CAST(SUM(sxy) AS BIGINT) AS sxy
          FROM m),
    os AS (SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    AS overall_slope
           FROM o)
    SELECT m.seg, m.n,
           (CAST(m.n AS DOUBLE) * CAST(m.sxy AS DOUBLE)
            - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
           / (CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE)
              - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) AS seg_slope,
           os.overall_slope,
           CAST(CASE WHEN ((CAST(m.n AS DOUBLE) * CAST(m.sxy AS DOUBLE)
                            - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
                           / (CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE)
                              - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) > 0.0)
                          <> (os.overall_slope > 0.0)
                     THEN 1 ELSE 0 END AS BIGINT) AS sign_flips
    FROM m CROSS JOIN os
    """,
)
def a_simpson_paradox_audit(spark, sf_dir):
    """Simpson's-paradox screen: the spend~balance regression slope
    fit overall AND within each market segment; a per-segment sign
    that contradicts the pooled sign is the aggregation-reversal
    warning (Simpson, JRSS 1951) that tells an analyst the pooled
    trend is confounded by segment mix.  Segment moments roll up to
    the overall moments by plain addition (one aggregate feeds both
    levels); slopes are fixed closed-form chains."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(
            F.floor(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100000.0
            )
            .cast("long")
            .alias("y")
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal")).cast("long").alias("x"),
            "y",
        )
    )
    m = f.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    o = m.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("sxx").cast("long").alias("sxx"),
        F.sum("sxy").cast("long").alias("sxy"),
    )

    def slope():
        nd = F.col("n").cast("double")
        return (
            nd * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        ) / (
            nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )

    os_ = o.select(slope().alias("overall_slope"))
    seg_slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return m.crossJoin(os_).select(
        "seg", "n",
        seg_slope.alias("seg_slope"),
        "overall_slope",
        F.when(
            (seg_slope > 0.0) != (F.col("overall_slope") > 0.0), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("sign_flips"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch J: process capability, queueing metrics,
# LSH s-curve audit, 2-hop reach, SCD history compaction.
# ---------------------------------------------------------------------------


@register(
    "w_cpk_process_capability",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(ts AS DATE) < DATE '2024-01-16' AS calib,
                      CAST(floor(value * 100) AS BIGINT) AS x
               FROM events),
    cal AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                       / 10000.0) AS BIGINT)) AS BIGINT) AS ssk
            FROM d WHERE calib GROUP BY 1),
    lim AS (SELECT event_type,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                   sqrt(greatest(
                          CAST(n AS DOUBLE) * (CAST(ssk AS DOUBLE) * 10000.0)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0))
                     / CAST(n AS DOUBLE) AS sig
            FROM cal),
    ev AS (SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_eval,
                  CAST(SUM(d.x) AS BIGINT) AS s_eval,
                  CAST(SUM(CAST(floor(CAST(d.x AS DOUBLE) * CAST(d.x AS DOUBLE)
                                      / 10000.0) AS BIGINT)) AS BIGINT)
                    AS ssk_eval,
                  CAST(SUM(CASE WHEN CAST(d.x AS DOUBLE)
                                     > lim.mu + 3.0 * lim.sig
                                  OR CAST(d.x AS DOUBLE)
                                     < lim.mu - 3.0 * lim.sig
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_out
           FROM d JOIN lim ON lim.event_type = d.event_type
           WHERE NOT d.calib
           GROUP BY d.event_type, lim.mu, lim.sig),
    ms AS (SELECT ev.event_type, ev.n_eval, ev.n_out, lim.mu, lim.sig,
                  CAST(ev.s_eval AS DOUBLE) / CAST(ev.n_eval AS DOUBLE)
                    AS mu_eval,
                  sqrt(greatest(
                         CAST(ev.n_eval AS DOUBLE)
                         * (CAST(ev.ssk_eval AS DOUBLE) * 10000.0)
                         - CAST(ev.s_eval AS DOUBLE) * CAST(ev.s_eval AS DOUBLE),
                         0.0))
                    / CAST(ev.n_eval AS DOUBLE) AS sig_eval
           FROM ev JOIN lim ON lim.event_type = ev.event_type)
    SELECT event_type, n_eval, n_out,
           (6.0 * sig) / (6.0 * sig_eval) AS cp,
           least((mu + 3.0 * sig) - mu_eval, mu_eval - (mu - 3.0 * sig))
             / (3.0 * sig_eval) AS cpk
    FROM ms
    """,
)
def w_cpk_process_capability(spark, sf_dir):
    """Process capability indices Cp/Cpk: spec limits calibrated as
    μ±3σ on the month's first half, capability evaluated on the
    second half — Cp compares spec width to realized spread, Cpk
    penalizes off-center drift (the AIAG SPC manual's acceptance
    gate, Cpk ≥ 1.33).  Both halves reduce to exact floor-scaled
    integer moments in one aggregate each; the out-of-spec count
    rides the evaluation pass.  Complements a_spc_control_chart's
    per-point rules with the process-level verdict."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    d = ev.select(
        "event_type",
        (day < F.lit("2024-01-16").cast("date")).alias("calib"),
        F.floor(F.col("value") * 100).cast("long").alias("x"),
    )
    xd = F.col("x").cast("double")
    sq = F.floor(xd * xd / 10000.0).cast("long")
    cal = d.filter(F.col("calib")).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(sq).cast("long").alias("ssk"),
    )
    nd = F.col("n").cast("double")
    lim = cal.select(
        "event_type",
        (F.col("s").cast("double") / nd).alias("mu"),
        (
            # greatest-0 clamp: floor-scaled radicand can dip below 0
            # on a constant calibration window — DuckDB sqrt(negative)
            # ERRORS; clamped identically in the oracle
            F.sqrt(F.greatest(
                nd * (F.col("ssk").cast("double") * 10000.0)
                - F.col("s").cast("double") * F.col("s").cast("double"),
                F.lit(0.0),
            ))
            / nd
        ).alias("sig"),
    )
    evj = (
        d.filter(~F.col("calib"))
        .join(lim, "event_type")
        .groupBy("event_type", "mu", "sig")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.sum("x").cast("long").alias("s_eval"),
            F.sum(sq).cast("long").alias("ssk_eval"),
            F.sum(
                F.when(
                    (xd > F.col("mu") + 3.0 * F.col("sig"))
                    | (xd < F.col("mu") - 3.0 * F.col("sig")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_out"),
        )
    )
    ned = F.col("n_eval").cast("double")
    mu_eval = F.col("s_eval").cast("double") / ned
    sig_eval = (
        F.sqrt(F.greatest(
            ned * (F.col("ssk_eval").cast("double") * 10000.0)
            - F.col("s_eval").cast("double") * F.col("s_eval").cast("double"),
            F.lit(0.0),
        ))
        / ned
    )
    return evj.select(
        "event_type", "n_eval", "n_out",
        # nullif: a constant evaluation window makes sig_eval exactly
        # 0.0 (the greatest-0 clamp), so ANSI Spark would throw on
        # cp/cpk while DuckDB x/0.0 is NULL — guard like w_sharpe_sortino
        ((6.0 * F.col("sig")) / F.nullif(6.0 * sig_eval, F.lit(0.0))).alias("cp"),
        (
            F.least(
                (F.col("mu") + 3.0 * F.col("sig")) - mu_eval,
                mu_eval - (F.col("mu") - 3.0 * F.col("sig")),
            )
            / F.nullif(3.0 * sig_eval, F.lit(0.0))
        ).alias("cpk"),
    )


@register(
    "a_queueing_mm1_metrics",
    """
    WITH m AS (SELECT event_type,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
                        AS svc_s,
                      CAST(datediff('second', min(ts), max(ts)) AS BIGINT)
                        AS span_s
               FROM events GROUP BY 1),
    r AS (SELECT event_type, n, svc_s, span_s,
                 CAST(n AS DOUBLE) / CAST(span_s AS DOUBLE) AS lam,
                 CAST(svc_s AS DOUBLE) / CAST(n AS DOUBLE) AS es
          FROM m WHERE span_s > 0 AND svc_s > 0)
    SELECT event_type, n, lam AS lambda_per_s, es AS mean_service_s,
           lam * es AS rho,
           CASE WHEN lam * es < 1.0
                THEN (lam * es) * (lam * es) / (1.0 - lam * es) END AS lq,
           CASE WHEN lam * es < 1.0
                THEN (lam * es) * es / (1.0 - lam * es) END AS wq_s
    FROM r
    """,
)
def a_queueing_mm1_metrics(spark, sf_dir):
    """M/M/1 queueing back-of-envelope per stream: arrival rate λ
    from the observed span, mean service demand from the value column
    (treated as seconds of work), utilization ρ = λ·E[S], and the
    Pollaczek–Khinchine-style queue length Lq = ρ²/(1−ρ) and wait
    Wq — the capacity-planning sanity check that says how close a
    consumer is to saturation BEFORE latency explodes (ρ → 1).
    Closed-form chains over one aggregate; ρ ≥ 1 yields NULL (the
    queue is unstable, no steady state exists) identically on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value")).cast("long")).cast("long").alias("svc_s"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("span_s"),
    )
    lam = F.col("n").cast("double") / F.col("span_s").cast("double")
    es = F.col("svc_s").cast("double") / F.col("n").cast("double")
    rho = lam * es
    return m.filter((F.col("span_s") > 0) & (F.col("svc_s") > 0)).select(
        "event_type", "n",
        lam.alias("lambda_per_s"),
        es.alias("mean_service_s"),
        rho.alias("rho"),
        F.when(rho < 1.0, rho * rho / (1.0 - rho)).alias("lq"),
        F.when(rho < 1.0, rho * es / (1.0 - rho)).alias("wq_s"),
    )


def _lsh_s_curve_oracle() -> str:
    # P(candidate | s) for r rows/band, b bands: 1 - (1 - s^r)^b with
    # r = 4, b = 4 — integer exponents unrolled as products (exact
    # same double chain on both engines; no libm pow)
    s4 = "(j * j * j * j)"
    return f"""
    {_minhash_pairs_cte()},
    ds AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY 1),
    allp AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                    CAST(count(*) AS BIGINT) AS i
             FROM ds a JOIN ds b ON b.s = a.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    sc AS (SELECT allp.id1, allp.id2,
                  CAST(allp.i AS DOUBLE)
                    / CAST(s1.n + s2.n - allp.i AS DOUBLE) AS j,
                  CASE WHEN p.id1 IS NULL THEN 0 ELSE 1 END AS is_cand
           FROM allp
           JOIN sz s1 ON s1.doc_id = allp.id1
           JOIN sz s2 ON s2.doc_id = allp.id2
           LEFT JOIN pairs p ON p.id1 = allp.id1 AND p.id2 = allp.id2),
    b AS (SELECT CAST(floor(j * 10.0) AS BIGINT) AS bin, j, is_cand FROM sc
          WHERE j > 0.0)
    SELECT least(bin, 9) AS j_bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_cand) AS BIGINT) AS n_candidates,
           CAST(SUM(is_cand) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS observed_rate,
           CAST(SUM(CAST(floor((1.0 - (1.0 - {s4}) * (1.0 - {s4})
                                      * (1.0 - {s4}) * (1.0 - {s4}))
                               * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / CAST(count(*) AS DOUBLE) AS theory_rate
    FROM b GROUP BY 1
    """


@register("dedup_lsh_s_curve", _lsh_s_curve_oracle())
def dedup_lsh_s_curve(spark, sf_dir):
    """LSH s-curve audit: observed candidate probability per Jaccard
    decile vs the theoretical 1−(1−s^r)^b for the deployed (r=4, b=4)
    banding — THE plot that tells you whether your banding config's
    recall cliff sits where the theory promised (Leskovec/Rajaraman/
    Ullman, MMDS ch. 3).  Pairs sharing ≥1 shingle enumerate through
    the inverted index (bounded by shingle co-occurrence, the same
    cost envelope as dedup_ngram_jaccard); the theory curve uses only
    integer-exponent products, bit-identical without libm pow; the
    per-bin mean floor-scales each term before summing."""
    docs = _docs_with_dupes(spark, sf_dir)
    sig = ldedup._track_cache(
        ldedup.minhash_signature_table(
            docs, "doc_id", "text", num_hashes=16,
            min_parallelism=local_fanout(spark),
        ).persist()
    )
    pairs = ldedup.lsh_pairs_from_signatures(sig, num_hashes=16, bands=4)
    # r13 optimization (guide §2.4, the _df_capped_pair_scores idiom):
    # the shingle sets are CPU-dense — materialize once for both the
    # size table and the posting index (the old form re-shingled per
    # consumer), and enumerate each posting bucket's C(df,2) pairs
    # in-plan (array_sort orders docs, x-before-y == the join's
    # id1 < id2) instead of self-joining on the 3-token shingle STRING
    # — one exchange on the key, no sort-merge join.  Counting stays
    # on true strings (exact shared-shingle counts feed the Jaccard).
    sets = ldedup._track_cache(
        docs.select(
            F.col("doc_id").alias("doc"),
            F.array_distinct(text.shingles("text", 3)).alias("__shs"),
        ).persist()
    )
    sz = sets.select("doc", F.size("__shs").cast("long").alias("n"))
    ds = sets.select("doc", F.explode("__shs").alias("s"))
    allp = (
        ds.groupBy("s")
        .agg(F.expr("array_sort(collect_list(doc))").alias("dd"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(dd, (x, i) -> "
                    "transform(slice(dd, i + 2, size(dd)), "
                    "y -> struct(x AS id1, y AS id2))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("id1", "id2")
        .agg(F.count("*").cast("long").alias("i"))
    )
    sc = (
        allp.join(
            sz.select(F.col("doc").alias("id1"), F.col("n").alias("n1")), "id1"
        )
        .join(sz.select(F.col("doc").alias("id2"), F.col("n").alias("n2")), "id2")
        .join(pairs.withColumn("__c", F.lit(1)), ["id1", "id2"], "left")
        .select(
            (
                F.col("i").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("i")).cast("double")
            ).alias("j"),
            F.coalesce("__c", F.lit(0)).alias("is_cand"),
        )
        .filter(F.col("j") > 0.0)
    )
    s4 = F.col("j") * F.col("j") * F.col("j") * F.col("j")
    one_band_miss = 1.0 - s4
    theory = 1.0 - one_band_miss * one_band_miss * one_band_miss * one_band_miss
    bbin = F.least(F.floor(F.col("j") * 10.0).cast("long"), F.lit(9).cast("long"))
    return sc.groupBy(bbin.alias("j_bin")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("is_cand").cast("long").alias("n_candidates"),
        (
            F.sum("is_cand").cast("double") / F.count("*").cast("double")
        ).alias("observed_rate"),
        (
            F.sum(F.floor(theory * 1000000.0).cast("long")).cast("double")
            / 1000000.0
            / F.count("*").cast("double")
        ).alias("theory_rate"),
    )


@register(
    "graph_two_hop_reach",
    f"""
    {_minhash_pairs_cte()},
    e AS (SELECT id1 AS src, id2 AS dst FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
    two AS (SELECT DISTINCT a.src AS v, b.dst AS w
            FROM e a JOIN e b ON b.src = a.dst
            WHERE b.dst <> a.src),
    deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS degree
            FROM e GROUP BY 1)
    SELECT deg.v AS doc_id, deg.degree,
           CAST(count(two.w) AS BIGINT) AS reach_2hop
    FROM deg LEFT JOIN two ON two.v = deg.v
    GROUP BY 1, 2
    """,
)
def graph_two_hop_reach(spark, sf_dir):
    """Two-hop reach per vertex (distinct nodes within ≤2 edges,
    excluding self): the friend-of-friend audience size — reach ≈
    degree means a tight clique (dup cluster); reach ≫ degree means a
    hub bridging clusters (banding false positives chaining unrelated
    docs).  One edge self-join with a distinct, cost bounded by
    Σ deg(v)² — the standard two-hop envelope, fine on a
    near-dup graph whose components are small by construction."""
    pairs = ldedup.minhash_lsh_pairs(
        _docs_with_dupes(spark, sf_dir),
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        min_parallelism=local_fanout(spark),
    ).persist()
    e = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst")).unionAll(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    a, b = e.alias("a"), e.alias("b")
    two = (
        a.join(b, F.col("b.src") == F.col("a.dst"))
        .filter(F.col("b.dst") != F.col("a.src"))
        .select(F.col("a.src").alias("v"), F.col("b.dst").alias("w"))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("degree")
    )
    return (
        deg.join(two, "v", "left")
        .groupBy(F.col("v").alias("doc_id"), "degree")
        .agg(F.count("w").cast("long").alias("reach_2hop"))
    )


@register(
    "scd_history_compaction",
    """
    WITH h AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
                      lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey)
                        AS prev_status
               FROM orders),
    c AS (SELECT o_custkey,
                 CAST(count(*) AS BIGINT) AS n_versions,
                 CAST(SUM(CASE WHEN prev_status IS NULL
                                 OR prev_status <> o_orderstatus
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_compacted
          FROM h GROUP BY 1)
    SELECT o_custkey, n_versions, n_compacted,
           CAST(n_versions - n_compacted AS BIGINT) AS n_redundant,
           CAST(n_compacted AS DOUBLE) / CAST(n_versions AS DOUBLE)
             AS compaction_ratio
    FROM c
    """,
)
def scd_history_compaction(spark, sf_dir):
    """SCD history compaction audit: consecutive versions carrying an
    UNCHANGED attribute are redundant — run-length compression of the
    history keeps only change points (the storage-diet every
    append-only dimension eventually needs).  One partitioned lag
    marks run starts; n_compacted = number of change-runs per key,
    n_redundant = rows a compaction job would delete.  Deterministic
    per-key ordering via the (date, key) tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = orders.select(
        "o_custkey", "o_orderstatus",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    c = h.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_versions"),
        F.sum(
            F.when(
                F.col("prev_status").isNull()
                | (F.col("prev_status") != F.col("o_orderstatus")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_compacted"),
    )
    return c.select(
        "o_custkey", "n_versions", "n_compacted",
        (F.col("n_versions") - F.col("n_compacted")).cast("long").alias(
            "n_redundant"
        ),
        (
            F.col("n_compacted").cast("double")
            / F.col("n_versions").cast("double")
        ).alias("compaction_ratio"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch K: seasonality strength, price indices,
# ABC classification.
# ---------------------------------------------------------------------------


@register(
    "w_seasonality_strength",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS x
               FROM events GROUP BY 1, 2),
    tr AS (SELECT event_type, day, x,
                  CAST(SUM(x) OVER w AS BIGINT) AS s7,
                  CAST(count(*) OVER w AS BIGINT) AS nw
           FROM d
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (SELECT event_type, day,
                   CAST(floor((CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
                              * 100.0) AS BIGINT) AS di
            FROM tr WHERE nw = 7),
    se AS (SELECT event_type, CAST(dayofweek(day) AS BIGINT) AS dow,
                  CAST(SUM(di) AS BIGINT) AS sdi,
                  CAST(count(*) AS BIGINT) AS ndi
           FROM det GROUP BY 1, 2),
    r AS (SELECT det.event_type,
                 CAST(floor(CAST(det.di AS DOUBLE)
                            - CAST(se.sdi AS DOUBLE) / CAST(se.ndi AS DOUBLE))
                      AS BIGINT) AS ri,
                 det.di
          FROM det JOIN se ON se.event_type = det.event_type
                          AND se.dow = CAST(dayofweek(det.day) AS BIGINT)),
    v AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(ri) AS BIGINT) AS sr,
                 CAST(SUM(CAST(floor(CAST(ri AS DOUBLE) * CAST(ri AS DOUBLE)
                                     / 10000.0) AS BIGINT)) AS BIGINT) AS srr,
                 CAST(SUM(di) AS BIGINT) AS sd,
                 CAST(SUM(CAST(floor(CAST(di AS DOUBLE) * CAST(di AS DOUBLE)
                                     / 10000.0) AS BIGINT)) AS BIGINT) AS sdd
          FROM r GROUP BY 1)
    SELECT event_type, n,
           greatest(0.0,
             1.0 - (CAST(n AS DOUBLE) * (CAST(srr AS DOUBLE) * 10000.0)
                    - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(sdd AS DOUBLE) * 10000.0)
                      - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
             AS seasonal_strength
    FROM v
    """,
)
def w_seasonality_strength(spark, sf_dir):
    """Seasonality strength Fs = max(0, 1 − Var(remainder)/
    Var(seasonal + remainder)) over the classical decomposition
    (Wang, Smith & Hyndman's feature — the scalar that ranks thousands
    of series by 'how seasonal'): the detrended series IS
    seasonal+remainder, the remainder is detrended minus the
    day-of-week means, and both variances come from floor-scaled exact
    integer moments so the ratio is engine-identical.  Day-grain
    windows and 7-row seasonal joins throughout."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    tr = d.select(
        "event_type", "day", "x",
        F.sum("x").over(w7).cast("long").alias("s7"),
        F.count("*").over(w7).cast("long").alias("nw"),
    )
    det = tr.filter(F.col("nw") == 7).select(
        "event_type", "day",
        F.floor(
            (F.col("x").cast("double") - F.col("s7").cast("double") / 7.0)
            * 100.0
        )
        .cast("long")
        .alias("di"),
    )
    se = det.groupBy(
        "event_type", F.dayofweek("day").cast("long").alias("dow")
    ).agg(
        F.sum("di").cast("long").alias("sdi"),
        F.count("*").cast("long").alias("ndi"),
    )
    dta, sea = det.alias("dt"), se.alias("se")
    r = dta.join(
        sea,
        (F.col("se.event_type") == F.col("dt.event_type"))
        & (F.col("se.dow") == F.dayofweek(F.col("dt.day")).cast("long")),
    ).select(
        F.col("dt.event_type").alias("event_type"),
        F.floor(
            F.col("dt.di").cast("double")
            - F.col("se.sdi").cast("double") / F.col("se.ndi").cast("double")
        )
        .cast("long")
        .alias("ri"),
        F.col("dt.di").alias("di"),
    )
    sq = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * F.col(c).cast("double") / 10000.0
    ).cast("long")
    v = r.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ri").cast("long").alias("sr"),
        F.sum(sq("ri")).cast("long").alias("srr"),
        F.sum("di").cast("long").alias("sd"),
        F.sum(sq("di")).cast("long").alias("sdd"),
    )
    nd = F.col("n").cast("double")
    var_r = nd * (F.col("srr").cast("double") * 10000.0) - F.col("sr").cast(
        "double"
    ) * F.col("sr").cast("double")
    var_d = nd * (F.col("sdd").cast("double") * 10000.0) - F.col("sd").cast(
        "double"
    ) * F.col("sd").cast("double")
    return v.select(
        "event_type", "n",
        # nullif: constant series → var_d 0 → NULL like DuckDB x/0.
        # Both engines' greatest() SKIPS nulls, so greatest(0.0, NULL)
        # is 0.0 — a constant series emits 0.0 identically, not NULL.
        F.greatest(F.lit(0.0), 1.0 - var_r / F.nullif(var_d, F.lit(0.0)))
        .alias("seasonal_strength"),
    )


@register(
    "a_price_index_laspeyres",
    """
    WITH li AS (SELECT l_partkey,
                       CASE WHEN year(l_shipdate) < 1998 THEN 0 ELSE 1 END
                         AS period,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS p_c,
                       CAST(floor(l_quantity) AS BIGINT) AS q
                FROM lineitem),
    pp AS (SELECT l_partkey, period,
                  CAST(SUM(p_c) AS BIGINT) AS sp,
                  CAST(SUM(q) AS BIGINT) AS sq
           FROM li GROUP BY 1, 2),
    u AS (SELECT p0.l_partkey,
                 CAST(floor(CAST(p0.sp AS DOUBLE) / CAST(p0.sq AS DOUBLE))
                      AS BIGINT) AS p0,
                 p0.sq AS q0,
                 CAST(floor(CAST(p1.sp AS DOUBLE) / CAST(p1.sq AS DOUBLE))
                      AS BIGINT) AS p1,
                 p1.sq AS q1
          FROM (SELECT * FROM pp WHERE period = 0) p0
          JOIN (SELECT * FROM pp WHERE period = 1) p1
            ON p1.l_partkey = p0.l_partkey
          WHERE p0.sq > 0 AND p1.sq > 0),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(SUM(p1 * q0) AS BIGINT) AS l_num,
                 CAST(SUM(p0 * q0) AS BIGINT) AS l_den,
                 CAST(SUM(p1 * q1) AS BIGINT) AS p_num,
                 CAST(SUM(p0 * q1) AS BIGINT) AS p_den
          FROM u)
    SELECT n_parts,
           CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE) AS laspeyres,
           CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS paasche,
           sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
                * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)))
             AS fisher
    FROM s
    """,
)
def a_price_index_laspeyres(spark, sf_dir):
    """Price indices between the pre-1998 and 1998+ shipment periods:
    Laspeyres (base-period basket), Paasche (current basket), and
    Fisher's ideal (their geometric mean — one sqrt) over per-part
    unit prices — the inflation-measurement kernel (CPI methodology)
    restricted to parts traded in BOTH periods.  Unit prices floor to
    exact integer cents so the basket sums are order-independent; the
    whole query is two hash aggregates and one part-grain join."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        "l_partkey",
        F.when(F.year("l_shipdate") < 1998, 0).otherwise(1).alias("period"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("p_c"),
        F.floor(F.col("l_quantity")).cast("long").alias("q"),
    )
    pp = d.groupBy("l_partkey", "period").agg(
        F.sum("p_c").cast("long").alias("sp"),
        F.sum("q").cast("long").alias("sq"),
    )
    unit = F.floor(F.col("sp").cast("double") / F.col("sq").cast("double")).cast(
        "long"
    )
    p0 = pp.filter((F.col("period") == 0) & (F.col("sq") > 0)).select(
        "l_partkey", unit.alias("p0"), F.col("sq").alias("q0")
    )
    p1 = pp.filter((F.col("period") == 1) & (F.col("sq") > 0)).select(
        "l_partkey", unit.alias("p1"), F.col("sq").alias("q1")
    )
    u = p0.join(p1, "l_partkey")
    s = u.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).cast("long").alias("l_num"),
        F.sum(F.col("p0") * F.col("q0")).cast("long").alias("l_den"),
        F.sum(F.col("p1") * F.col("q1")).cast("long").alias("p_num"),
        F.sum(F.col("p0") * F.col("q1")).cast("long").alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return s.select(
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


@register(
    "a_abc_classification",
    """
    WITH p AS (SELECT l_partkey,
                      CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                           AS BIGINT) AS rev_c
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot FROM p),
    r AS (SELECT l_partkey, rev_c,
                 CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                      AS BIGINT) AS cum
          FROM p),
    c AS (SELECT r.l_partkey, r.rev_c,
                 CASE WHEN CAST(r.cum AS DOUBLE) / CAST(t.tot AS DOUBLE)
                           <= 0.8 THEN 'A'
                      WHEN CAST(r.cum AS DOUBLE) / CAST(t.tot AS DOUBLE)
                           <= 0.95 THEN 'B'
                      ELSE 'C' END AS abc
          FROM r CROSS JOIN t)
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS BIGINT) AS rev_c,
           CAST(SUM(rev_c) AS DOUBLE)
             / CAST(max(CAST(t.tot AS BIGINT)) AS DOUBLE) AS revenue_share
    FROM c CROSS JOIN t GROUP BY 1
    """,
)
def a_abc_classification(spark, sf_dir):
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B = to 95%, C =
    the tail — the Pareto-based stocking policy every supply chain
    runs.  The cumulative revenue over the UNBOUNDED part dimension
    uses the distributed rank recipe (range-bucket + per-bucket
    offsets + partitioned running sum — descending), never a
    single-partition sort; class assignment is then one broadcast
    total and a CASE."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    t = p.agg(F.sum("rev_c").cast("long").alias("tot"))
    ranked = ow.bucketed_running(
        ow.monotone_range_bucket(p, "rev_c", ascending=False),
        [F.col("rev_c").desc(), "l_partkey"],
        sum_cols=["rev_c"],
    ).withColumnRenamed("cum_rev_c", "cum")
    share = F.col("cum").cast("double") / F.col("tot").cast("double")
    c = ranked.crossJoin(t).select(
        "rev_c", "tot",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc"
        ),
    )
    return c.groupBy("abc").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rev_c").cast("long").alias("rev_c"),
        (
            F.sum("rev_c").cast("double")
            / F.max(F.col("tot")).cast("double")
        ).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch L: segment migration, Wilson intervals,
# rich-club coefficient.
# ---------------------------------------------------------------------------


@register(
    "a_segment_migration_matrix",
    """
    WITH s AS (SELECT o_custkey,
                      CASE WHEN year(o_orderdate) < 1998 THEN 0 ELSE 1 END
                        AS period,
                      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS spend_c
               FROM orders GROUP BY 1, 2),
    q AS (SELECT o_custkey, period, spend_c,
                 CAST(ntile(5) OVER (PARTITION BY period
                                     ORDER BY spend_c, o_custkey) AS BIGINT)
                   AS quint
          FROM s),
    m AS (SELECT q0.o_custkey, q0.quint AS from_quint, q1.quint AS to_quint
          FROM (SELECT * FROM q WHERE period = 0) q0
          JOIN (SELECT * FROM q WHERE period = 1) q1
            ON q1.o_custkey = q0.o_custkey),
    t AS (SELECT from_quint, CAST(count(*) AS BIGINT) AS n_from
          FROM m GROUP BY 1)
    SELECT m.from_quint, m.to_quint,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
    FROM m JOIN t ON t.from_quint = m.from_quint
    GROUP BY 1, 2, t.n_from
    """,
)
def a_segment_migration_matrix(spark, sf_dir):
    """Customer segment migration: spend quintile in the pre-1998
    period vs the 1998+ period, as a 5×5 transition matrix with
    row-normalized probabilities — the churn-risk / upsell map every
    lifecycle team tracks (diagonal = stable, below = decaying).
    Quintiles use the distributed ntile recipe PER PERIOD (partitioned
    rank passes over the unbounded customer dimension); the matrix is
    one self-join on customer and a 25-cell rollup."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy(
        "o_custkey",
        F.when(F.year("o_orderdate") < 1998, 0).otherwise(1).alias("period"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend_c")
    )

    def quint_period(p):
        # r13 optimization (guide §3.3/§5): checkpoint instead of
        # persist — the rank recipe references d three times and the
        # migration join reads each period's output twice, so raw /
        # cached lineage nested the whole upstream per reference
        # (102-Exchange plan); per-period state is |customers| rows.
        d = s.filter(F.col("period") == p)
        d = d.crossJoin(
            d.agg(F.count("*").cast("long").alias("__n"))
        ).transform(cut_lineage)
        ranked = ow.bucketed_running(
            ow.monotone_range_bucket(d, "spend_c", ascending=True),
            ["spend_c", "o_custkey"],
            rn_col="__rn",
        )
        return ranked.select(
            "o_custkey",
            ow.ntile_from_rank(F.col("__rn"), F.col("__n"), 5)
            .cast("long")
            .alias("quint"),
        ).transform(cut_lineage)

    q0 = quint_period(0).withColumnRenamed("quint", "from_quint")
    q1 = quint_period(1).withColumnRenamed("quint", "to_quint")
    m = q0.join(q1, "o_custkey")
    t = m.groupBy("from_quint").agg(F.count("*").cast("long").alias("n_from"))
    return (
        m.join(t, "from_quint")
        .groupBy("from_quint", "to_quint", "n_from")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "from_quint", "to_quint", "n",
            (
                F.col("n").cast("double") / F.col("n_from").cast("double")
            ).alias("p"),
        )
    )


@register(
    "a_wilson_ci",
    """
    WITH c AS (SELECT event_type,
                      CAST(count(DISTINCT (user_id, CAST(ts AS DATE)))
                           AS BIGINT) AS s
               FROM events GROUP BY 1),
    t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                   * CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n
          FROM events),
    p AS (SELECT c.event_type, c.s, t.n,
                 CAST(c.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS phat
          FROM c CROSS JOIN t)
    SELECT event_type, s, n, phat,
           (phat + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))
            - CAST(1.959963984540054 AS DOUBLE)
              * sqrt(phat * (1.0 - phat) / CAST(n AS DOUBLE)
                     + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE)
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           / (1.0 + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / CAST(n AS DOUBLE))
             AS wilson_lo,
           (phat + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))
            + CAST(1.959963984540054 AS DOUBLE)
              * sqrt(phat * (1.0 - phat) / CAST(n AS DOUBLE)
                     + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE)
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           / (1.0 + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / CAST(n AS DOUBLE))
             AS wilson_hi
    FROM p
    """,
)
def a_wilson_ci(spark, sf_dir):
    """Wilson score interval for each stream's user-day reach
    proportion: the binomial CI that stays inside [0,1] and behaves at
    extreme p where the Wald interval collapses (Wilson, JASA 1927 —
    what every A/B dashboard should use instead of ±1.96√(pq/n)).
    The z constant is an identical literal on both engines and CAST
    to DOUBLE in the oracle before the z·z product: a bare DuckDB
    decimal literal times itself stays DECIMAL, whose rounding can
    differ from the IEEE double product by 1 ULP (adversarial events
    sweep find, r12) — decimal·double promotes to double, so lone-z
    factors were already safe.  The interval is one shared sqrt chain
    over exact distinct counts."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    c = ev.groupBy("event_type").agg(
        F.countDistinct(F.col("user_id"), day).cast("long").alias("s")
    )
    t = ev.agg(
        (F.countDistinct("user_id") * F.countDistinct(day))
        .cast("long")
        .alias("n")
    )
    z = 1.959963984540054
    nd = F.col("n").cast("double")
    phat = F.col("s").cast("double") / nd
    half = z * F.sqrt(phat * (1.0 - phat) / nd + z * z / (4.0 * nd * nd))
    center = phat + z * z / (2.0 * nd)
    denom = 1.0 + z * z / nd
    return c.crossJoin(t).select(
        "event_type", "s", "n",
        phat.alias("phat"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


@register(
    "graph_rich_club",
    f"""
    {_minhash_pairs_cte()},
    e AS (SELECT id1 AS src, id2 AS dst FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
    deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS degree
            FROM e GROUP BY 1),
    rich AS (SELECT v FROM (
      SELECT v, row_number() OVER (ORDER BY degree DESC, v) AS rn FROM deg) t
      WHERE rn <= 20),
    re AS (SELECT p.id1, p.id2 FROM pairs p
           JOIN rich r1 ON r1.v = p.id1
           JOIN rich r2 ON r2.v = p.id2),
    k AS (SELECT CAST(count(*) AS BIGINT) AS n_rich FROM rich),
    m AS (SELECT CAST(count(*) AS BIGINT) AS e_rich FROM re)
    SELECT k.n_rich, m.e_rich,
           CAST(2 * m.e_rich AS DOUBLE)
             / CAST(k.n_rich * (k.n_rich - 1) AS DOUBLE) AS rich_club_coeff
    FROM k CROSS JOIN m
    """,
)
def graph_rich_club(spark, sf_dir):
    """Rich-club coefficient of the near-dup graph: edge density among
    the 20 highest-degree vertices, φ = 2E/(k(k−1)) (Colizza et al.,
    Nature Physics 2006) — hubs that also interconnect (φ → 1) signal
    one giant boilerplate cluster; hubs that don't (φ → 0) signal
    independent dup families.  The club is a distributed top-k on the
    degree table; counting club-internal edges is two semi-joins of
    the pair list against a 20-row set."""
    pairs = ldedup.minhash_lsh_pairs(
        _docs_with_dupes(spark, sf_dir),
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        min_parallelism=local_fanout(spark),
    ).persist()
    e = pairs.select(F.col("id1").alias("v")).unionAll(
        pairs.select(F.col("id2").alias("v"))
    )
    deg = e.groupBy("v").agg(F.count("*").cast("long").alias("degree"))
    rich = deg.orderBy(F.desc("degree"), "v").limit(20).select("v")
    re_ = pairs.join(
        rich.withColumnRenamed("v", "id1"), "id1"
    ).join(rich.withColumnRenamed("v", "id2"), "id2")
    k = rich.agg(F.count("*").cast("long").alias("n_rich"))
    m = re_.agg(F.count("*").cast("long").alias("e_rich"))
    return k.crossJoin(m).select(
        "n_rich", "e_rich",
        (
            (2 * F.col("e_rich")).cast("double")
            / (F.col("n_rich") * (F.col("n_rich") - 1)).cast("double")
        ).alias("rich_club_coeff"),
    )


# ---------------------------------------------------------------------------
# Round-7 continuation batch M: M4 downsampling, incident MTTR/MTBF,
# concentration ratios, Hampel robust anomaly filter.
# ---------------------------------------------------------------------------


@register(
    "w_m4_downsample",
    f"""
    WITH {_SQL_BARS},
    r AS (SELECT event_type, p,
                 CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                      AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM bars),
    b AS (SELECT event_type, p, rn,
                 CAST(floor(CAST((rn - 1) * 16 AS DOUBLE) / CAST(n AS DOUBLE))
                      AS BIGINT) AS bucket
          FROM r)
    SELECT event_type, bucket,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(min(p) AS BIGINT) AS min_v,
           CAST(max(p) AS BIGINT) AS max_v,
           CAST(min(rn * 1099511627776 + p + 549755813888) % 1099511627776
                - 549755813888 AS BIGINT) AS first_v,
           CAST(max(rn * 1099511627776 + p + 549755813888) % 1099511627776
                - 549755813888 AS BIGINT) AS last_v
    FROM b GROUP BY 1, 2
    """,
)
def w_m4_downsample(spark, sf_dir):
    """M4 time-series downsampling (Jugel et al., VLDB 2014): each of
    16 equal-width pixel buckets keeps exactly min/max/first/last —
    the four points that make the downsampled line pixel-identical to
    the full series, which is why every monitoring UI aggregates this
    way instead of striding.  First/last use the integer-encoded
    argmin/argmax (rn·2⁴⁰ + value+2³⁹ decodes to the boundary point's
    value via % 2⁴⁰, engine-exact).  DOMAIN BOUNDS (cf. w_aroon's 10⁷
    note): the payload p is the per-(event_type, day) cent-scaled sum
    — ~8.7·10⁴ at SF 0.001, linear in volume, so |p| < 2³⁹ ≈ 5.5·10¹¹
    holds to ~SF 6000; rn is the day-grain rank, so rn·2⁴⁰ < 2⁶³
    needs rn < 2²³ ≈ 8.4 M days (23 000 years of daily bars).  The
    old 10⁹/5·10⁸ encoding bled p into the rn digits near SF 6.  One
    hash aggregate per series, no sort beyond the day-grain rank."""
    bars = _bars(spark, sf_dir)
    wp = Window.partitionBy("event_type")
    r = bars.select(
        "event_type", "p",
        F.row_number().over(wp.orderBy("day")).cast("long").alias("rn"),
        F.count("*").over(wp).cast("long").alias("n"),
    )
    b = r.select(
        "event_type", "p", "rn",
        F.floor(
            ((F.col("rn") - 1) * 16).cast("double") / F.col("n").cast("double")
        )
        .cast("long")
        .alias("bucket"),
    )
    enc = F.col("rn") * 1099511627776 + F.col("p") + 549755813888
    return b.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("n_points"),
        F.min("p").cast("long").alias("min_v"),
        F.max("p").cast("long").alias("max_v"),
        (F.min(enc) % 1099511627776 - 549755813888)
        .cast("long")
        .alias("first_v"),
        (F.max(enc) % 1099511627776 - 549755813888)
        .cast("long")
        .alias("last_v"),
    )


@register(
    "ops_incident_mttr",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n_total,
                      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                               END) AS BIGINT) AS n_err
               FROM events GROUP BY 1),
    t AS (SELECT CAST(SUM(n_total) AS BIGINT) AS tot,
                 CAST(SUM(n_err) AS BIGINT) AS errs
          FROM d),
    f AS (SELECT d.day,
                 CASE WHEN CAST(d.n_err AS DOUBLE) / CAST(d.n_total AS DOUBLE)
                           > CAST(t.errs AS DOUBLE) / CAST(t.tot AS DOUBLE)
                      THEN 1 ELSE 0 END AS bad,
                 CAST(row_number() OVER (ORDER BY d.day) AS BIGINT) AS rn
          FROM d CROSS JOIN t),
    inc AS (SELECT rn - CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                     AS isl,
                   day
            FROM f WHERE bad = 1),
    ep AS (SELECT isl, CAST(count(*) AS BIGINT) AS dur,
                  CAST(min(day) AS DATE) AS start_day
           FROM inc GROUP BY 1),
    gaps AS (SELECT CAST(datediff('day',
                           lag(start_day) OVER (ORDER BY start_day),
                           start_day) AS BIGINT) AS gap
             FROM ep)
    SELECT CAST(count(*) AS BIGINT) AS n_incidents,
           CAST(SUM(ep.dur) AS BIGINT) AS total_incident_days,
           CAST(SUM(ep.dur) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mttr_days,
           CAST(max(ep.dur) AS BIGINT) AS worst_incident_days,
           CAST((SELECT CAST(SUM(gap) AS DOUBLE) / CAST(count(gap) AS DOUBLE)
                 FROM gaps) AS DOUBLE) AS mtbf_days
    FROM ep
    """,
)
def ops_incident_mttr(spark, sf_dir):
    """Incident MTTR/MTBF from the error-rate series: days whose
    error share exceeds the period mean form incidents via
    gaps-and-islands; MTTR = mean incident length, MTBF = mean
    start-to-start spacing — the two numbers every reliability review
    opens with (and the denominator of the availability SLA).
    Day-grain windows (the allowlisted bounded shape), exact integer
    counts, two divisions."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )
    t = d.agg(
        F.sum("n_total").cast("long").alias("tot"),
        F.sum("n_err").cast("long").alias("errs"),
    )
    rate = F.col("n_err").cast("double") / F.col("n_total").cast("double")
    base = F.col("errs").cast("double") / F.col("tot").cast("double")
    f = d.crossJoin(t).select(
        "day",
        F.when(rate > base, 1).otherwise(0).alias("bad"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("rn"),
    )
    inc = f.filter(F.col("bad") == 1).select(
        "day",
        (
            F.col("rn")
            - F.row_number().over(Window.orderBy("day")).cast("long")
        ).alias("isl"),
    )
    ep = inc.groupBy("isl").agg(
        F.count("*").cast("long").alias("dur"),
        F.min("day").alias("start_day"),
    )
    gaps = ep.select(
        F.datediff(
            F.col("start_day"),
            F.lag("start_day").over(Window.orderBy("start_day")),
        )
        .cast("long")
        .alias("gap")
    )
    g = gaps.agg(
        (
            F.sum("gap").cast("double") / F.count("gap").cast("double")
        ).alias("mtbf_days")
    )
    return ep.agg(
        F.count("*").cast("long").alias("n_incidents"),
        F.sum("dur").cast("long").alias("total_incident_days"),
        (F.sum("dur").cast("double") / F.count("*").cast("double")).alias(
            "mttr_days"
        ),
        F.max("dur").cast("long").alias("worst_incident_days"),
    ).crossJoin(g)


@register(
    "a_concentration_cr4",
    """
    WITH s AS (SELECT o_custkey,
                      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS spend_c
               FROM orders GROUP BY 1),
    t AS (SELECT CAST(SUM(spend_c) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS n_customers
          FROM s),
    top4 AS (SELECT CAST(SUM(spend_c) AS BIGINT) AS s4 FROM (
      SELECT spend_c FROM s ORDER BY spend_c DESC, o_custkey LIMIT 4) x),
    top8 AS (SELECT CAST(SUM(spend_c) AS BIGINT) AS s8 FROM (
      SELECT spend_c FROM s ORDER BY spend_c DESC, o_custkey LIMIT 8) x)
    SELECT t.n_customers, t.tot,
           CAST(top4.s4 AS DOUBLE) / CAST(t.tot AS DOUBLE) AS cr4,
           CAST(top8.s8 AS DOUBLE) / CAST(t.tot AS DOUBLE) AS cr8
    FROM t CROSS JOIN top4 CROSS JOIN top8
    """,
)
def a_concentration_cr4(spark, sf_dir):
    """CR4/CR8 concentration ratios — the top-4 and top-8 customer
    share of total revenue, the antitrust-style complement to the HHI
    scalar (a_hhi_concentration): CR4 > 0.4 is the classic
    oligopoly / key-account-risk flag.  Top-k picks are distributed
    TakeOrdered (orderBy().limit(k), never a global window); sums stay
    exact cents until the two closing divisions."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend_c")
    )
    t = s.agg(
        F.sum("spend_c").cast("long").alias("tot"),
        F.count("*").cast("long").alias("n_customers"),
    )

    def topk(k, alias):
        return (
            s.orderBy(F.desc("spend_c"), "o_custkey")
            .limit(k)
            .agg(F.sum("spend_c").cast("long").alias(alias))
        )

    return (
        t.crossJoin(topk(4, "s4"))
        .crossJoin(topk(8, "s8"))
        .select(
            "n_customers", "tot",
            (F.col("s4").cast("double") / F.col("tot").cast("double")).alias(
                "cr4"
            ),
            (F.col("s8").cast("double") / F.col("tot").cast("double")).alias(
                "cr8"
            ),
        )
    )


@register(
    "w_hampel_filter",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS x,
                      CAST(row_number() OVER (PARTITION BY event_type
                                              ORDER BY CAST(ts AS DATE))
                           AS BIGINT) AS rn
               FROM events GROUP BY 1, CAST(ts AS DATE)),
    fr AS (SELECT c.event_type, c.day AS cday, c.x AS cx, c.rn AS crn,
                  m.x AS fv, m.day AS fday
           FROM d c JOIN d m ON m.event_type = c.event_type
                            AND m.rn >= c.rn - 5 AND m.rn <= c.rn + 5),
    rk AS (SELECT a.event_type, a.cday, a.cx, a.fv, a.fday,
                  CAST(count(*) AS BIGINT) AS r,
                  CAST(max(nf.nf) AS BIGINT) AS nf
           FROM fr a
           JOIN fr b ON b.event_type = a.event_type AND b.cday = a.cday
                    AND (b.fv < a.fv OR (b.fv = a.fv AND b.fday <= a.fday))
           JOIN (SELECT event_type, cday, CAST(count(*) AS BIGINT) AS nf
                 FROM fr GROUP BY 1, 2) nf
             ON nf.event_type = a.event_type AND nf.cday = a.cday
           GROUP BY 1, 2, 3, 4, 5),
    med AS (SELECT event_type, cday, cx, fv AS med, nf
            FROM rk WHERE r = (nf + 1) // 2),
    dev AS (SELECT fr.event_type, fr.cday, med.cx, med.med, med.nf,
                   abs(fr.fv - med.med) AS dv, fr.fday
            FROM fr JOIN med ON med.event_type = fr.event_type
                            AND med.cday = fr.cday),
    drk AS (SELECT a.event_type, a.cday, a.cx, a.med, a.dv,
                   CAST(count(*) AS BIGINT) AS r,
                   CAST(max(a.nf) AS BIGINT) AS nf
            FROM dev a
            JOIN dev b ON b.event_type = a.event_type AND b.cday = a.cday
                      AND (b.dv < a.dv OR (b.dv = a.dv AND b.fday <= a.fday))
            GROUP BY 1, 2, 3, 4, 5, a.fday
            HAVING count(*) = (max(a.nf) + 1) // 2)
    SELECT event_type, cday AS day,
           CAST(cx AS DOUBLE) / 100.0 AS x,
           CAST(med AS DOUBLE) / 100.0 AS rolling_median,
           CAST(dv AS DOUBLE) / 100.0 AS mad,
           CAST(CASE WHEN dv = 0 THEN NULL
                     WHEN CAST(abs(cx - med) AS DOUBLE)
                          > 4.4478 * CAST(dv AS DOUBLE)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM drk
    """,
)
def w_hampel_filter(spark, sf_dir):
    """Hampel robust anomaly filter over each stream's daily total:
    flag days where |x − rolling_median| > 3·1.4826·MAD (the
    median-absolute-deviation consistency constant for Gaussian σ) —
    the outlier detector that, unlike w_anomaly_zscore, is NOT fooled
    by the outlier inflating its own threshold (breakdown point 50%
    vs 0%).  Both order statistics (frame median, then median of
    absolute deviations FROM that median) come from the rn-banded
    frame self-join + exact tuple-rank selection — rolling order
    statistics aren't windows, so the ±5-day frame join is the plan,
    bounded at 11 rows per center on the calendar day grain.  The
    4.4478 threshold is the identical literal on both engines.
    DEGENERATE-SCALE GUARD: when ≥6 of the 11 frame values are
    identical the MAD is 0 and any deviation would trip a zero
    threshold, so is_outlier is NULL (undecidable at zero robust
    scale) — identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("x")
    ).select(
        "event_type", "day", "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("rn"),
    ).persist()
    c, m = d.alias("c"), d.alias("m")
    fr = c.join(
        m,
        (F.col("m.event_type") == F.col("c.event_type"))
        & (F.col("m.rn") >= F.col("c.rn") - 5)
        & (F.col("m.rn") <= F.col("c.rn") + 5),
    ).select(
        F.col("c.event_type").alias("event_type"),
        F.col("c.day").alias("cday"),
        F.col("c.x").alias("cx"),
        F.col("m.x").alias("fv"),
        F.col("m.day").alias("fday"),
    ).persist()
    nf = fr.groupBy("event_type", "cday").agg(
        F.count("*").cast("long").alias("nf")
    )
    a, b = fr.alias("a"), fr.alias("b")
    rk = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.cday") == F.col("a.cday"))
            & (
                (F.col("b.fv") < F.col("a.fv"))
                | (
                    (F.col("b.fv") == F.col("a.fv"))
                    & (F.col("b.fday") <= F.col("a.fday"))
                )
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.cday").alias("cday"),
            F.col("a.cx").alias("cx"),
            F.col("a.fv").alias("fv"),
            F.col("a.fday").alias("fday"),
        )
        .agg(F.count("*").cast("long").alias("r"))
        .join(nf, ["event_type", "cday"])
    )
    med = rk.filter(
        F.col("r")
        == F.floor((F.col("nf") + 1).cast("double") / 2.0).cast("long")
    ).select("event_type", "cday", F.col("fv").alias("med"), "nf")
    dev = fr.join(med, ["event_type", "cday"]).select(
        "event_type", "cday", "cx", "med", "nf",
        F.abs(F.col("fv") - F.col("med")).alias("dv"),
        "fday",
    )
    da, db = dev.alias("a"), dev.alias("b")
    drk = (
        da.join(
            db,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.cday") == F.col("a.cday"))
            & (
                (F.col("b.dv") < F.col("a.dv"))
                | (
                    (F.col("b.dv") == F.col("a.dv"))
                    & (F.col("b.fday") <= F.col("a.fday"))
                )
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.cday").alias("cday"),
            F.col("a.cx").alias("cx"),
            F.col("a.med").alias("med"),
            F.col("a.dv").alias("dv"),
            F.col("a.fday").alias("fday"),
            F.col("a.nf").alias("nf"),
        )
        .agg(F.count("*").cast("long").alias("r"))
        .filter(
            F.col("r")
            == F.floor((F.col("nf") + 1).cast("double") / 2.0).cast("long")
        )
    )
    return drk.select(
        "event_type",
        F.col("cday").alias("day"),
        (F.col("cx").cast("double") / 100.0).alias("x"),
        (F.col("med").cast("double") / 100.0).alias("rolling_median"),
        (F.col("dv").cast("double") / 100.0).alias("mad"),
        F.when(F.col("dv") == 0, F.lit(None))
        .when(
            F.abs(F.col("cx") - F.col("med")).cast("double")
            > 4.4478 * F.col("dv").cast("double"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Round-8 batch N: isotonic regression (closed-form minimax), Page–
# Hinkley drift, classical k-sample tests (Cochran Q, Friedman,
# Kruskal–Wallis), 2-D skipping simulation, harmonic centrality.
# ---------------------------------------------------------------------------

# Shared day-grain series with JOIN-computed rank + inclusive prefix
# sum (D² pairs over the bounded calendar — no global window, so the
# lint allowlist stays untouched).
_SQL_DAYSERIES = """
    d AS (SELECT CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
    rk AS (SELECT a.day, a.y,
                  CAST(count(*) AS BIGINT) AS rn,
                  CAST(SUM(b.y) AS BIGINT) AS s
           FROM d a JOIN d b ON b.day <= a.day
           GROUP BY a.day, a.y)
"""


def _dayseries_rk(spark, sf_dir):
    """(day, y, rn, s): cent-scaled daily totals with 1-based day rank
    and INCLUSIVE prefix sum, built from a D² self-join over the
    bounded calendar instead of a global window."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("b.day") <= F.col("a.day"))
        .groupBy(F.col("a.day").alias("day"), F.col("a.y").alias("y"))
        .agg(
            F.count("*").cast("long").alias("rn"),
            F.sum("b.y").cast("long").alias("s"),
        )
    )


@register(
    "a_isotonic_pava",
    f"""
    WITH {_SQL_DAYSERIES},
    m AS (SELECT j.rn AS jr, k.rn AS kr,
                 CAST(k.s - j.s + j.y AS DOUBLE)
                   / CAST(k.rn - j.rn + 1 AS DOUBLE) AS mn
          FROM rk j JOIN rk k ON j.rn <= k.rn),
    inner_min AS (SELECT m.jr, i.rn AS ir, i.day, i.y,
                         min(m.mn) AS lo
                  FROM m JOIN rk i ON i.rn >= m.jr AND i.rn <= m.kr
                  GROUP BY 1, 2, 3, 4)
    SELECT day, CAST(y AS DOUBLE) / 100.0 AS x,
           max(lo) / 100.0 AS fitted
    FROM inner_min GROUP BY day, y
    """,
)
def a_isotonic_pava(spark, sf_dir):
    """Isotonic (monotone non-decreasing) regression of the daily
    value total — the PAVA fit, computed by the CLOSED-FORM minimax
    identity instead of the sequential pool-adjacent-violators loop:
    ĝ(i) = max_{j≤i} min_{k≥i} mean(y_j..y_k) (Ayer et al., Ann.
    Math. Stat. 1955; Robertson–Wright–Dykstra 1988 eq. 1.9–1.13).
    Every mean is ONE IEEE division of exact prefix-sum integers, so
    both engines produce bit-identical doubles and min/max pick
    identical values — no iteration, no float accumulation.  COST
    ENVELOPE: the (j,i,k) tri-grid is D³/6 over the bounded calendar
    day grain (D=31 → ~5 000 rows; D=365 → ~8 M — still one shuffle);
    for multi-YEAR grains use the O(D) sequential PAVA on a collected
    series instead, the closed form exists for its all-relational,
    engine-exact parity."""
    rk = _dayseries_rk(spark, sf_dir)
    j, k, i = rk.alias("j"), rk.alias("k"), rk.alias("i")
    m = j.join(k, F.col("j.rn") <= F.col("k.rn")).select(
        F.col("j.rn").alias("jr"),
        F.col("k.rn").alias("kr"),
        (
            (F.col("k.s") - F.col("j.s") + F.col("j.y")).cast("double")
            / (F.col("k.rn") - F.col("j.rn") + 1).cast("double")
        ).alias("mn"),
    )
    inner = (
        m.join(
            i,
            (F.col("i.rn") >= F.col("jr")) & (F.col("i.rn") <= F.col("kr")),
        )
        .groupBy(
            F.col("jr"),
            F.col("i.rn").alias("ir"),
            F.col("i.day").alias("day"),
            F.col("i.y").alias("y"),
        )
        .agg(F.min("mn").alias("lo"))
    )
    return inner.groupBy("day", "y").agg(F.max("lo").alias("mx")).select(
        "day",
        (F.col("y").cast("double") / 100.0).alias("x"),
        (F.col("mx") / 100.0).alias("fitted"),
    )


@register(
    "w_page_hinkley_drift",
    f"""
    WITH {_SQL_DAYSERIES},
    tot AS (SELECT CAST(max(rn) AS BIGINT) AS nd,
                   CAST(SUM(y) AS BIGINT) AS sn
            FROM rk),
    ph AS (SELECT rk.day, rk.rn, tot.nd,
                  CAST(tot.nd * rk.s
                       - rk.rn * (tot.sn + 50 * tot.nd) AS BIGINT) AS ph_i
           FROM rk CROSS JOIN tot),
    runmin AS (SELECT a.day, a.nd, a.ph_i,
                      CAST(min(b.ph_i) AS BIGINT) AS m_i
               FROM ph a JOIN ph b ON b.rn <= a.rn
               GROUP BY 1, 2, 3)
    SELECT day,
           CAST(ph_i AS DOUBLE) / CAST(nd * 100 AS DOUBLE) AS ph,
           CAST(ph_i - m_i AS DOUBLE) / CAST(nd * 100 AS DOUBLE) AS ph_gap,
           CAST(CASE WHEN ph_i - m_i > 500 * nd * 100 THEN 1 ELSE 0 END
                AS BIGINT) AS drift_flag
    FROM runmin
    """,
)
def w_page_hinkley_drift(spark, sf_dir):
    """Page–Hinkley mean-shift drift detector over the daily value
    total (Page, Biometrika 1954; the streaming-drift standard in
    MOA/river): PH_T = Σ_{t≤T}(y_t − ȳ − δ), alarm when PH_T −
    min_{s≤T} PH_s exceeds λ.  Kept ENGINE-EXACT by scaling through
    the day count: D·PH_T = D·S_T − T·(S_D + δ·D) is pure int64 (δ =
    50 cents, λ = 500·D·100 in the scaled domain), the running min is
    a D² self-join over the bounded calendar, and the reported ph /
    ph_gap are single divisions at the end.  OVERFLOW BOUND: D·S_T ≤
    D²·(daily cent total) ≈ 4·10¹¹ at SF 1 on the 30-day fixture —
    int64-safe past SF 10⁶."""
    rk = _dayseries_rk(spark, sf_dir)
    # S_D = Σ y (NOT max(s): the prefix sum is only monotone when every
    # daily total is nonnegative — refunds would silently skew max(s)).
    tot = rk.agg(
        F.max("rn").cast("long").alias("nd"),
        F.sum("y").cast("long").alias("sn"),
    )
    ph = rk.crossJoin(tot).select(
        "day", "rn", "nd",
        (
            F.col("nd") * F.col("s")
            - F.col("rn") * (F.col("sn") + 50 * F.col("nd"))
        )
        .cast("long")
        .alias("ph_i"),
    )
    a, b = ph.alias("a"), ph.alias("b")
    runmin = (
        a.join(b, F.col("b.rn") <= F.col("a.rn"))
        .groupBy(
            F.col("a.day").alias("day"),
            F.col("a.nd").alias("nd"),
            F.col("a.ph_i").alias("ph_i"),
        )
        .agg(F.min("b.ph_i").cast("long").alias("m_i"))
    )
    scale = (F.col("nd") * 100).cast("double")
    return runmin.select(
        "day",
        (F.col("ph_i").cast("double") / scale).alias("ph"),
        ((F.col("ph_i") - F.col("m_i")).cast("double") / scale).alias("ph_gap"),
        F.when(
            F.col("ph_i") - F.col("m_i") > 500 * F.col("nd") * 100, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("drift_flag"),
    )


@register(
    "a_cochran_q",
    """
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events
               WHERE value > 150),
    k AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM u),
    r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ri FROM u GROUP BY 1),
    c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cj FROM u GROUP BY 1),
    s AS (SELECT CAST(SUM(cj) AS BIGINT) AS n,
                 CAST(SUM(cj * cj) AS BIGINT) AS sc2
          FROM c),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(SUM(ri * ri) AS BIGINT) AS sr2
          FROM r)
    SELECT k.k, t.n_users, s.n AS n_marks,
           CAST((k.k - 1) * (k.k * s.sc2 - s.n * s.n) AS DOUBLE)
             / CAST(k.k * s.n - t.sr2 AS DOUBLE) AS q_stat
    FROM k CROSS JOIN s CROSS JOIN t
    WHERE k.k * s.n - t.sr2 > 0
    """,
)
def a_cochran_q(spark, sf_dir):
    """Cochran's Q test (Biometrika 1950) — the k-treatment extension
    of McNemar: does the SHARE of users exhibiting each event type
    differ across types, treating each user as their own matched
    block?  Q = (k−1)(k·ΣC_j² − N²)/(k·N − ΣR_i²) over the binary
    user×type incidence relation — column totals C_j, row totals R_i,
    N = ΣC_j = ΣR_i.  The incidence is 'user exhibited a HIGH-VALUE
    (> 150) event of the type' — raw presence saturates (every user
    shows every type, R_i ≡ k, denominator 0, Q undefined), the
    thresholded mark varies.  Entirely sparse (the DISTINCT presence
    pairs;
    absent cells never materialize) and entirely int64 (ΣC_j² ≤
    k·|users|² stays in range past 10⁸ users); the statistic is one
    division at the end.  Under H₀, Q ~ χ²(k−1)."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("value") > 150)
        .select("user_id", "event_type")
        .distinct()
    )
    k = u.agg(F.countDistinct("event_type").cast("long").alias("k"))
    r = u.groupBy("user_id").agg(F.count("*").cast("long").alias("ri"))
    c = u.groupBy("event_type").agg(F.count("*").cast("long").alias("cj"))
    s = c.agg(
        F.sum("cj").cast("long").alias("n"),
        F.sum(F.col("cj") * F.col("cj")).cast("long").alias("sc2"),
    )
    t = r.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.col("ri") * F.col("ri")).cast("long").alias("sr2"),
    )
    return (
        k.crossJoin(s)
        .crossJoin(t)
        .filter(F.col("k") * F.col("n") - F.col("sr2") > 0)
        .select(
            "k",
            "n_users",
            F.col("n").alias("n_marks"),
            (
                (
                    (F.col("k") - 1)
                    * (F.col("k") * F.col("sc2") - F.col("n") * F.col("n"))
                ).cast("double")
                / (F.col("k") * F.col("n") - F.col("sr2")).cast("double")
            ).alias("q_stat"),
        )
    )


@register(
    "a_friedman_test",
    """
    WITH ty AS (SELECT DISTINCT event_type FROM events),
    us AS (SELECT DISTINCT user_id FROM events),
    cnt AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
    grid AS (SELECT us.user_id, ty.event_type,
                    COALESCE(cnt.c, 0) AS c
             FROM us CROSS JOIN ty
             LEFT JOIN cnt ON cnt.user_id = us.user_id
                          AND cnt.event_type = ty.event_type),
    rk AS (SELECT user_id, event_type,
                  CAST(2 * rank() OVER (PARTITION BY user_id ORDER BY c)
                       + count(*) OVER (PARTITION BY user_id, c) - 1
                       AS BIGINT) AS r2
           FROM grid),
    rs AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_sum
           FROM rk GROUP BY 1),
    dims AS (SELECT CAST(count(*) AS BIGINT) AS n FROM us),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
    q AS (SELECT CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS sr22 FROM rs)
    SELECT kk.k, dims.n AS n_blocks,
           CAST(3 * q.sr22 AS DOUBLE)
             / CAST(dims.n * kk.k * (kk.k + 1) AS DOUBLE)
             - CAST(3 * dims.n * (kk.k + 1) AS DOUBLE) AS chi2_f
    FROM kk CROSS JOIN dims CROSS JOIN q
    WHERE dims.n > 0 AND kk.k > 1
    """,
)
def a_friedman_test(spark, sf_dir):
    """Friedman rank test (JASA 1937) — the nonparametric repeated-
    measures ANOVA: within each user (block), rank the k event types
    by activity count, then test whether the per-type rank sums
    diverge.  Blocks are COMPLETED by a bounded |users|×k grid (k =
    distinct types, an explode not a blow-up — absent cells are true
    zeros of the count measure).  Midrank ties stay exact via the
    doubled-rank integers 2·rank + ties − 1 (the a_mannwhitney_u
    identity, here per-block), so ΣR²ⱼ is pure int64 (R2 ≤ 2nk keeps
    the square in range to n ≈ 3·10⁸ blocks) and
    χ²_F = 3·ΣR2²/(nk(k+1)) − 3n(k+1) is a single float chain.  Tie
    correction deliberately omitted (classic uncorrected form; both
    engines agree identically)."""
    ev = load_table(spark, sf_dir, "events")
    ty = ev.select("event_type").distinct()
    us = ev.select("user_id").distinct()
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    grid = (
        us.crossJoin(ty)
        .join(cnt, ["user_id", "event_type"], "left")
        .select(
            "user_id", "event_type", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    wr = Window.partitionBy("user_id").orderBy("c")
    wt = Window.partitionBy("user_id", "c")
    rk = grid.select(
        "event_type",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1)
        .cast("long")
        .alias("r2"),
    )
    rs = rk.groupBy("event_type").agg(F.sum("r2").cast("long").alias("r2_sum"))
    dims = us.agg(F.count("*").cast("long").alias("n"))
    kk = ty.agg(F.count("*").cast("long").alias("k"))
    q = rs.agg(
        F.sum(F.col("r2_sum") * F.col("r2_sum")).cast("long").alias("sr22")
    )
    return (
        kk.crossJoin(dims)
        .crossJoin(q)
        .filter((F.col("n") > 0) & (F.col("k") > 1))
        .select(
            "k",
            F.col("n").alias("n_blocks"),
            (
                (3 * F.col("sr22")).cast("double")
                / (F.col("n") * F.col("k") * (F.col("k") + 1)).cast("double")
                - (3 * F.col("n") * (F.col("k") + 1)).cast("double")
            ).alias("chi2_f"),
        )
    )


@register(
    "a_kruskal_wallis",
    """
    WITH obs AS (SELECT user_id, event_type,
                        CAST(count(*) AS BIGINT) AS x
                 FROM events GROUP BY 1, 2),
    vc AS (SELECT x, CAST(count(*) AS BIGINT) AS t FROM obs GROUP BY 1),
    cum AS (SELECT a.x, a.t, CAST(SUM(b.t) - a.t AS BIGINT) AS p
            FROM vc a JOIN vc b ON b.x <= a.x
            GROUP BY a.x, a.t),
    gv AS (SELECT o.event_type, o.x, CAST(count(*) AS BIGINT) AS ng_x
           FROM obs o GROUP BY 1, 2),
    r2 AS (SELECT gv.event_type,
                  CAST(SUM(gv.ng_x * (2 * cum.p + cum.t + 1)) AS BIGINT)
                    AS r2_g,
                  CAST(SUM(gv.ng_x) AS BIGINT) AS n_g
           FROM gv JOIN cum ON cum.x = gv.x
           GROUP BY 1),
    terms AS (SELECT CAST(SUM(CAST(floor(CAST(r2_g AS DOUBLE)
                                         * CAST(r2_g AS DOUBLE)
                                         / CAST(n_g AS DOUBLE) * 100.0)
                                   AS BIGINT)) AS BIGINT) AS s_term,
                     CAST(SUM(n_g) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS k
              FROM r2)
    SELECT k, n,
           CAST(3 * s_term AS DOUBLE)
             / CAST(100 AS DOUBLE)
             / CAST(n * (n + 1) AS DOUBLE)
             - CAST(3 * (n + 1) AS DOUBLE) AS h_stat
    FROM terms WHERE k > 1
    """,
)
def a_kruskal_wallis(spark, sf_dir):
    """Kruskal–Wallis H test (JASA 1952) — the k-group rank ANOVA
    over per-(user, event_type) activity counts, groups = event
    types.  The rank machinery is the a_mannwhitney_u per-value-count
    collapse: every observation with value x carries doubled midrank
    2p + t + 1 (p = #smaller, t = #ties), so group rank sums R2_g are
    exact int64 from a |distinct x|-sized table (the cumulative is a
    V² self-join over the small count-value domain — no global sort).
    The cross-group reduction Σ R_g²/n_g has data-dependent
    denominators, so each group's term is floor-scaled to int64
    (×100, the dsum discipline) before the k-row sum; H =
    3·Σterm/100/(N(N+1)) − 3(N+1) is then one float chain.  Tie
    correction omitted (classic form, identical on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("x")
    )
    vc = obs.groupBy("x").agg(F.count("*").cast("long").alias("t"))
    a, b = vc.alias("a"), vc.alias("b")
    cum = (
        a.join(b, F.col("b.x") <= F.col("a.x"))
        .groupBy(F.col("a.x").alias("x"), F.col("a.t").alias("t"))
        .agg(F.sum("b.t").cast("long").alias("ct"))
        .select("x", "t", (F.col("ct") - F.col("t")).cast("long").alias("p"))
    )
    gv = obs.groupBy("event_type", "x").agg(
        F.count("*").cast("long").alias("ng_x")
    )
    r2 = (
        gv.join(cum, "x")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("ng_x") * (2 * F.col("p") + F.col("t") + 1))
            .cast("long")
            .alias("r2_g"),
            F.sum("ng_x").cast("long").alias("n_g"),
        )
    )
    term = F.floor(
        F.col("r2_g").cast("double")
        * F.col("r2_g").cast("double")
        / F.col("n_g").cast("double")
        * 100.0
    ).cast("long")
    terms = r2.agg(
        F.sum(term).cast("long").alias("s_term"),
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    return terms.filter(F.col("k") > 1).select(
        "k", "n",
        (
            (3 * F.col("s_term")).cast("double")
            / F.lit(100).cast("double")
            / (F.col("n") * (F.col("n") + 1)).cast("double")
            - (3 * (F.col("n") + 1)).cast("double")
        ).alias("h_stat"),
    )
