"""Text-analysis column library for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` expressions over a string column —
JVM-side, codegen'd, linear per row, embarrassingly parallel at 100 TB
(no shuffle at all for per-document scores).  Each has an exact ANSI
SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic (public common function words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty strings removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count of word-chunks + digits + punct.

    The regex splits words into ≤4-char chunks the way byte-pair
    vocabularies tend to: ``\\w{1,4}`` pieces plus isolated
    non-word/non-space marks.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"(\w{1,4}|[^\w\s])"), 1))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-word, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    mean of three clamped signals: length (chars/500 capped at 1),
    1 − punctuation ratio, and stopword ratio scaled ×3 capped at 1 —
    the standard cheap pre-filter shape for web-scraped corpora.
    """
    length_sig = F.least(char_count(col) / F.lit(500.0), F.lit(1.0))
    punct_sig = F.lit(1.0) - punct_ratio(col)
    sw_sig = F.least(stopword_ratio(col) * 3.0, F.lit(1.0))
    return (length_sig + punct_sig + sw_sig) / 3.0


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signals(col: Column | str) -> list[Column]:
    """Gopher-style document-quality signals (Rae et al. 2021,
    "Scaling Language Models: … Gopher", App. A — public method) as
    pure Catalyst expressions: per-row, shuffle-free, 100 TB-safe.

    Emitted columns: n_words, mean_word_len, symbol_ratio (#/… per
    word), bullet_ratio and ellipsis_ratio (per line), alpha_ratio
    (words containing a letter), n_stop (hits in the 8-word Gopher
    stopword list), and the combined gopher_pass boolean.  Every
    ratio is one IEEE double division of the SAME integer pair on
    both engines, so the DuckDB twin matches bit-for-bit.
    """
    toks = tokens(col)
    c = F.col(col) if isinstance(col, str) else col
    n_words = F.size(toks)
    char_sum = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_word_len = F.when(n_words > 0, char_sum / n_words).otherwise(F.lit(0.0))
    n_symbols = _substr_count(c, "#") + _substr_count(c, "…")
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$")))
    bullet_ratio = n_bullet / n_lines
    ellipsis_ratio = n_ellipsis / n_lines
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n_words > 0, n_alpha / n_words).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_ratio < 0.9)
        & (ellipsis_ratio < 0.3)
        & (alpha_ratio > 0.8)
        & (n_stop >= 2)
    )
    return [
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.alias("n_stop"),
        gopher_pass.alias("gopher_pass"),
    ]


def gopher_sql(text_expr: str = "text") -> str:
    """DuckDB twin of :func:`gopher_signals` — select-list fragment."""
    toks = (
        rf"list_filter(string_split_regex(trim({text_expr}), '\s+'), t -> t <> '')"
    )
    sw = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    lines = f"string_split({text_expr}, chr(10))"
    n_words = f"len({toks})"
    char_sum = f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS BIGINT)"
    n_symbols = (
        f"((length({text_expr}) - length(replace({text_expr}, '#', '')))"
        f" + (length({text_expr}) - length(replace({text_expr}, '…', ''))))"
    )
    return f"""
           {n_words} AS n_words,
           CASE WHEN {n_words} > 0
             THEN {char_sum} / {n_words} ELSE 0.0 END AS mean_word_len,
           CASE WHEN {n_words} > 0
             THEN {n_symbols} / {n_words} ELSE 0.0 END AS symbol_ratio,
           len(list_filter({lines}, l -> regexp_matches(l, '^\\s*[-*•]')))
             / len({lines}) AS bullet_ratio,
           len(list_filter({lines}, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
             / len({lines}) AS ellipsis_ratio,
           CASE WHEN {n_words} > 0
             THEN len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))
                  / {n_words} ELSE 0.0 END AS alpha_ratio,
           len(list_filter({toks}, t -> list_contains([{sw}], lower(t))))
             AS n_stop,
           ({n_words} >= 50 AND {n_words} <= 100000
            AND (CASE WHEN {n_words} > 0
                 THEN {char_sum} / {n_words} ELSE 0.0 END) >= 3.0
            AND (CASE WHEN {n_words} > 0
                 THEN {char_sum} / {n_words} ELSE 0.0 END) <= 10.0
            AND (CASE WHEN {n_words} > 0
                 THEN {n_symbols} / {n_words} ELSE 0.0 END) < 0.1
            AND len(list_filter({lines}, l -> regexp_matches(l, '^\\s*[-*•]')))
                / len({lines}) < 0.9
            AND len(list_filter({lines}, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                / len({lines}) < 0.3
            AND (CASE WHEN {n_words} > 0
                 THEN len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))
                      / {n_words} ELSE 0.0 END) > 0.8
            AND len(list_filter({toks}, t -> list_contains([{sw}], lower(t)))) >= 2)
             AS gopher_pass
    """


_PHONETIC_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_PHONETIC_TO = "01230120022455012623010202"


def phonetic_key(col: Column | str) -> Column:
    """Soundex-style phonetic blocking key (Russell 1918 — public
    method), engine-portable variant: first letter + first 3 digit
    classes of the remainder, adjacent duplicate classes collapsed,
    vowel class dropped, zero-padded.

    Simplifications vs archival Soundex, applied IDENTICALLY on both
    engines (this is a blocking key, not a genealogy standard): the
    H/W separator rule is omitted, and collapsing happens before the
    vowel-class drop, so consonants separated by a vowel keep their
    distinct digits.  Collapsing uses two passes of fixed
    ``replace(dd→d)`` per class — RE2 (DuckDB) has no backreferences,
    so the regex '(.)\\1+' route would not replay; two passes
    collapse any run ≤ 4, beyond any real word's repeat run.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(c)
    first = F.substring(u, 1, 1)
    rest = F.substring(F.translate(u, _PHONETIC_FROM, _PHONETIC_TO), 2, 1000)
    for _ in range(2):
        for d in "0123456":
            rest = F.replace(rest, F.lit(d + d), F.lit(d))
    rest = F.replace(rest, F.lit("0"), F.lit(""))
    return F.concat(first, F.rpad(F.substring(rest, 1, 3), 3, "0"))


def phonetic_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`phonetic_key`."""
    rest = f"substr(translate(upper({expr}), '{_PHONETIC_FROM}', '{_PHONETIC_TO}'), 2)"
    for _ in range(2):
        for d in "0123456":
            rest = f"replace({rest}, '{d}{d}', '{d}')"
    rest = f"replace({rest}, '0', '')"
    return f"substr(upper({expr}), 1, 1) || rpad(substr({rest}, 1, 3), 3, '0')"


def lang_scores(toks: Column) -> Column:
    """Per-language marker-token counts (sorted code order) as one
    array<int> — each count expression appears exactly once, so a
    caller that materializes ``toks`` (and this array) in stacked
    projections evaluates every filter once per row."""
    def count_for(markers):
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    return F.array(
        *[
            count_for(F.array(*[F.lit(m) for m in LANG_MARKERS[code]]))
            for code in sorted(LANG_MARKERS)  # deterministic order
        ]
    )


def lang_pick(counts: Column) -> Column:
    """Winner rule over a ``lang_scores``-shaped counts array: highest
    count wins, ties broken by code order, all-zero → 'und' — exactly
    the strictly-greater fold the original when-chain implemented."""
    codes = F.array(*[F.lit(c) for c in sorted(LANG_MARKERS)])
    mx = F.array_max(counts)
    return F.when(mx <= 0, F.lit("und")).otherwise(
        F.element_at(codes, F.array_position(counts, mx).cast("int"))
    )


def lang_id(col: Column | str) -> Column:
    """Marker-token language heuristic → language code or 'und'.

    Counts per-language marker tokens; highest count wins, ties broken
    by language-code order (deterministic).  A real system swaps in a
    character-n-gram model; the operator shape (pure per-row column
    expressions, no shuffle) is identical.

    r13 optimization (guide §1/§4): the original winner fold chained
    ``when(n > best, ...)`` per language; interpreted CASE evaluates
    its scrutinee AND one branch, so each level re-evaluated the
    previous level's expression up to twice — ~2⁵ evaluations of the
    first language's filter (and its tokenization) per row.  The fold
    is now an array argmax (lang_scores + lang_pick): no exponential
    chain; hot callers additionally materialize the token and counts
    arrays in stacked projections so each is evaluated once."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    return lang_pick(lang_scores(toks))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct lowercase tokens.

    Collapses token order and repetition — the classic "key collision"
    fingerprint for clustering near-identical documents.  md5 is
    portable across Spark and DuckDB (unlike xxhash64).
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.array_join(
        F.array_sort(F.array_distinct(F.transform(tokens(c), lambda t: F.lower(t)))),
        " ",
    )
    return F.md5(norm)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles → array<string> (for MinHash / Jaccard).

    Built from ``slice`` + ``zip_with`` folds: the token array is only
    referenced as a top-level argument (evaluated once per reference),
    never inside a lambda body.  Higher-order lambdas are interpreted
    without common-subexpression elimination, so an ``element_at(toks,
    i)`` formulation would re-tokenize the document once per element —
    quadratic per row.  This version is linear.
    """
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    m = F.size(toks) - (n - 1)  # number of shingles
    acc = F.slice(toks, 1, F.greatest(m, F.lit(0)))
    for j in range(1, n):
        nxt = F.slice(toks, j + 1, F.greatest(m, F.lit(0)))
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return acc


# character n-gram profiles (public, tiny): the classic cheap lang-ID
# signal — counts of frequent character trigrams per language
CHAR_NGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "he "),
    "es": ("de ", "la ", "os ", "que", "ar "),
    "fr": ("le ", "es ", "ent", "eur", "que"),
    "de": ("der", "sch", "ein", "ich", "und"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _substr_count(col: Column, needle: str) -> Column:
    """Non-overlapping substring occurrences — split-based, portable
    (DuckDB twin: len(string_split(text, needle)) - 1)."""
    import re as _re

    return F.size(F.split(col, _re.escape(needle), -1)) - 1


def lang_scores_ngram(lowered: Column) -> Column:
    """Per-language char-n-gram hit totals (sorted code order) as one
    array — the lang_id_ngram sibling of ``lang_scores``; ``lowered``
    should be a materialized ``lower(text)`` attribute."""
    cols = []
    for code in sorted(CHAR_NGRAM_PROFILES):
        n = None
        for ng in CHAR_NGRAM_PROFILES[code]:
            t = _substr_count(lowered, ng)
            n = t if n is None else n + t
        cols.append(n)
    return F.array(*cols)


def lang_pick_ngram(counts: Column) -> Column:
    """Winner rule over ``lang_scores_ngram`` counts (same
    strictly-greater fold semantics as lang_pick)."""
    codes = F.array(*[F.lit(c) for c in sorted(CHAR_NGRAM_PROFILES)])
    mx = F.array_max(counts)
    return F.when(mx <= 0, F.lit("und")).otherwise(
        F.element_at(codes, F.array_position(counts, mx).cast("int"))
    )


def lang_id_ngram(col: Column | str) -> Column:
    """Language ID from character-n-gram profile hits → code or 'und'.

    Same winner rule as lang_id: first language (code order) reaching
    the maximum score; 'und' when no profile n-gram occurs at all.
    (Array-argmax form — see lang_id's r13 note; the when-chain fold
    re-evaluated earlier levels exponentially under interpreted CASE.)
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return lang_pick_ngram(lang_scores_ngram(c))


def rolling_hash(col: Column | str, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the document's characters
    (Rabin–Karp shape): fold (acc·B + code) mod M, seeded with the
    first character's codepoint — the document-fingerprint primitive
    for incremental / chunk-level dedup.

    Portable: DuckDB twin is ``list_reduce`` over codepoints with the
    same seed rule (its reduce uses the first element as the initial
    accumulator, so we mirror that exactly).  Empty strings hash to -1.
    """
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(
        F.filter(F.split(c, ""), lambda ch: ch != ""),
        lambda ch: F.ascii(ch).cast("long"),
    )
    folded = F.aggregate(
        F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0))),
        F.element_at(codes, 1),
        lambda acc, v: (acc * base + v) % mod,
    )
    return F.coalesce(folded, F.lit(-1).cast("long"))


# A small public-domain-style merge table (frequent English pairs) —
# stands in for a learned BPE vocabulary; the OPERATOR is the point:
# merge application is pure string algebra, so it runs JVM-side in
# whole-stage codegen with an identical DuckDB replay.
DEFAULT_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("s", "t"),
    ("e", "n"), ("o", "r"), ("l", "e"), ("c", "o"), ("a", "l"),
    ("q", "u"), ("qu", "e"), ("in", "g"),
)


def bpe_symbol_stream(col: Column | str, merges=DEFAULT_BPE_MERGES, passes: int = 3) -> Column:
    """Apply a BPE merge table to a document, returning the space-
    separated symbol stream.

    Classic separator encoding: lowercase, collapse whitespace, then
    put every character in its own single-space-delimited slot (the
    original space character keeps a slot too, so its neighborhood has
    double spaces and merges can never cross a word boundary).  Each
    merge ``(a, b)`` in rank order is ``replace(' a b ' -> ' ab ')`` —
    plain non-overlapping left-to-right replace, available identically
    in Spark and DuckDB, so the oracle replays bit-for-bit.  A single
    scan merges alternate members of an overlapping chain
    (``a b a b a b``), so each merge is applied ``passes`` times
    (covers chains up to 2^passes).

    Everything stays inside whole-stage codegen: no UDF, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    s = F.regexp_replace(s, "(.)", "$1 ")
    s = F.concat(F.lit(" "), s)
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        for _ in range(passes):
            s = F.replace(s, pat, rep)
    return s


def bpe_token_count(col: Column | str, merges=DEFAULT_BPE_MERGES, passes: int = 3) -> Column:
    """Exact token count under the given BPE merge table = number of
    symbols left in the merged stream (space slots excluded by the
    whitespace split)."""
    return F.size(tokens(bpe_symbol_stream(col, merges, passes)))


def bpe_sql(expr: str, merges=DEFAULT_BPE_MERGES, passes: int = 3) -> str:
    """DuckDB twin of bpe_symbol_stream over SQL expression ``expr``."""
    s = f"' ' || regexp_replace(regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g'), '(.)', '\\1 ', 'g')"
    for a, b in merges:
        for _ in range(passes):
            s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return s


def repetition_stats(col: Column | str) -> list[Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "massive-text" filter family), map-only: mean word length and the
    duplicated 2-/3-gram occurrence fractions.

    All per-document array algebra — no explode, no shuffle; the
    fraction is (total − distinct)/total computed in ints first so the
    single final division is the only float op (portable).

    r13 optimization (guide §1/§4): higher-order expressions run
    interpreted with NO common-subexpression elimination, so a single
    projection in which each dup fraction references its shingle
    array twice re-tokenized and re-built the n-grams once per
    reference (~2× the whole map stage).  The arrays are therefore
    materialized ONCE in a stacked projection (CollapseProject keeps
    multiply-referenced non-cheap aliases separate) and the returned
    columns only reference those attributes.  Callers select
    ``*repetition_stats_cols()`` over ``with_repetition_arrays(df,
    col)``; the legacy one-shot list form remains for single-column
    use."""
    toks, s2, s3 = (
        F.transform(tokens(col), lambda t: F.lower(t)),
        shingles(col, 2),
        shingles(col, 3),
    )
    return _repetition_from_arrays(toks, s2, s3)


def with_repetition_arrays(df, col: Column | str, keep: list[str] | None = None):
    """Materialize the token / 2-gram / 3-gram arrays once (stacked
    projection), so the stats columns evaluate each array exactly
    once.  ``keep`` lists the pass-through columns (default: all)."""
    cols = keep if keep is not None else df.columns
    return df.select(
        *cols,
        F.transform(tokens(col), lambda t: F.lower(t)).alias("__rep_tk"),
        shingles(col, 2).alias("__rep_s2"),
        shingles(col, 3).alias("__rep_s3"),
    )


def repetition_stats_cols() -> list[Column]:
    """Stats columns over the arrays produced by
    ``with_repetition_arrays`` — each array attribute is evaluated
    once per row no matter how many times it is referenced."""
    return _repetition_from_arrays(
        F.col("__rep_tk"), F.col("__rep_s2"), F.col("__rep_s3")
    )


def _repetition_from_arrays(
    toks: Column, s2: Column, s3: Column
) -> list[Column]:
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_word_len = F.when(n == 0, F.lit(0.0)).otherwise(sum_len / n)

    def dup_frac(ngrams: Column) -> Column:
        total = F.size(ngrams)
        return F.when(total == 0, F.lit(0.0)).otherwise(
            (total - F.size(F.array_distinct(ngrams))) / total
        )

    return [
        n.alias("n_tokens"),
        mean_word_len.cast("double").alias("mean_word_len"),
        dup_frac(s2).cast("double").alias("dup_2gram_frac"),
        dup_frac(s3).cast("double").alias("dup_3gram_frac"),
    ]


# --- PII detection / redaction ------------------------------------------
# Pattern dialect note: kept to the regex intersection of Java
# (Spark's engine) and RE2 (DuckDB's engine) — character classes,
# bounded repetition, \b word boundaries; no backreferences, no
# lookaround.  Both engines use leftmost-first submatch semantics for
# these constructs, so extract/replace agree bit-for-bit.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    "phone": r"\+\d{1,2} \d{3}-\d{4}",
}


def pii_counts(col: Column | str) -> list[Column]:
    """Per-kind PII hit counts — map-only regexp_extract_all sizes."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]


def pii_redact(col: Column | str) -> Column:
    """Replace every PII span with a typed placeholder token.

    Order matters: emails first (an email contains dots that the IP
    pattern must never see), then IPs, then phones.  Pure chained
    regexp_replace — whole-stage codegen, no UDF, no shuffle; the
    shape a 100 TB redaction pass needs (map-only, scales linearly)."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in ("email", "ip", "phone"):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def pii_sql(expr: str) -> str:
    """DuckDB twin of pii_redact (note the explicit 'g' flag — DuckDB
    replaces only the first match by default, Spark replaces all)."""
    s = expr
    for kind in ("email", "ip", "phone"):
        pat = PII_PATTERNS[kind].replace("'", "''")
        s = f"regexp_replace({s}, '{pat}', '<{kind.upper()}>', 'g')"
    return s


# --- C4-style line-level cleaning ---------------------------------------
C4_LINE_MIN_WORDS = 5
C4_LINE_BLOCKLIST = ("javascript", "cookie")
C4_PAGE_BLOCKLIST = ("lorem ipsum", "{")


def c4_keep_line(line: Column) -> Column:
    """The C4 per-line keep rule (Raffel et al. 2020 §2.2): at least
    5 words, terminal punctuation, and no boilerplate marker words."""
    keep = (F.size(F.split(line, " ")) >= C4_LINE_MIN_WORDS) & line.rlike(
        '[.!?"]$'
    )
    for marker in C4_LINE_BLOCKLIST:
        keep = keep & ~F.lower(line).contains(marker)
    return keep


def c4_clean_lines(page: Column | str) -> Column:
    """Filter a newline-joined page down to its kept lines (array).

    Per-row array algebra — the whole C4 line pass is map-only with no
    explode and no shuffle, so it costs one scan at any corpus size."""
    p = F.col(page) if isinstance(page, str) else page
    return F.filter(F.split(p, "\n"), c4_keep_line)


def c4_page_dropped(page: Column | str) -> Column:
    """Page-level drop rule: curly brace (code) or 'lorem ipsum'."""
    p = F.col(page) if isinstance(page, str) else page
    dropped = F.lit(False)
    for marker in C4_PAGE_BLOCKLIST:
        dropped = dropped | F.lower(p).contains(marker)
    return dropped
