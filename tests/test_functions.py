"""Unit tests for the scalar/text/vector column libraries."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from dicomdb_spark.functions import scalars, text, vectors


def one(spark, col, **data):
    df = spark.createDataFrame([Row(**data)])
    return df.select(col.alias("out")).collect()[0].out


def test_alpha_num_str(spark):
    cases = {
        "Céline/Dupont  (épreuve)": "Celine_Dupont_epreuve",
        "__already__clean__": "already_clean",
        "µ-test ôï": "m_test_oi",
    }
    for src, want in cases.items():
        assert one(spark, scalars.alpha_num_str("s"), s=src) == want


def test_ta_seconds(spark):
    # reference semantics (Exam_info.py:1470-1487)
    assert one(spark, scalars.ta_seconds("s"), s="TA 03:50") == 230
    assert one(spark, scalars.ta_seconds("s"), s="TA 03:50*3") == 690
    assert one(spark, scalars.ta_seconds("s"), s="TA 02.30") == 180  # dotted → mm+1
    assert one(spark, scalars.ta_seconds("s"), s="TA 02.30*2") == 360
    assert one(spark, scalars.ta_seconds("s"), s="garbage") is None


def test_time_arith(spark):
    assert one(spark, scalars.time_str_to_sec("s"), s="132501") == 13 * 3600 + 25 * 60 + 1
    roll = scalars.duration_with_rollover(F.lit(86390), F.lit(5))
    assert one(spark, roll, s="x") == 15
    assert one(spark, scalars.ceil_minutes(F.lit(61)), s="x") == 2


def test_prefix_code_and_classify(spark):
    rid = scalars.prefix_code("s", [("Verio", 19), ("TrioTim", 1), ("SIGNA", 29)])
    assert one(spark, rid, s="Verio_dx") == 19
    assert one(spark, rid, s="SIGNA PET/MR") == 29
    assert one(spark, rid, s="unknown") == 0
    seq = scalars.classify_contains("s", [("ep_b", "DWI"), ("epfid", "EPI"), ("tfl3d", "MPRAGE")])
    assert one(spark, seq, s="xx_ep_b_123") == "DWI"
    # first-match-wins: ep_b wins over epfid when both present
    assert one(spark, seq, s="ep_b_epfid") == "DWI"
    assert one(spark, seq, s="nothing") == "to_be_defined"


def test_float_tolerant_eq(spark):
    assert one(spark, scalars.float_tolerant_eq(F.lit(2.4600000001), 2.46), s="x")
    assert not one(spark, scalars.float_tolerant_eq(F.lit(2.461), 2.46), s="x")


def test_text_tokens_and_ratios(spark):
    assert one(spark, text.token_count("s"), s="  a  b   c ") == 3
    assert one(spark, text.token_count("s"), s="") == 0
    assert one(spark, text.punct_ratio("s"), s="ab,.") == pytest.approx(0.5)
    assert one(spark, text.stopword_ratio("s"), s="the dog and cat") == pytest.approx(0.5)
    q = one(spark, text.quality_score("s"), s="the quick brown fox is here")
    assert 0.0 <= q <= 1.0


def test_lang_id(spark):
    assert one(spark, text.lang_id("s"), s="the cat of the house and a dog") == "en"
    assert one(spark, text.lang_id("s"), s="el perro de la casa que ladra") == "es"
    assert one(spark, text.lang_id("s"), s="zzz qqq") == "und"


def test_fingerprint_order_insensitive(spark):
    a = one(spark, text.fingerprint("s"), s="alpha beta gamma")
    b = one(spark, text.fingerprint("s"), s="gamma ALPHA beta alpha")
    assert a == b


def test_shingles(spark):
    sh = one(spark, text.shingles("s", 3), s="A b c d")
    assert sh == ["a b c", "b c d"]
    assert one(spark, text.shingles("s", 3), s="a b") == []


def test_vector_math(spark):
    d = one(spark, vectors.dot(F.lit([1.0, 2.0]).cast("array<double>"), F.lit([3.0, 4.0]).cast("array<double>")), s="x")
    assert d == pytest.approx(11.0)
    n = one(spark, vectors.norm2(F.lit([3.0, 4.0]).cast("array<double>")), s="x")
    assert n == pytest.approx(5.0)
    c = one(
        spark,
        vectors.cosine(
            F.lit([1.0, 0.0]).cast("array<double>"), F.lit([1.0, 0.0]).cast("array<double>")
        ),
        s="x",
    )
    assert c == pytest.approx(1.0)
    z = one(
        spark,
        vectors.cosine(
            F.lit([0.0, 0.0]).cast("array<double>"), F.lit([1.0, 0.0]).cast("array<double>")
        ),
        s="x",
    )
    assert z is None


def test_time_str_to_sec_malformed_is_null(spark):
    # ANSI mode: malformed header strings must yield NULL, not fail
    assert one(spark, scalars.time_str_to_sec("s"), s="garbage") is None
    assert one(spark, scalars.time_str_to_sec("s"), s="") is None
    assert one(spark, scalars.time_str_to_sec("s"), s="120000.123") == 12 * 3600


def test_bpe_merge_application(spark):
    """Merge-table application: rank order, word-boundary isolation,
    and overlapping chains converging within the configured passes."""
    from pyspark.sql import functions as F
    from dicomdb_spark.functions import text as T

    rows = spark.range(1).select(
        T.bpe_token_count(F.lit("the thin quest")).alias("a"),
        # 'atatat': (a,t) applies at 3 overlapping sites -> at at at
        T.bpe_token_count(F.lit("atatat"), merges=(("a", "t"),)).alias("b"),
        # boundary: 'a t' as two words must NOT merge
        T.bpe_token_count(F.lit("a t"), merges=(("a", "t"),)).alias("c"),
        T.bpe_symbol_stream(F.lit("and")).alias("s"),
    ).collect()[0]
    assert rows.a == 5          # the | th in | que st
    assert rows.b == 3          # at at at
    assert rows.c == 2          # a | t untouched across the gap
    assert rows.s.split() == ["and"]  # (a,n)+(an,d) chain to one symbol


def test_repetition_stats(spark):
    """Gopher repetition signals on a pathological doc vs a clean one."""
    from pyspark.sql import functions as F
    from dicomdb_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here differ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.asDict() for r in
           df.select("doc_id", *T.repetition_stats("text")).collect()}
    assert out[1]["dup_2gram_frac"] == 2 / 3  # 3 bigrams, 1 distinct
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["mean_word_len"] == (3 + 5 + 4 + 6) / 4


def test_pii_redact_order_and_counts(spark):
    """Emails must be masked before IPs (an email's dotted domain must
    not leak as an IP hit), and all three kinds redact in one pass."""
    from dicomdb_spark.functions.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a1.b2@host3.example.org now"),
            (2, "server 192.168.254.1 and +33 123-4567"),
            (3, "no pii here at all"),
        ],
        ["id", "text"],
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *pii_counts("text"), pii_redact("text").alias("red")
        ).collect()
    }
    assert rows[1]["n_email"] == 1 and rows[1]["red"] == "mail <EMAIL> now"
    assert rows[2]["n_ip"] == 1 and rows[2]["n_phone"] == 1
    assert rows[2]["red"] == "server <IP> and <PHONE>"
    assert rows[3]["red"] == "no pii here at all"


def test_c4_line_rules(spark):
    """Each C4 rule fires independently: short lines, missing terminal
    punctuation, blocklist words, and page-level drops."""
    from dicomdb_spark.functions.text import c4_clean_lines, c4_page_dropped
    from pyspark.sql import functions as F

    page = "\n".join(
        [
            "this line has enough words to survive.",
            "too short.",
            "this one has no terminal punctuation at all",
            "please enable JavaScript to continue reading this.",
            'another good line ends with a quote here."',
        ]
    )
    df = spark.createDataFrame([(page,), ("lorem ipsum dolor sit amet page.",)], ["page"])
    out = df.select(
        c4_clean_lines("page").alias("kept"), c4_page_dropped("page").alias("dropped")
    ).collect()
    assert out[0]["dropped"] is False
    assert out[0]["kept"] == [
        "this line has enough words to survive.",
        'another good line ends with a quote here."',
    ]
    assert out[1]["dropped"] is True


def test_chunk_documents_coverage(spark):
    """Chunks tile the document: starts step by stride, every char of
    the text appears in some chunk, and overlap is chunk_size-stride."""
    from dicomdb_spark.llm.corpus import chunk_documents

    txt = "abcdefghij" * 25  # 250 chars
    df = spark.createDataFrame([(7, txt), (8, "short")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_size=120, stride=90).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c7 = sorted(by_doc[7], key=lambda r: r["chunk_idx"])
    assert [r["chunk_start"] for r in c7] == [1, 91, 181]
    reassembled = c7[0]["chunk"] + "".join(r["chunk"][30:] for r in c7[1:])
    assert reassembled == txt
    for a, b in zip(c7, c7[1:]):
        assert a["chunk"][90:] == b["chunk"][:30]  # 30-char overlap
    assert by_doc[8][0]["chunk"] == "short" and len(by_doc[8]) == 1
