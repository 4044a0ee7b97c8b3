"""S4 xlsx review-sheet source: pure-stdlib OOXML reader round-trip
(reference semantics: common.py:507-531 readxls_relecture_files)."""

from __future__ import annotations

import zipfile
from io import BytesIO

from dicomdb_spark.sources import xlsx


REVIEW_ROWS = [
    ["proto", "examdate", "sujname", "comment"],  # header, skipped
    ["PROTO_A", 2024.0, "subj01", "ok good scan"],
    ["PROTO_A", 2024.0, "subj02", None],  # subject but not reviewed -> flagged
    ["PROTO_B", "2023-05-01", "subj03", "motion artefact"],
    [None, None, None, None],  # fully empty row -> ignored
]


def test_review_round_trip():
    data = xlsx.write_xlsx({"relecture": REVIEW_ROWS})
    reviewed, flagged = xlsx.read_review_rows(data)
    assert [r["sujname"] for r in reviewed] == ["subj01", "subj03"]
    # numeric exam-date cell reads back canonically, no trailing .0
    assert reviewed[0]["examdate"] == "2024"
    assert reviewed[1]["examdate"] == "2023-05-01"
    assert flagged == [{"sheet": "relecture", "row": 3, "sujname": "subj02"}]


def test_multi_sheet_and_sparse_rows():
    data = xlsx.write_xlsx(
        {
            "s1": [["h"] * 4, ["p1", 1, "a", "c1"]],
            "s2": [["h"] * 4, [None, None, None, "comment-only"], ["p2", 2, "b", "c2"]],
        }
    )
    reviewed, _ = xlsx.read_review_rows(data)
    assert [(r["proto"], r["comment"]) for r in reviewed] == [
        ("p1", "c1"),
        (None, "comment-only"),
        ("p2", "c2"),
    ]


def test_shared_strings_and_rich_text():
    """Real-world files use the shared-string table (t=\"s\") and
    rich-text runs; the writer emits inlineStr only, so build that
    container shape by hand."""
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>PROTO_X</t></si>"
        "<si><r><t>sub</t></r><r><t>j09</t></r></si>"
        "<si><t>rich comment</t></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2"><v>20240115</v></c>'
        '<c r="C2" t="s"><v>1</v></c><c r="D2" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    base = xlsx.write_xlsx({"s": [["h"]]})
    buf = BytesIO()
    with zipfile.ZipFile(BytesIO(base)) as zin, zipfile.ZipFile(buf, "w") as zout:
        for name in zin.namelist():
            if name == "xl/worksheets/sheet1.xml":
                zout.writestr(name, sheet)
            else:
                zout.writestr(name, zin.read(name))
        zout.writestr("xl/sharedStrings.xml", shared)
    reviewed, _ = xlsx.read_review_rows(buf.getvalue())
    assert reviewed == [
        {
            "proto": "PROTO_X",
            "examdate": "20240115",
            "sujname": "subj09",
            "comment": "rich comment",
        }
    ]


def test_spark_source(spark, tmp_path):
    p = tmp_path / "review.xlsx"
    p.write_bytes(xlsx.write_xlsx({"relecture": REVIEW_ROWS}))
    df = xlsx.read_review_sheet(spark, str(p))
    assert df.columns == ["proto", "examdate", "sujname", "comment"]
    rows = sorted((r.sujname, r.comment) for r in df.collect())
    assert rows == [("subj01", "ok good scan"), ("subj03", "motion artefact")]


def test_r10_end_to_end_from_xlsx(spark, tmp_path):
    """The full R10 shape on a REAL xlsx file: sheet -> (eid, pname)
    lookup -> merge_classify update class (do_dicom.py:642-681)."""
    from pyspark.sql import functions as F
    from dicomdb_spark.operators import joins as oj

    p = tmp_path / "relecture.xlsx"
    p.write_bytes(
        xlsx.write_xlsx(
            {
                "s": [
                    ["proto", "examdate", "sujname", "comment"],
                    ["E1", 2024, "alice", "ok"],
                    ["E9", 2024, "ghost", "ok"],  # no matching exam
                ]
            }
        )
    )
    sheet = xlsx.read_review_sheet(spark, str(p)).select(
        F.col("proto").alias("eid"), F.col("sujname").alias("pname")
    )
    exam = spark.createDataFrame(
        [(1, "E1", "alice"), (2, "E1", "bob"), (3, "E2", "alice")],
        "crid long, eid string, pname string",
    )
    existing = exam.select("crid", F.lit(0).alias("relu"))
    matched = F.col("__m").isNotNull()
    incoming = exam.join(
        sheet.withColumn("__m", F.lit(1)), ["eid", "pname"], "left_outer"
    ).select("crid", F.when(matched, F.lit(1)).otherwise(F.lit(0)).alias("relu"))
    out = oj.merge_classify(existing, incoming, keys=["crid"], compare_cols=["relu"])
    actions = {r.crid: r.action for r in out.collect()}
    assert actions == {1: "update", 2: "noop", 3: "noop"}
    missing = sheet.join(exam, ["eid", "pname"], "left_anti")
    assert [(r.eid, r.pname) for r in missing.collect()] == [("E9", "ghost")]
