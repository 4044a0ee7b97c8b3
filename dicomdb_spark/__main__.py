"""CLI — the engine's counterpart of the reference's entry points.

The reference shipped as command-line tools (do_dicom_series_DB.py,
do_dicom.py, do_results_DB.py) with optparse flags including a
``-t/--test_db`` dry-run that logged intended writes without executing
(Cenir_DB.py:62,86,123; SURVEY §5.1).  Equivalent surface:

    python -m dicomdb_spark list
    python -m dicomdb_spark query a1_dup_customer_day --sf-dir ... [-n 20]
    python -m dicomdb_spark import --input-dir TREE [--test] [--proto-reg RX]
    python -m dicomdb_spark bench

``import --test`` is the dry run: it prints the insert/update/noop
classification counts and a sample of rendered upsert SQL instead of
writing anywhere.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from dicomdb_spark.session import get_spark

    return get_spark(app_name="dicomdb_spark_cli")


def cmd_list(_args) -> int:
    from dicomdb_spark.registry import ORACLES, QUERIES

    for name in sorted(QUERIES):
        kind = "oracle" if name in ORACLES else "rows-only"
        print(f"{name}\t{kind}")
    return 0


def cmd_query(args) -> int:
    from dicomdb_spark.registry import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    spark = _spark()
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


def cmd_import(args) -> int:
    from pyspark.sql import functions as F

    from dicomdb_spark import pipeline
    from dicomdb_spark.sources.dicom import synthetic_parser
    from dicomdb_spark.sources.jdbc import render_upsert_sql

    spark = _spark()
    # default = the built-in Part-10 reader; --synthetic keeps the
    # deterministic fake for non-DICOM fixture trees
    parser = synthetic_parser if getattr(args, "synthetic", False) else None
    headers = pipeline.extract_headers(
        spark, args.input_dir, parser=parser, proto_reg=args.proto_reg
    )
    serie = pipeline.build_serie_frame(headers)
    exams = pipeline.build_exam_frame(serie)
    exam_cols = ["EUID", "AcquisitionDate", "n_series", "ExamDuration"]
    new = exams.select(*exam_cols)
    # no live DB in this environment: the "existing" snapshot is empty
    existing = spark.createDataFrame([], new.schema)
    classified = pipeline.classify_against_db(
        new, existing, keys=["EUID"], compare_cols=exam_cols[1:]
    )
    counts = {
        r["action"]: r["count"]
        for r in classified.groupBy("action").count().collect()
    }
    print(json.dumps({"exams": counts, "series": serie.count()}))
    if args.test:
        # dry run (reference -t/--test_db): show intended statements
        for row in classified.filter(F.col("action") != "noop").limit(3).collect():
            rec = {k: v for k, v in row.asDict().items() if k != "action"}
            print("DRY-RUN:", render_upsert_sql("exam", rec, ["EUID"])[:120])
    return 0


def cmd_sql(args) -> int:
    from dicomdb_spark.io import register_views

    spark = _spark()
    register_views(spark, args.sf_dir)
    spark.sql(args.statement).show(args.limit, truncate=False)
    return 0


def cmd_bench(_args) -> int:
    import bench  # repo-root harness

    bench.main()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dicomdb_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list").set_defaults(fn=cmd_list)
    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", "--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true")
    q.set_defaults(fn=cmd_query)
    imp = sub.add_parser("import")
    imp.add_argument("--input-dir", required=True)
    imp.add_argument("--proto-reg", default=".*")
    imp.add_argument("-t", "--test", action="store_true", help="dry run")
    imp.add_argument(
        "--synthetic", action="store_true",
        help="use the deterministic fake parser (non-DICOM fixture trees)",
    )
    imp.set_defaults(fn=cmd_import)
    sq = sub.add_parser("sql")
    sq.add_argument("statement")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sq.add_argument("-n", "--limit", type=int, default=20)
    sq.set_defaults(fn=cmd_sql)
    sub.add_parser("bench").set_defaults(fn=cmd_bench)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
