"""Driver-contract sanity: entry(), queries()/oracle_sql() invariants."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from dicomdb_spark.operators.joins import merge_classify


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema.fields) >= 3


def test_registry_invariants():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle key exists as a query; non-oracle queries are the
    # explicitly-flagged pandas-UDF ops
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == {
        "u3_stack_assembly",
        "multimodal_decode",
        "s3_header_parse",
        "multimodal_features",
        "multimodal_ann",
    }
    # names are stable identifiers (driver uses them as filenames/keys)
    assert all(n.replace("_", "").isalnum() for n in qs)


def test_queries_order_unproven_first():
    # if the driver caps its per-round correctness window, entries
    # without a round-1 driver row must be inside it
    from dicomdb_spark.registry import QUERIES, R1_DRIVER_PROVEN

    names = list(entry_mod.queries())
    assert set(names) == set(QUERIES)
    n_unproven = len(QUERIES) - len(set(R1_DRIVER_PROVEN) & set(QUERIES))
    head = names[:n_unproven]
    assert set(head) & set(R1_DRIVER_PROVEN) == set()


def test_merge_classify_self_is_noop(spark):
    """S7 idempotence: classifying a table against itself must produce
    only noops — the property that makes at-least-once redelivery safe
    (Cenir_DB.py:79-101)."""
    from dicomdb_spark.io import load_table

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = merge_classify(
        cust,
        cust,
        keys=["c_custkey"],
        compare_cols=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        float_cols=["c_acctbal"],
    )
    assert out.filter(out.action != "noop").count() == 0
