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
    # round 4: every registered query now carries a DuckDB oracle
    assert set(qs) - set(os_) == set()
    # names are stable identifiers (driver uses them as filenames/keys)
    assert all(n.replace("_", "").isalnum() for n in qs)


def test_queries_order_unproven_first():
    # if the driver caps its per-round correctness window, entries
    # without a round-1 driver row must be inside it
    from dicomdb_spark.registry import QUERIES, DRIVER_PROVEN

    names = list(entry_mod.queries())
    assert set(names) == set(QUERIES)
    # ledger hygiene: a typo'd or stale proven name would silently
    # shrink the effective ledger and re-front an already-proven query
    assert len(DRIVER_PROVEN) == len(set(DRIVER_PROVEN)), "duplicate ledger entry"
    assert set(DRIVER_PROVEN) <= set(QUERIES), (
        f"proven-but-unregistered: {sorted(set(DRIVER_PROVEN) - set(QUERIES))}"
    )
    n_unproven = len(QUERIES) - len(set(DRIVER_PROVEN) & set(QUERIES))
    head = names[:n_unproven]
    assert set(head) & set(DRIVER_PROVEN) == set()


_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
}

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}


def test_oracle_dtype_parity(spark):
    """The driver hashes values by repr after a pandas round-trip, so a
    DuckDB HUGEINT (SUM of BIGINT) that fetchdf() coerces to float64
    hash-mismatches an identical Spark int64 (17.0 vs 17).  Guard: every
    oracle output column's declared DuckDB type must map to the same
    repr class (int/float/str/bool/date/ts) as the Spark schema — and
    HUGEINT/DECIMAL/unsigned types are banned outright.

    Cheap: Spark schemas are lazy (no execution), DuckDB uses LIMIT 0.
    """
    import duckdb

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    problems = []
    for name, sql in os_.items():
        duck = {
            c: t
            for c, t, *_ in con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0"
            ).fetchall()
        }
        sdf = qs[name](spark, "/root/testdata/sf0.001")
        sparkt = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        if set(duck) != set(sparkt):
            problems.append((name, "column-set", sorted(duck), sorted(sparkt)))
            continue
        for col, dt in duck.items():
            if dt not in _DUCK_CLASS:
                problems.append((name, col, f"banned duckdb type {dt}"))
            elif _DUCK_CLASS[dt] != _SPARK_CLASS.get(sparkt[col], sparkt[col]):
                problems.append(
                    (name, col, f"duckdb {dt} vs spark {sparkt[col]}")
                )
    assert not problems, problems


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
