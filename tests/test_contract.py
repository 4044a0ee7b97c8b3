"""Driver-contract sanity: entry(), queries()/oracle_sql() invariants."""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

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


def test_modified_since_proven_fronted():
    """Standing invariant (VERDICT r12 #6): proven-at-some-HEAD is not
    proven-at-this-HEAD.  Any @register body edited since
    PROVEN_AT_COMMIT (the code state the driver last proved) must be
    fronted in MODIFIED_SINCE_PROVEN so the next driver window
    re-proves it; engine-module edits must be acknowledged in
    ENGINE_MODULES_ACK with fronted representative queries.  Runs
    against the WORKING TREE, so the suite catches an un-fronted edit
    before it is even committed."""
    import subprocess

    from dicomdb_spark.registry import QUERIES, DRIVER_PROVEN
    from dicomdb_spark.registry._proven import (
        ENGINE_MODULES_ACK,
        MODIFIED_SINCE_PROVEN,
        PROVEN_AT_COMMIT,
    )

    repo = Path(__file__).resolve().parents[1]
    probe = subprocess.run(
        ["git", "cat-file", "-e", f"{PROVEN_AT_COMMIT}^{{commit}}"],
        cwd=repo, capture_output=True,
    )
    if probe.returncode != 0:
        pytest.skip("PROVEN_AT_COMMIT unavailable (no git or shallow checkout)")

    run = subprocess.run(
        [sys.executable, str(repo / "tools_modified_queries.py"), PROVEN_AT_COMMIT],
        cwd=repo, capture_output=True, text=True, check=True,
    )
    derived = {ln.strip() for ln in run.stdout.splitlines() if ln.strip()}
    changed_modules = {
        m.group(1)
        for ln in run.stderr.splitlines()
        if (m := re.match(r"#\s+(dicomdb_spark/\S+)", ln))
    }

    # unproven queries front automatically; everything else touched
    # must be listed explicitly
    fronted = set(MODIFIED_SINCE_PROVEN) | (set(QUERIES) - set(DRIVER_PROVEN))
    unfronted = derived - fronted
    assert not unfronted, (
        f"registry bodies edited since {PROVEN_AT_COMMIT[:9]} but not in "
        f"MODIFIED_SINCE_PROVEN (registry/_proven.py): {sorted(unfronted)}"
    )

    # _proven.py is this bookkeeping mechanism itself — window order
    # only, no query semantics
    exempt = {"dicomdb_spark/registry/_proven.py"}
    unacked = changed_modules - exempt - set(ENGINE_MODULES_ACK)
    assert not unacked, (
        f"engine modules edited since {PROVEN_AT_COMMIT[:9]} but not "
        f"acknowledged in ENGINE_MODULES_ACK: {sorted(unacked)}"
    )
    for path, names in ENGINE_MODULES_ACK.items():
        stale = set(names) - fronted
        assert not stale, f"ENGINE_MODULES_ACK[{path}] lists un-fronted {sorted(stale)}"
        assert set(names) <= set(QUERIES), f"ENGINE_MODULES_ACK[{path}] has unknown names"


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
