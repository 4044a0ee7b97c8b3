"""Local twin of the driver's correctness gate.

For every (query, oracle) pair: run the Spark query and the DuckDB SQL
at sf0.01, normalize (columns sorted by name, rows sorted by all
values), and compare values exactly.  This is intentionally *stricter*
than a tolerance check — the engine's queries are designed for
bitwise determinism (see registry.py docstring).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from dicomdb_spark.registry import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name, then rows by stringified values."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            elif isinstance(v, (list, tuple)):
                v = repr(list(v))
            else:
                v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [c for _, c in sorted(zip(range(len(columns)), columns), key=lambda p: columns[p[0]])], out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = duck_con()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {sorted(spark_cols)} vs {sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    _, s_norm = normalize(spark_rows, spark_cols)
    _, d_norm = normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first diffs: {mismatches[:3]}"


def test_all_queries_have_oracles_or_are_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops are allowed to miss an oracle; keep the
    # list explicit so nothing goes missing silently
    allowed_missing = set()
    assert missing <= allowed_missing, f"queries without oracle: {missing}"
