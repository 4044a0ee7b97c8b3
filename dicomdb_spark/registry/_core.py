"""Query registry: every SURVEY.md §2 operator as a named, oracle-checked query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) ->
DataFrame`` with an ANSI-SQL twin that DuckDB runs over the same
parquet tables.  The driver hash-compares the two at sf0.01
(row-count + schema + order-insensitive value hash) — so every query
here is written for *bitwise* determinism:

* double sums go through DECIMAL casts (see ``aggregates.dsum``),
* rankings always carry a unique tiebreak column,
* timestamps are TIMESTAMP_NTZ micros on both engines (io.py),
* double→int conversions use explicit ``floor`` (Spark casts truncate,
  DuckDB casts round — never rely on the implicit behavior).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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


def _fanout(spark):
    """Composable form of the session-level local_fanout policy: a
    DataFrame.transform that repartitions for local small-file fan-out
    and is the identity on a cluster master."""
    n = local_fanout(spark)
    return lambda df: df.repartition(n) if n else df


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# SQL fragment helpers for the oracle side -------------------------------
def _dsum(expr: str, alias: str) -> str:
    """DuckDB twin of aggregates.dsum — exact floor-integer sum, double out."""
    return f"CAST(SUM(CAST(floor(({expr}) * 10000) AS BIGINT)) / 10000.0 AS DOUBLE) AS {alias}"


