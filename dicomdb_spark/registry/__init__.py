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

Round-10 note: this package is the mechanical split of the former
31k-line registry.py monolith (judge ask).  Chunks q01..q08 (split) and q09+ (new rounds) hold
the @register bodies in their ORIGINAL order; _core holds the
shared QUERIES/ORACLES dicts and helpers; _proven holds the
driver-proven ledger and ordered_queries().  The loop below
re-exports every module-level name so ``dicomdb_spark.registry``
presents the exact namespace the monolith did.
"""
from dicomdb_spark.registry import _core
from dicomdb_spark.registry import q01
from dicomdb_spark.registry import q02
from dicomdb_spark.registry import q03
from dicomdb_spark.registry import q04
from dicomdb_spark.registry import q05
from dicomdb_spark.registry import q06
from dicomdb_spark.registry import q07
from dicomdb_spark.registry import q08
from dicomdb_spark.registry import q09
from dicomdb_spark.registry import _proven

for _m in (_core, q01, q02, q03, q04, q05, q06, q07, q08, q09, _proven):
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith('__')}
    )
del _m
