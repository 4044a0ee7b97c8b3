"""Skew-mitigation utilities — the hot-key strategy at 100 TB.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime.  These helpers cover the two places AQE can't:

* **skewed aggregation** — a single hot group key (one protocol name
  over half the archive) serializes into one reducer.  ``salted_agg``
  does the classic two-phase aggregate: hash-partial on (key, salt),
  then final on key.  Works for any algebraic aggregate.
* **skewed join against a dimension too big to broadcast** —
  ``replicated_salted_join`` salts the fact side and replicates the
  dimension side per salt, turning one hot partition into ``salts``
  even ones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from the row (crc32 of a stable id
    would also work); random salts would break retries/determinism."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: (key, salt) partial → key final.

    ``aggs``: (fn, col, alias) with fn ∈ {count, sum, min, max}.
    count/sum recombine by sum; min/max by themselves.  (Spark's own
    partial aggregation already does this map-side; explicit salting
    additionally splits a hot REDUCER key across ``salts`` tasks.)
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for fn, col, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            # col "*" = row count (NULLs included), matching SQL
            # count(*); a named col keeps count(col) skip-null semantics
            cexpr = F.count(F.lit(1)) if col == "*" else F.count(col)
            partial_exprs.append(cexpr.alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"unsupported agg fn: {fn}")
    salted = with_salt(df, salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def replicated_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side salted and the dim side replicated
    ``salts`` times, co-keyed on (join keys, salt).  Output equals the
    plain join; the hot key's rows spread over ``salts`` partitions.
    """
    f = with_salt(fact, salts)
    d = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = f.join(d, [*on, "__salt"], how)
    return out.drop("__salt")
