"""Skew handling: salted repartition / salted aggregation for hot keys
(north_rule: hot-conversation skew).

AQE's skew-join splitting is the first line of defense (enabled in
session.py); explicit salting is for aggregations and for joins whose
build side can be replicated. Pattern:

    salted two-phase aggregate:
      phase 1: groupBy(key, salt) partial agg   (splits a hot key over
               n_salts reducers)
      phase 2: groupBy(key) final agg           (tiny: n_salts rows/key)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def salt_column(n_salts: int = DEFAULT_SALTS, *cols: str) -> Column:
    """Deterministic per-row salt (hash of all cols mod n) — reproducible
    runs, unlike rand()-based salting."""
    basis = [F.col(c) for c in cols] if cols else [F.monotonically_increasing_id()]
    return F.pmod(F.xxhash64(*basis), F.lit(n_salts)).alias("__salt")


def salted_count(
    df: DataFrame, keys: list[str], n_salts: int = DEFAULT_SALTS,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """groupBy(keys).count() that survives a hot key: two-phase with an
    explicit salt. Result is identical to the naive count."""
    order_cols = order_cols or keys
    salted = df.withColumn("__salt", salt_column(n_salts, *order_cols))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("count"))


def replicate_broadcast_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Skew-proof equi join: salt the fact side, replicate the (small)
    dim across all salt values, join on (key, salt). With a broadcast
    dim the salt is redundant (no shuffle at all) — this is the pattern
    for when the dim exceeds the broadcast threshold and a sort-merge
    join would put an entire hot key in one reducer."""
    salted_fact = fact.withColumn("__salt", salt_column(n_salts, key))
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted_fact.join(replicated, [key, "__salt"], "left")
    return joined.drop("__salt")