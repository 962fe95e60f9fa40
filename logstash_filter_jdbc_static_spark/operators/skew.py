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

def skew_robust_row_number(
    df: DataFrame,
    part_col: str,
    order_col: str,
    bucket_width: int = 100_000,
    out_col: str = "rn",
) -> DataFrame:
    """``row_number() over (partition by part_col order by order_col)``
    that survives a hot partition key.

    The naive window hash-partitions by ``part_col``: a conversation
    holding 3% of a 10^12-turn table becomes ONE task sorting 3x10^10
    rows. Here the window runs over ``(part_col, bucket)`` where
    ``bucket = order_col / bucket_width`` — a RANGE bucket, so bucket
    order == order_col order across buckets and per-bucket local ranks
    compose exactly: rank = local_rank + sum(counts of earlier buckets).
    The offset table is tiny (one row per non-empty bucket) and its
    running sum is the only per-key serial work.

    Requires a numeric, unique ``order_col`` (ties within a bucket are
    broken by the local sort exactly as the naive window would).
    Result is bit-identical to the naive row_number, including NULL
    handling: NULL part_col forms its own partition and NULL order_col
    sorts first (Spark ASC NULLS FIRST), via a NULL bucket that precedes
    every numeric bucket and null-safe join keys.
    """
    from pyspark.sql.window import Window

    bucket = (F.col(order_col) / F.lit(bucket_width)).cast("long")
    b = df.withColumn("__bucket", bucket)
    w_local = Window.partitionBy(part_col, "__bucket").orderBy(order_col)
    local = b.withColumn("__local_rn", F.row_number().over(w_local))
    # Offsets: rows per (key, bucket), then exclusive running sum per key
    # over the bucket order — a window over a table with one row per
    # occupied bucket, thousands of times smaller than the fact table.
    counts = b.groupBy(part_col, "__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.partitionBy(part_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select(
        F.col(part_col).alias("__o_part"),
        F.col("__bucket").alias("__o_bucket"),
        "__offset",
    )
    # eqNullSafe: NULL part/order keys must match their offset row, not
    # silently drop (inner join on NULL would lose those rows; the naive
    # window keeps them).
    cond = local[part_col].eqNullSafe(offsets["__o_part"]) & local[
        "__bucket"
    ].eqNullSafe(offsets["__o_bucket"])
    return (
        local.join(offsets, cond)
        .withColumn(out_col, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__bucket", "__local_rn", "__offset", "__o_part", "__o_bucket")
    )
