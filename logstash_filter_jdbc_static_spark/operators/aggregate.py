"""Aggregate stage: per-sink counts — the correctness oracle of the
north_rule (per-sink groupBy counts must match the reference exactly).

Map-side partial aggregation is automatic for groupBy().count(); the
conv-bucket keeps cardinality bounded (hash-mod bucket, not raw conv_id)
so the final shuffle is tiny regardless of fact size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from logstash_filter_jdbc_static_spark.operators.route import ROUTE_COL

N_CONV_BUCKETS = 16

_HEX = "0123456789abcdef"


def conv_bucket(col: str = "conv_id", n_buckets: int = N_CONV_BUCKETS) -> Column:
    """Deterministic, engine-portable bucket: first md5 hex digit mapped
    through a digit table (Spark hash() is engine-specific; md5 is not).
    DuckDB equivalent: ``strpos('0123456789abcdef', substr(md5(x),1,1)) - 1``.
    """
    return F.expr(
        f"CAST((instr('{_HEX}', substring(md5({col}), 1, 1)) - 1) % {n_buckets} AS INT)"
    ).alias("conv_bucket")


def conv_bucket_sql(col: str = "conv_id", n_buckets: int = N_CONV_BUCKETS) -> str:
    """The DuckDB-side expression matching ``conv_bucket`` exactly."""
    return (
        f"CAST((strpos('{_HEX}', substr(md5({col}), 1, 1)) - 1) "
        f"% {n_buckets} AS INTEGER)"
    )


def sink_counts(
    routed: DataFrame,
    keys: tuple[str, ...] = ("role", "tool"),
    with_conv_bucket: bool = True,
) -> DataFrame:
    cols = [F.col(ROUTE_COL), *[F.col(k) for k in keys]]
    if with_conv_bucket:
        cols.append(conv_bucket())
    return routed.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_turns"))
