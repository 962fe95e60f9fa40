"""Route stage: tag-driven fan-out to hit / miss (default-used) /
malformed sinks.

Tag semantics from the reference drive the routing (SURVEY 2C):
``_jdbcstaticfailure`` (jdbc_static.rb:87-89) => malformed sink,
``_jdbcstaticdefaultsused`` (jdbc_static.rb:91-92) => miss sink,
untagged => hit sink. Precedence failure > default > hit
(a row that both failed one lookup and defaulted another is malformed).

Physically: one ``route`` label column computed with when/otherwise, then
either per-route filtered writes (three scans share the same cached stage
under AQE) or a single partitionBy("route") write — the latter is the
scale path (one pass, one shuffle-free dynamic-partition write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from logstash_filter_jdbc_static_spark.spec import (
    DEFAULT_TAG_ON_DEFAULT_USE,
    DEFAULT_TAG_ON_FAILURE,
)

ROUTE_COL = "route"
ROUTE_HIT = "hit"
ROUTE_MISS = "miss"
ROUTE_MALFORMED = "malformed"


def route_label(
    failure_tags: list[str] | None = None,
    default_tags: list[str] | None = None,
) -> Column:
    """Route label from the tags column (failure ≻ default ≻ hit)."""
    failure_tags = failure_tags or DEFAULT_TAG_ON_FAILURE
    default_tags = default_tags or DEFAULT_TAG_ON_DEFAULT_USE
    has_failure = F.arrays_overlap(
        F.col("tags"), F.array(*[F.lit(t) for t in failure_tags])
    )
    has_default = F.arrays_overlap(
        F.col("tags"), F.array(*[F.lit(t) for t in default_tags])
    )
    return (
        F.when(has_failure, F.lit(ROUTE_MALFORMED))
        .when(has_default, F.lit(ROUTE_MISS))
        .otherwise(F.lit(ROUTE_HIT))
    )


def with_route(df: DataFrame, **kwargs) -> DataFrame:
    return df.withColumn(ROUTE_COL, route_label(**kwargs))


def write_fanout(
    df: DataFrame,
    base_path: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    extra_partition_cols: list[str] | None = None,
) -> dict[str, str]:
    """Single-pass fan-out write: dynamic partitioning on the route label
    (plus optional time/conv buckets). One job, no per-sink rescan.

    Returns sink name -> path.
    """
    part_cols = [ROUTE_COL, *(extra_partition_cols or [])]
    (
        df.write.mode(mode)
        .partitionBy(*part_cols)
        .format(file_format)
        .save(base_path)
    )
    return {
        r: f"{base_path}/{ROUTE_COL}={r}"
        for r in (ROUTE_HIT, ROUTE_MISS, ROUTE_MALFORMED)
    }
