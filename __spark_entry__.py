"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse->enrich->route->aggregate
pipeline at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator with its DuckDB oracle (see
logstash_filter_jdbc_static_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logstash_filter_jdbc_static_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.pipeline_route_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
