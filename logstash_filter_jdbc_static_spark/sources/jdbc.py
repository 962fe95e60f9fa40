"""Remote JDBC loader source (A1/A17).

The reference pulls dimension snapshots from any JDBC database
(loader.rb:21-35, read_only_database.rb:27-45; connection management
basic_database.rb:48-115). Spark's JDBC source replaces all of it:
``spark.read.format("jdbc").option("query", ...)`` — pushdown, fetch
batching and type mapping come built in.

This module is the seam: `jdbc_fetch` builds the reader from a
LoaderSpec; tests inject synthetic fetchers instead (no network in the
sandbox), exactly as the reference's specs stub Sequel.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from logstash_filter_jdbc_static_spark.spec import LoaderSpec


class ConnectionError_(RuntimeError):
    """== ConnectionJdbcException (basic_database.rb:20-24): connection
    failures are logged-not-raised on reload ('hope it works next time',
    read_write_database.rb:88-90) but fatal at initial load."""


def jdbc_fetch(spark: SparkSession, loader: LoaderSpec) -> DataFrame:
    """Build the remote-query DataFrame for a loader spec. Lazy — the
    fetch happens when the refresh materializes it (count guard first,
    refresh.py). Eager connection verification (basic_database.rb:85-115)
    = triggering `.schema` here."""
    reader = (
        spark.read.format("jdbc")
        .option("url", loader.jdbc_connection_string or "")
        .option("query", loader.query)
        .option("fetchsize", "10000")
    )
    if loader.jdbc_driver_class:
        reader = reader.option("driver", loader.jdbc_driver_class)
    if loader.jdbc_user:
        reader = reader.option("user", loader.jdbc_user)
    if loader.jdbc_password:
        reader = reader.option("password", loader.jdbc_password)
    df = reader.load()
    df.schema  # fail fast on bad connection/query
    return df


def make_fetcher(
    spark: SparkSession, loader: LoaderSpec
) -> Callable[[], DataFrame]:
    def fetch() -> DataFrame:
        try:
            return jdbc_fetch(spark, loader)
        except Exception as e:  # wrap like LoaderJdbcException
            raise ConnectionError_(
                f"loader '{loader.id}' failed to fetch from remote: {e}"
            ) from e

    return fetch
