"""Table registry over a testdata scale-factor directory.

The driver materializes TPC-H-ish tables plus documents/embeddings as one
parquet file each (TESTDATA.md). At production scale these would be
Iceberg tables; the reader seam is this one function, so swapping in
``spark.read.table`` / ``format("iceberg")`` is a one-line change
(SURVEY §7 TableFormat seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
