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


def load_table_split(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table, restoring scan parallelism when the local file yields
    fewer input splits than cores.

    At warehouse scale parquet/Iceberg scans split by file and row group,
    so compute-heavy stages (regex scans, per-shingle hashing, vector
    math) parallelize for free. The driver's small sf files are a single
    row group => one task, serializing those stages on local[N]. The
    round-robin repartition is a one-time narrow cost that restores the
    multi-split shape a real table has; it is a no-op (no exchange) when
    the scan already has enough splits.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def save_bucketed(
    df,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sort-within-bucket) table —
    the co-location technique for repeated wide ops on one key: every
    downstream groupBy/window/join on ``bucket_col`` reads the bucketed
    layout's hash distribution straight from the scan and SKIPS its
    exchange. At 100 TB, bucketing the transcript store by conv_id turns
    the per-conversation turn-ordering window from a full shuffle into a
    scan-local sort (or no sort, if sortBy matches)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
