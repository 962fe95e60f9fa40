"""Sink compaction: the small-files maintenance pass.

A streaming/batch fan-out sink accumulates many small parquet files per
partition (one per task per micro-batch/run); at warehouse scale that
degrades every downstream scan (file-open overhead, tiny row groups, NN
pressure). This job rewrites each route partition to ~target-sized
files, idempotently, preserving the partition layout and every row.

Spark-first shape: per-partition byte size comes from the Hadoop
FileSystem (works for local, hdfs://, s3a://), the rewrite is a
coalesce to ceil(bytes/target) — a NARROW dependency, no shuffle — and
the swap is the same dynamic-partition overwrite the pipeline already
uses for resume, so a crash mid-compaction leaves a valid (just
uncompacted or freshly-compacted) partition, never a partial one.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession, functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def partition_stats(spark: SparkSession, root: str) -> list[dict]:
    """(partition_path, n_files, n_bytes) for every leaf partition dir
    under root (recursive; a leaf = dir containing data files)."""
    fs, jroot = _fs(spark, root)
    out: list[dict] = []

    def walk(jdir):
        files, dirs = [], []
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if st.isDirectory():
                if not name.endswith(("._compacting", "._old")):
                    dirs.append(st.getPath())
            elif not name.startswith(("_", ".")):
                files.append(st)
        if files:
            out.append(
                {
                    "path": jdir.toString(),
                    "n_files": len(files),
                    "n_bytes": sum(st.getLen() for st in files),
                }
            )
        for d in dirs:
            walk(d)

    walk(jroot)
    return out


def compact_partition(
    spark: SparkSession,
    partition_path: str,
    file_format: str = "parquet",
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ONE leaf partition into ceil(bytes/target) files.
    Returns the new file count. Row-preserving by construction
    (read -> coalesce -> overwrite of the same directory)."""
    recover_partition(spark, partition_path)
    stats = partition_stats(spark, partition_path)
    n_bytes = sum(s["n_bytes"] for s in stats)
    n_out = max(1, math.ceil(n_bytes / target_bytes))
    df = spark.read.format(file_format).load(partition_path)
    # coalesce = narrow repartition (no shuffle). Swap protocol: write to
    # a temp sibling, move the original aside, move the temp in, drop
    # the original — a crash between the renames leaves the data intact
    # at `._old`, and recover_partition() (run at the start of every
    # compaction) restores it. Raw filesystems have no atomic dir swap;
    # a table format (Iceberg RewriteDataFiles) makes this a metadata
    # commit — that is the upgrade path this seam maps to.
    tmp = partition_path.rstrip("/") + "._compacting"
    old = partition_path.rstrip("/") + "._old"
    df.coalesce(n_out).write.mode("overwrite").format(file_format).save(tmp)
    fs, jsrc = _fs(spark, tmp)
    _fs_d, jdst = _fs(spark, partition_path)
    _fs_o, jold = _fs(spark, old)
    fs.delete(jold, True)
    fs.rename(jdst, jold)
    fs.rename(jsrc, jdst)
    fs.delete(jold, True)
    return n_out


def recover_partition(spark: SparkSession, partition_path: str) -> bool:
    """Repair a partition left mid-swap by a crashed compaction: if the
    data dir is missing but `._old` exists, restore it. Returns True if
    a restore happened."""
    fs, jdst = _fs(spark, partition_path)
    _fs_o, jold = _fs(spark, partition_path.rstrip("/") + "._old")
    _fs_t, jtmp = _fs(spark, partition_path.rstrip("/") + "._compacting")
    if not fs.exists(jdst) and fs.exists(jold):
        fs.rename(jold, jdst)
        fs.delete(jtmp, True)
        return True
    fs.delete(jtmp, True)
    return False


def compact_sinks(
    spark: SparkSession,
    root: str,
    file_format: str = "parquet",
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Compact every leaf partition under root that has more than
    ``min_files`` files AND would shrink (file count above the target
    layout). A single small file has nothing to merge — skip it.
    Returns a summary {partition: (files_before, files_after)}."""
    summary: dict[str, tuple[int, int]] = {}
    for s in partition_stats(spark, root):
        if s["n_files"] <= min_files:
            continue
        if s["n_files"] <= math.ceil(s["n_bytes"] / target_bytes):
            continue  # already at (or below) the target file count
        after = compact_partition(spark, s["path"], file_format, target_bytes)
        summary[s["path"]] = (s["n_files"], after)
    return summary
