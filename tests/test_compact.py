"""Sink compaction: small-files maintenance over the fan-out layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark.plans.compact import (
    compact_sinks,
    partition_stats,
    recover_partition,
)


def _fragmented_sink(spark, path: str):
    """Simulate many micro-batch appends: 6 appends x 4 tasks per route."""
    for i in range(6):
        df = spark.range(i * 1000, (i + 1) * 1000, numPartitions=4).select(
            F.col("id"),
            F.element_at(
                F.array(F.lit("hit"), F.lit("miss"), F.lit("malformed")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("route"),
        )
        df.write.mode("append").partitionBy("route").parquet(path)
    return spark.read.parquet(path)


class TestCompaction:
    def test_compacts_to_fewer_files_same_rows(self, spark, tmp_path):
        path = str(tmp_path / "sink")
        before_df = _fragmented_sink(spark, path)
        n_rows = before_df.count()
        chk = before_df.agg(
            F.sum(F.xxhash64("id", "route") % 2**31)
        ).collect()[0][0]

        stats = {s["path"]: s for s in partition_stats(spark, path)}
        assert all(s["n_files"] >= 6 for s in stats.values())

        summary = compact_sinks(spark, path, target_bytes=64 * 1024 * 1024)
        assert len(summary) == 3  # every route partition was fragmented
        after = {s["path"]: s for s in partition_stats(spark, path)}
        for p, (n_before, n_after) in summary.items():
            assert n_after < n_before
            assert after[p]["n_files"] == n_after == 1  # tiny data, one file

        after_df = spark.read.parquet(path)
        assert after_df.count() == n_rows
        assert (
            after_df.agg(F.sum(F.xxhash64("id", "route") % 2**31)).collect()[0][0]
            == chk
        )
        # Partition layout preserved: route still a directory key.
        assert sorted(
            r["route"] for r in after_df.select("route").distinct().collect()
        ) == ["hit", "malformed", "miss"]

    def test_already_compact_is_left_alone(self, spark, tmp_path):
        path = str(tmp_path / "sink2")
        _fragmented_sink(spark, path)
        compact_sinks(spark, path, target_bytes=64 * 1024 * 1024)
        again = compact_sinks(spark, path, target_bytes=64 * 1024 * 1024)
        assert again == {}  # single large-enough file per partition

    def test_crash_recovery_restores_old_partition(self, spark, tmp_path):
        path = str(tmp_path / "sink3")
        _fragmented_sink(spark, path)
        part = os.path.join(path, "route=hit")
        n = spark.read.parquet(part).count()
        # Simulate a crash between the two renames: data dir moved aside.
        os.rename(part, part + "._old")
        assert recover_partition(spark, part) is True
        assert spark.read.parquet(part).count() == n
        assert not os.path.exists(part + "._old")


class TestJobCompactFlag:
    def test_job_compacts_after_completion(self, spark, tmp_path):
        from logstash_filter_jdbc_static_spark.job import run_job

        out = str(tmp_path / "jobout")
        summary = run_job(
            spark, "/root/testdata/sf0.001", out, batches=4, compact=True
        )
        # sf0.001 partitions are already single-file, so the pass is a
        # correct no-op; the flag plumbing and row preservation are what
        # this asserts (fragmented-input mechanics: TestCompaction).
        assert summary["partitions_compacted"] >= 0
        assert summary["rows_routed"] == 1000
        routed = spark.read.parquet(os.path.join(out, "routed"))
        assert routed.count() == 1000
        # Force a real compaction over the job's fan-out layout.
        from logstash_filter_jdbc_static_spark.plans.compact import compact_sinks

        forced = compact_sinks(
            spark, os.path.join(out, "routed"), min_files=0
        )
        assert spark.read.parquet(os.path.join(out, "routed")).count() == 1000
        assert all(after == 1 for (_b, after) in forced.values())
