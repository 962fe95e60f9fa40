"""Sink compaction: small-files maintenance over the fan-out layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark.plans.compact import (
    compact_sinks,
    partition_stats,
    recover_sinks,
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
        # Simulate a crash between backup and swap-in: the live dir is
        # gone, the rows are parked in the hidden staging area.
        os.makedirs(os.path.join(path, "_compaction", "old"))
        os.rename(part, os.path.join(path, "_compaction", "old", "route=hit"))
        restored = recover_sinks(spark, path)
        assert restored == [part]
        assert spark.read.parquet(part).count() == n
        assert not os.path.exists(os.path.join(path, "_compaction"))

    def test_crashed_state_is_invisible_to_readers_and_healed_by_next_run(
        self, spark, tmp_path
    ):
        """The staging area is `_`-prefixed: Spark partition discovery
        never surfaces swap dirs as bogus route values, and the next
        compact_sinks heals the crash before compacting."""
        path = str(tmp_path / "sink4")
        full = _fragmented_sink(spark, path).count()
        part = os.path.join(path, "route=miss")
        os.makedirs(os.path.join(path, "_compaction", "old"))
        os.rename(part, os.path.join(path, "_compaction", "old", "route=miss"))
        # Readers of the crashed sink see no phantom partitions...
        routes = sorted(
            r["route"]
            for r in spark.read.parquet(path).select("route").distinct().collect()
        )
        assert routes == ["hit", "malformed"]
        # ...and the next maintenance run restores, then compacts, all.
        compact_sinks(spark, path, target_bytes=64 * 1024 * 1024)
        assert spark.read.parquet(path).count() == full


class TestNestedLayoutCrashRecovery:
    """Regression: partition_stats hands back file:-qualified URIs while
    callers pass plain roots. The staging relpath must survive that
    mismatch, or nested batch=/route= partitions park under a leaf-only
    name and crash recovery restores them one level too high —
    corrupting the sink (CONFLICTING_PARTITION_COLUMN_NAMES)."""

    def _nested_sink(self, spark, path: str):
        for b in range(2):
            df = spark.range(b * 300, (b + 1) * 300, numPartitions=3).select(
                F.col("id"),
                F.lit(b).alias("batch"),
                F.element_at(
                    F.array(F.lit("hit"), F.lit("miss")),
                    (F.col("id") % 2 + 1).cast("int"),
                ).alias("route"),
            )
            df.write.mode("append").partitionBy("batch", "route").parquet(path)
        return spark.read.parquet(path)

    def test_staging_paths_keep_full_relpath_across_uri_mismatch(
        self, spark, tmp_path
    ):
        from logstash_filter_jdbc_static_spark.plans.compact import (
            _staging_paths,
        )

        path = str(tmp_path / "nested")
        self._nested_sink(spark, path)
        # partition_stats yields qualified URIs (file:/...); root is plain.
        part_uris = [s["path"] for s in partition_stats(spark, path)]
        assert any(u.startswith("file:") for u in part_uris)
        target = next(u for u in part_uris if u.endswith("batch=0/route=hit"))
        tmp, old = _staging_paths(spark, path, target)
        assert tmp == f"{path}/_compaction/tmp/batch=0/route=hit"
        assert old == f"{path}/_compaction/old/batch=0/route=hit"

    def test_staging_rejects_partition_outside_root(self, spark, tmp_path):
        import pytest as _pytest

        from logstash_filter_jdbc_static_spark.plans.compact import (
            _staging_paths,
        )

        with _pytest.raises(ValueError, match="not under sink root"):
            _staging_paths(
                spark, str(tmp_path / "a"), str(tmp_path / "elsewhere/route=x")
            )

    def test_crash_mid_swap_on_nested_layout_recovers_in_place(
        self, spark, tmp_path
    ):
        from logstash_filter_jdbc_static_spark.plans.compact import (
            _staging_paths,
        )

        path = str(tmp_path / "nested2")
        full = self._nested_sink(spark, path).count()
        part = os.path.join(path, "batch=1", "route=miss")
        n_part = spark.read.parquet(part).count()
        # Park the partition exactly where step 2 of the swap protocol
        # does (backup rename), then "crash" before step 3.
        part_uri = next(
            s["path"]
            for s in partition_stats(spark, path)
            if s["path"].endswith("batch=1/route=miss")
        )
        _tmp, old = _staging_paths(spark, path, part_uri)
        os.makedirs(os.path.dirname(old))
        os.rename(part, old)
        restored = recover_sinks(spark, path)
        assert restored == [part]
        assert spark.read.parquet(part).count() == n_part
        # The whole sink is readable again with the nested layout intact.
        assert spark.read.parquet(path).count() == full
        assert not os.path.exists(os.path.join(path, "_compaction"))

    def test_compact_sinks_end_to_end_on_nested_layout(self, spark, tmp_path):
        path = str(tmp_path / "nested3")
        full = self._nested_sink(spark, path).count()
        summary = compact_sinks(spark, path, target_bytes=64 * 1024 * 1024)
        assert len(summary) == 4  # 2 batches x 2 routes, all fragmented
        assert spark.read.parquet(path).count() == full
        assert not os.path.exists(os.path.join(path, "_compaction"))


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
        routed_path = os.path.join(out, "routed")
        routed = spark.read.parquet(routed_path)
        assert routed.count() == 1000
        # Fragment one partition like later micro-batch appends would,
        # then verify compaction actually merges it on the job layout.
        part_dirs = [
            os.path.join(routed_path, b, r)
            for b in os.listdir(routed_path) if b.startswith("batch=")
            for r in os.listdir(os.path.join(routed_path, b))
            if r.startswith("route=hit")
        ]
        target = part_dirs[0]
        frag = spark.read.parquet(target)
        for _ in range(3):
            frag.coalesce(1).write.mode("append").parquet(target)
        n_after_appends = spark.read.parquet(routed_path).count()
        forced = compact_sinks(spark, routed_path)
        # keys are Hadoop URIs (file:/...); match by suffix
        hit = [k for k in forced if k.endswith(target)]
        assert hit and forced[hit[0]][1] < forced[hit[0]][0]
        assert spark.read.parquet(routed_path).count() == n_after_appends

    def test_job_compact_rejected_for_iceberg(self, spark, tmp_path):
        import pytest as _pytest

        from logstash_filter_jdbc_static_spark.job import run_job

        with _pytest.raises(SystemExit, match="compact|iceberg"):
            run_job(
                spark, "/root/testdata/sf0.001", str(tmp_path / "x"),
                batches=2, table_format="iceberg", compact=True,
            )


class TestRootLevelCompaction:
    """Unpartitioned sinks (data files directly at the root) — the
    round-2 ADVICE finding: the dir-rename protocol cannot stage the
    root into its own subtree, so root-level partitions use the
    file-granular manifest protocol (_compact_root)."""

    def _flat_sink(self, spark, path: str):
        for i in range(5):
            spark.range(i * 100, (i + 1) * 100, numPartitions=4).write.mode(
                "append"
            ).parquet(path)
        return spark.read.parquet(path)

    def test_root_level_compacts_same_rows(self, spark, tmp_path):
        root = str(tmp_path / "flat")
        before_df = self._flat_sink(spark, root)
        before_sum = before_df.groupBy().sum("id").collect()[0][0]
        (stat,) = partition_stats(spark, root)
        assert stat["n_files"] >= 20
        summary = compact_sinks(spark, root)
        assert summary, "root-level partition was skipped"
        ((files_before, files_after),) = summary.values()
        assert files_after < files_before
        after_df = spark.read.parquet(root)
        assert after_df.count() == 500
        assert after_df.groupBy().sum("id").collect()[0][0] == before_sum
        # staging fully cleared
        assert not os.path.exists(os.path.join(root, "_compaction"))
        # idempotent: second run has nothing to do
        assert compact_sinks(spark, root) == {}

    def test_root_level_crash_mid_swap_recovers(self, spark, tmp_path):
        """Simulate the worst crash point: originals parked in old/, a
        PARTIAL set of compacted files swapped into the root (one of
        two — a complete set would correctly roll forward instead).
        Recovery must delete the manifest-named files and restore the
        originals — no duplicates, no loss."""
        import shutil

        root = str(tmp_path / "flat2")
        self._flat_sink(spark, root)
        before = sorted(
            r["id"] for r in spark.read.parquet(root).collect()
        )
        # build the crashed state by hand: compacted copy in tmp
        tmp_dir = os.path.join(root, "_compaction", "tmp")
        spark.read.parquet(root).repartition(2).write.parquet(tmp_dir)
        tmp_files = [
            f for f in os.listdir(tmp_dir)
            if not f.startswith(("_", "."))
        ]
        old_dir = os.path.join(root, "_compaction", "old")
        os.makedirs(old_dir)
        with open(os.path.join(old_dir, "_MANIFEST"), "w") as fh:
            fh.write("\n".join(tmp_files))
        # park ALL originals, then "crash" after swapping ONE tmp file in
        for f in os.listdir(root):
            if f.startswith(("_", ".")):
                continue
            shutil.move(os.path.join(root, f), os.path.join(old_dir, f))
        shutil.move(
            os.path.join(tmp_dir, tmp_files[0]), os.path.join(root, tmp_files[0])
        )
        restored = recover_sinks(spark, root)
        assert root.rstrip("/") in [p.rstrip("/") for p in restored]
        after = sorted(r["id"] for r in spark.read.parquet(root).collect())
        assert after == before
        assert not os.path.exists(os.path.join(root, "_compaction"))

    def test_root_level_crash_mid_cleanup_rolls_forward(self, spark, tmp_path):
        """Crash AFTER the swap-in completed, partway through deleting
        old/ (some parked originals already gone, manifest survives).
        Rolling back here would lose the rows that existed only in the
        already-deleted originals — recovery must roll FORWARD: keep the
        compacted files, finish deleting old/ (round-3 review finding)."""
        import shutil

        root = str(tmp_path / "flat3")
        self._flat_sink(spark, root)
        before = sorted(r["id"] for r in spark.read.parquet(root).collect())
        tmp_dir = os.path.join(root, "_compaction", "tmp")
        spark.read.parquet(root).coalesce(1).write.parquet(tmp_dir)
        tmp_files = [
            f for f in os.listdir(tmp_dir) if not f.startswith(("_", "."))
        ]
        old_dir = os.path.join(root, "_compaction", "old")
        os.makedirs(old_dir)
        with open(os.path.join(old_dir, "_MANIFEST"), "w") as fh:
            fh.write("\n".join(tmp_files))
        originals = [
            f for f in os.listdir(root)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(root, f))
        ]
        for f in originals:
            shutil.move(os.path.join(root, f), os.path.join(old_dir, f))
        # swap-in COMPLETES...
        for f in tmp_files:
            shutil.move(os.path.join(tmp_dir, f), os.path.join(root, f))
        # ...then the old/ cleanup crashes after deleting SOME originals
        os.remove(os.path.join(old_dir, originals[0]))
        restored = recover_sinks(spark, root)
        assert root.rstrip("/") not in [p.rstrip("/") for p in restored]
        after = sorted(r["id"] for r in spark.read.parquet(root).collect())
        assert after == before
        assert not os.path.exists(os.path.join(root, "_compaction"))

    def test_root_level_manifest_deleted_first_rolls_forward(
        self, spark, tmp_path
    ):
        """The recursive old/ delete can remove _MANIFEST before the
        parked originals. The manifest is written before anything is
        parked, so manifest-missing + parked-present is only reachable
        after a completed swap: recovery must finish the cleanup, not
        resurrect the originals next to the compacted files."""
        import shutil

        root = str(tmp_path / "flat4")
        self._flat_sink(spark, root)
        before = sorted(r["id"] for r in spark.read.parquet(root).collect())
        tmp_dir = os.path.join(root, "_compaction", "tmp")
        spark.read.parquet(root).coalesce(1).write.parquet(tmp_dir)
        tmp_files = [
            f for f in os.listdir(tmp_dir) if not f.startswith(("_", "."))
        ]
        old_dir = os.path.join(root, "_compaction", "old")
        os.makedirs(old_dir)
        originals = [
            f for f in os.listdir(root)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(root, f))
        ]
        for f in originals:
            shutil.move(os.path.join(root, f), os.path.join(old_dir, f))
        for f in tmp_files:
            shutil.move(os.path.join(tmp_dir, f), os.path.join(root, f))
        # crash state: manifest already deleted, originals still parked
        restored = recover_sinks(spark, root)
        assert root.rstrip("/") not in [p.rstrip("/") for p in restored]
        after = sorted(r["id"] for r in spark.read.parquet(root).collect())
        assert after == before
        assert not os.path.exists(os.path.join(root, "_compaction"))

    def test_mixed_layout_roots_and_partitions(self, spark, tmp_path):
        """A sink with BOTH root-level files and partition dirs (messy
        real-world layout) compacts each leaf with its own protocol —
        the root pass must touch ONLY the root-level files, never
        recursing into the subdirs (round-3 review finding)."""
        root = str(tmp_path / "mixed")
        for i in range(4):
            spark.range(i * 50, (i + 1) * 50, numPartitions=3).write.mode(
                "append"
            ).parquet(os.path.join(root, "route=hit"))
        for i in range(4):
            spark.range(1000 + i * 50, 1000 + (i + 1) * 50, numPartitions=3).write.mode(
                "append"
            ).parquet(root)
        sub_total = spark.read.parquet(os.path.join(root, "route=hit")).count()
        root_files = [
            f for f in os.listdir(root)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(root, f))
        ]
        root_ids = sorted(
            r["id"]
            for r in spark.read.parquet(
                *[os.path.join(root, f) for f in root_files]
            ).collect()
        )
        summary = compact_sinks(spark, root)
        # both leaves compacted (root entry + partition entry)
        assert len(summary) == 2, summary
        assert spark.read.parquet(os.path.join(root, "route=hit")).count() == sub_total
        root_files_after = [
            f for f in os.listdir(root)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(root, f))
        ]
        assert len(root_files_after) < len(root_files)
        ids_after = sorted(
            r["id"]
            for r in spark.read.parquet(
                *[os.path.join(root, f) for f in root_files_after]
            ).collect()
        )
        assert ids_after == root_ids
