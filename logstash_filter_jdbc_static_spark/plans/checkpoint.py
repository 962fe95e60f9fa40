"""Checkpoint / resume + lineage metrics (north_rule).

Generalizes A14's reload counter (single_load_runner.rb:13,23,33-35) to a
per-partition lineage table: each pipeline run writes, per processed
input partition, a row (partition_id, run_id, reload_count, n_rows,
completed_at). Resume = anti-join pending partitions against completed
lineage, then idempotent overwrite of exactly those output partitions
(dynamic partitionOverwriteMode) — re-running a partition replaces its
files instead of duplicating them.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class LineageLog:
    """Tiny JSON-lines lineage/metrics table (swap for an Iceberg table in
    production; the write pattern — append small immutable records keyed
    by (run_id, partition) — is identical)."""

    path: str
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    def completed_partitions(self) -> set[str]:
        done: set[str] = set()
        if os.path.exists(self.path):
            with open(self.path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done.add(rec["partition"])
        return done

    def mark_done(self, partition: str, n_rows: int, reload_count: int = 0,
                  metrics: dict | None = None) -> None:
        rec = {
            "partition": partition,
            "run_id": self.run_id,
            "status": "done",
            "n_rows": n_rows,
            "reload_count": reload_count,
            "completed_at": time.time(),
        }
        if metrics:
            rec["metrics"] = metrics
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


def run_partitioned(
    spark: SparkSession,
    partitions: list[str],
    load_partition,  # (partition) -> DataFrame
    process,  # (DataFrame) -> DataFrame
    out_path: str,
    lineage: LineageLog,
    partition_col: str = "batch_id",
    reload_count: int = 0,
) -> list[str]:
    """Process only partitions not yet in the lineage log; write each with
    an idempotent per-partition overwrite. Returns partitions processed.

    Crash/resume contract: a partition is either fully written + logged,
    or will be re-processed (the overwrite makes the re-run idempotent).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = lineage.completed_partitions()
    processed = []
    for p in partitions:
        if p in done:
            continue
        df = process(load_partition(p)).withColumn(partition_col, F.lit(p))
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(out_path)
        )
        n = spark.read.parquet(out_path).filter(F.col(partition_col) == p).count()
        lineage.mark_done(p, n, reload_count)
        processed.append(p)
    return processed
