"""SparkSession factory tuned for the enrichment pipeline.

One Derby engine per JVM in the reference (docs/index.asciidoc:252-263);
here: one SparkSession per process, AQE on so skewed conversations and
runtime broadcast decisions are re-planned adaptively at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "jdbc-static-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    AQE handles runtime re-planning (adaptive broadcast, skew-join
    splitting); explicit ``F.broadcast`` hints are still applied to the
    lookup dimensions because they are bounded by ``max_rows``
    (reference loader.rb:65-74) and must never shuffle the fact side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(DEFAULT_SHUFFLE_PARTITIONS))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for the pandas-UDF stages (multimodal / embedding ops).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # ParallelGC: measured 6-8x faster than G1 on this allocation-heavy
        # string pipeline at 32 threads (G1's concurrent phases thrash when
        # all cores are busy mutating); young-gen-heavy workload fits the
        # throughput collector. Large heaps (>12g) measured pathological on
        # this VM — keep the default 8g.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
