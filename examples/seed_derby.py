"""Seed a FILE-based Derby database for examples/pipeline_servers.json.

File-based Derby (the reference's jdbc_static_file_local_spec.rb
variant) persists across JVMs, so a separate seeding run works:

    python examples/seed_derby.py /tmp/enrich_refdb
    spark-submit --py-files /tmp/pkg.zip \
        logstash_filter_jdbc_static_spark/job.py \
        --input /root/testdata/sf0.001 --output /tmp/enrich_out \
        --pipeline examples/pipeline_servers.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from logstash_filter_jdbc_static_spark.sources.transcripts import (  # noqa: E402
    SERVERS_ROWS,
    SERVERS_SCHEMA,
)


def seed(db_path: str) -> str:
    url = f"jdbc:derby:{db_path};create=true"
    owns_session = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.appName("seed-derby")
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    (
        spark.createDataFrame(SERVERS_ROWS, SERVERS_SCHEMA)
        .write.format("jdbc")
        .option("url", url)
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("dbtable", "servers")
        .option(
            "createTableColumnTypes",
            "ip VARCHAR(64), name VARCHAR(64), location VARCHAR(64)",
        )
        .mode("overwrite")
        .save()
    )
    if owns_session:
        spark.stop()
    return url


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/enrich_refdb"
    print("seeded", seed(path))
