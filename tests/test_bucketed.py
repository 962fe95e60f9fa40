"""Bucketed-table co-location: the window/agg on the bucket key must run
WITHOUT an exchange (the 100 TB answer to the turn-ordering shuffle)."""

from __future__ import annotations

import re
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logstash_filter_jdbc_static_spark.sources.registry import save_bucketed


def _plan(df, mode="simple") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


@pytest.fixture(scope="module", autouse=True)
def _clean_table(spark):
    """Drop any catalog entry AND orphaned warehouse location from a
    previous JVM (a leftover dir without a catalog row makes saveAsTable
    fail with LOCATION_ALREADY_EXISTS)."""
    def clean():
        spark.sql("DROP TABLE IF EXISTS events_bucketed")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/events_bucketed", ignore_errors=True)

    clean()
    yield
    clean()


class TestBucketedCoLocation:
    def test_window_on_bucket_key_has_no_exchange(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        save_bucketed(
            ev, "events_bucketed", "user_id", n_buckets=4, sort_col="user_id"
        )
        t = spark.table("events_bucketed")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        windowed = t.select(
            "user_id", "event_id", F.row_number().over(w).alias("rn")
        )
        plan = _plan(windowed)
        assert not re.search(r"(?<!Broadcast)Exchange hashpartitioning", plan), plan
        # and the result is identical to the unbucketed computation
        base = ev.select(
            "user_id", "event_id", F.row_number().over(w).alias("rn")
        )
        assert windowed.exceptAll(base).count() == 0
        assert base.exceptAll(windowed).count() == 0

    def test_groupby_on_bucket_key_has_no_exchange(self, spark):
        t = spark.table("events_bucketed")
        agg = t.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(agg)
        assert not re.search(r"(?<!Broadcast)Exchange hashpartitioning", plan), plan
