"""Skew-handling correctness: salted two-phase aggregation and
replicated-dim join equal their naive counterparts on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark.operators.skew import (
    replicate_broadcast_join,
    salted_count,
)


def _skewed_df(spark):
    # one hot key (90%) + long tail
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot-conv"))
        .otherwise(F.concat(F.lit("conv-"), (F.col("id") % 97).cast("string")))
        .alias("conv_id"),
        (F.col("id") % 5).alias("tool_n"),
    )


class TestSaltedAggregation:
    def test_equals_naive_count(self, spark):
        df = _skewed_df(spark)
        naive = {r["conv_id"]: r["count"] for r in df.groupBy("conv_id").count().collect()}
        salted = {r["conv_id"]: r["count"] for r in salted_count(df, ["conv_id"]).collect()}
        assert salted == naive
        assert naive["hot-conv"] == 9000


class TestReplicatedJoin:
    def test_equals_naive_join(self, spark):
        df = _skewed_df(spark).withColumn(
            "tool", F.concat(F.lit("tool_"), F.col("tool_n").cast("string"))
        )
        dim = spark.createDataFrame(
            [(f"tool_{i}", f"cat{i}") for i in range(4)], "tool string, category string"
        )
        naive = (
            df.join(dim, "tool", "left")
            .groupBy("category").count().collect()
        )
        salted = (
            replicate_broadcast_join(df, dim, "tool")
            .groupBy("category").count().collect()
        )
        assert {(r["category"], r["count"]) for r in naive} == {
            (r["category"], r["count"]) for r in salted
        }
