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


class TestSkewRobustRowNumber:
    def test_identical_to_naive_window(self, spark):
        from pyspark.sql.window import Window

        from logstash_filter_jdbc_static_spark.operators.skew import (
            skew_robust_row_number,
        )

        # 1 hot key with 80% of rows + a uniform tail; order col has
        # gaps + interleaved assignment so buckets are non-trivial.
        n = 50_000
        df = spark.range(n).select(
            F.when(F.col("id") % 5 < 4, F.lit("conv-hot"))
            .otherwise(F.concat(F.lit("conv-"), (F.col("id") % 97).cast("string")))
            .alias("conv_id"),
            (F.col("id") * 7 + 3).alias("event_id"),
        )
        naive = df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy("event_id")
            ).cast("long"),
        )
        robust = skew_robust_row_number(
            df, "conv_id", "event_id", bucket_width=10_000
        )
        assert naive.exceptAll(robust.select(*naive.columns)).count() == 0
        assert robust.select(*naive.columns).exceptAll(naive).count() == 0

    def test_single_bucket_degenerates_gracefully(self, spark):
        from logstash_filter_jdbc_static_spark.operators.skew import (
            skew_robust_row_number,
        )

        df = spark.range(100).select(
            F.lit("c").alias("conv_id"), F.col("id").alias("event_id")
        )
        out = skew_robust_row_number(df, "conv_id", "event_id", bucket_width=10**9)
        rows = sorted(r["rn"] for r in out.collect())
        assert rows == list(range(1, 101))

    def test_null_keys_are_kept_like_the_naive_window(self, spark):
        """NULL part_col / order_col rows must survive (naive window
        keeps them: NULL partition, NULLS FIRST ordering)."""
        from pyspark.sql.window import Window

        from logstash_filter_jdbc_static_spark.operators.skew import (
            skew_robust_row_number,
        )

        df = spark.createDataFrame(
            [("a", 5), ("a", None), ("a", 1), (None, 3), (None, 7), ("b", 2)],
            "conv_id string, event_id int",
        )
        naive = df.withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("conv_id").orderBy("event_id"))
            .cast("long"),
        )
        robust = skew_robust_row_number(df, "conv_id", "event_id", bucket_width=2)
        assert robust.count() == 6
        assert naive.exceptAll(robust.select(*naive.columns)).count() == 0
        assert robust.select(*naive.columns).exceptAll(naive).count() == 0
