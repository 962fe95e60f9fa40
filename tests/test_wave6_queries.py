"""Unit tests for wave-6: connected-components dup clustering and the
deterministic global shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark.operators import dedup as D


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a: long, id_b: long")


class TestConnectedComponents:
    def test_two_components(self, spark):
        # {1,2,3} via 1-2, 2-3 and {10,11}
        comp = D.connected_components(
            _pairs(spark, [(1, 2), (2, 3), (10, 11)])
        )
        got = {r["id"]: r["cluster_id"] for r in comp.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_needs_propagation(self, spark):
        # A 6-node chain: min label must travel the full diameter, so a
        # single propagation round is NOT enough — exercises the loop.
        edges = [(i, i + 1) for i in range(1, 6)]
        comp = D.connected_components(_pairs(spark, edges))
        got = {r["id"]: r["cluster_id"] for r in comp.collect()}
        assert got == {i: 1 for i in range(1, 7)}

    def test_reversed_and_duplicate_edges(self, spark):
        # Direction and duplicates must not matter.
        comp = D.connected_components(
            _pairs(spark, [(5, 2), (2, 5), (5, 2), (9, 5)])
        )
        got = {r["id"]: r["cluster_id"] for r in comp.collect()}
        assert got == {2: 2, 5: 2, 9: 2}

    def test_max_iter_unconverged_raises(self, spark):
        # With max_iter=1 a long chain cannot fully converge; silently
        # returning partially-merged labels as if converged would poison
        # downstream canonical-keep decisions, so the loop fails loud.
        import pytest

        edges = [(i, i + 1) for i in range(1, 8)]
        with pytest.raises(RuntimeError, match="did not converge"):
            D.connected_components(_pairs(spark, edges), max_iter=1)

    def test_triangle_converges_fast(self, spark):
        comp = D.connected_components(
            _pairs(spark, [(7, 8), (8, 9), (7, 9)])
        )
        assert {r["cluster_id"] for r in comp.collect()} == {7}

    def test_string_ids_chain(self, spark):
        """String-keyed graphs (e.g. conv_minhash_dedup's conv ids) must
        converge exactly like numeric ones — the round-3 review found the
        old decimal-checksum fixpoint was NULL-blind for non-numeric ids
        and silently stopped after one round."""
        edges = [
            ("conv-b", "conv-c"), ("conv-c", "conv-d"), ("conv-a", "conv-b"),
            ("zz-1", "zz-2"),
        ]
        pairs = spark.createDataFrame(edges, "id_a: string, id_b: string")
        comp = D.connected_components(pairs)
        got = {r["id"]: r["cluster_id"] for r in comp.collect()}
        assert got == {
            "conv-a": "conv-a", "conv-b": "conv-a", "conv-c": "conv-a",
            "conv-d": "conv-a", "zz-1": "zz-1", "zz-2": "zz-1",
        }


class TestGlobalShuffle:
    def test_shard_and_pos_contract(self, spark, sf_dir):
        from logstash_filter_jdbc_static_spark.queries_pipeline6 import (
            _N_SHARDS,
            documents_global_shuffle,
        )

        out = documents_global_shuffle(spark, sf_dir).cache()
        n = out.count()
        docs_n = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
        # total preservation: every document gets exactly one slot
        assert n == docs_n
        # shards within range; positions are 1..count(shard) dense
        stats = (
            out.groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("pos").alias("lo"),
                F.max("pos").alias("hi"),
            )
            .collect()
        )
        assert all(0 <= r["shard"] < _N_SHARDS for r in stats)
        assert all(r["lo"] == 1 and r["hi"] == r["n"] for r in stats)
        out.unpersist()

    def test_deterministic(self, spark, sf_dir):
        from logstash_filter_jdbc_static_spark.queries_pipeline6 import (
            documents_global_shuffle,
        )

        a = documents_global_shuffle(spark, sf_dir).collect()
        b = documents_global_shuffle(spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
