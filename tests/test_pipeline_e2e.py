"""End-to-end pipeline over the sf0.001 driver tables: routed counts,
per-turn text equality under stable ordering, and cross-engine parity
with the DuckDB oracle (the north_rule assertions)."""

from __future__ import annotations

import duckdb
import pytest

from logstash_filter_jdbc_static_spark.plans.pipeline import (
    routed_projection,
    run_pipeline,
)
from logstash_filter_jdbc_static_spark.queries import ORACLES
from logstash_filter_jdbc_static_spark.sources.transcripts import load_transcripts


@pytest.fixture(scope="module")
def routed_and_counts(spark, sf_dir):
    t = load_transcripts(spark, sf_dir)
    routed, counts = run_pipeline(t, spark)
    routed = routed.cache()
    yield routed, counts
    # Unpersist so later tests that explain fresh plans don't get this
    # cached subtree substituted in (cache manager matches analyzed plans
    # session-wide, which perturbs plan-shape assertions).
    routed.unpersist()


class TestRouting:
    def test_route_totals(self, routed_and_counts):
        routed, _ = routed_and_counts
        totals = {r["route"]: r["count"] for r in routed.groupBy("route").count().collect()}
        # sf0.001: 1000 events; malformed = event_id%20==7 => 50
        assert totals["malformed"] == 50
        assert totals["hit"] + totals["miss"] == 950
        assert totals["miss"] > 0

    def test_one_output_row_per_turn(self, routed_and_counts):
        routed, _ = routed_and_counts
        assert routed.count() == 1000
        assert routed.select("conv_id", "turn_idx").distinct().count() == 1000

    def test_counts_sum_to_input(self, routed_and_counts):
        _, counts = routed_and_counts
        assert counts.groupBy().sum("n_turns").collect()[0][0] == 1000


class TestOracleParity:
    """The same routed rows re-derived by an independent engine (DuckDB)
    must match row-for-row — per-turn text equality under stable
    (conv_id, turn_idx) ordering."""

    def test_routed_rows_match_duckdb(self, spark, sf_dir, routed_and_counts):
        routed, _ = routed_and_counts
        got = {
            (r["conv_id"], r["turn_idx"]): (r["text"], r["route"], r["tags_str"])
            for r in routed_projection(routed).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        exp_rows = con.execute(ORACLES["pipeline_routed_rows"]).fetchall()
        cols = [d[0] for d in con.description]
        ci = {c: i for i, c in enumerate(cols)}
        exp = {
            (r[ci["conv_id"]], r[ci["turn_idx"]]): (
                r[ci["text"]], r[ci["route"]], r[ci["tags_str"]],
            )
            for r in exp_rows
        }
        assert got == exp


class TestFanOutWrite:
    def test_single_pass_partitioned_sinks(self, spark, routed_and_counts, tmp_path):
        from logstash_filter_jdbc_static_spark.operators.route import write_fanout

        routed, _ = routed_and_counts
        sinks = write_fanout(routed.drop("server", "toolinfo", "tags"),
                             str(tmp_path / "sinks"))
        assert set(sinks) == {"hit", "miss", "malformed"}
        hit = spark.read.parquet(sinks["hit"])
        assert hit.count() == 650
        total = spark.read.parquet(str(tmp_path / "sinks")).count()
        assert total == 1000
