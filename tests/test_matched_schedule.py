"""filter_matched common options + scheduled reload runner."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark.operators.matched import (
    apply_matched_options,
)
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.plans.refresh import DimensionStore
from logstash_filter_jdbc_static_spark.plans.schedule import (
    RepeatingLoadRunner,
    parse_schedule,
)
from logstash_filter_jdbc_static_spark.sources.transcripts import (
    SERVERS_SCHEMA,
    servers_df,
)
from logstash_filter_jdbc_static_spark.spec import (
    LoaderSpec,
    LocalDbObject,
    PipelineSpec,
)


class TestMatchedOptions:
    def _enriched(self, spark, ip):
        spec = PipelineSpec(
            lookups=[
                {
                    "id": "server",
                    "query": "SELECT name, location FROM servers WHERE ip = :ip",
                    "parameters": {"ip": "ip"},
                }
            ]
        )
        enricher = LookupEnricher(spec, {"servers": servers_df(spark)})
        fact = spark.createDataFrame(
            [("c1", 1, ip)], "conv_id string, turn_idx int, ip string"
        )
        return enricher.apply(fact)

    def test_add_field_hoists_nested_on_matched(self, spark):
        # docs/index.asciidoc:127-131: add_field => { server_name =>
        #   "%{[server][0][name]}" } applied because event matched
        out = apply_matched_options(
            self._enriched(spark, "10.2.1.1"),
            add_field={"server_name": "%{[server][0][name]}",
                       "label": "at %{[server][0][location]}!"},
        )
        row = out.collect()[0]
        assert row["server_name"] == "nyc-server-1"
        assert row["label"] == "at NYC-5-2-8!"

    def test_add_field_skipped_when_unmatched(self, spark):
        out = apply_matched_options(
            self._enriched(spark, None),
            add_field={"server_name": "%{[server][0][name]}"},
        )
        row = out.collect()[0]
        assert row["matched"] is False
        assert row["server_name"] is None

    def test_remove_field_on_matched(self, spark):
        out = apply_matched_options(
            self._enriched(spark, "10.2.1.1"), remove_field=["ip"]
        )
        assert out.collect()[0]["ip"] is None


class TestSchedule:
    def test_parse(self):
        assert parse_schedule("2s") == 2.0
        assert parse_schedule("5 min") == 300.0
        assert parse_schedule("*/10 * * * * *") == 10.0

    def test_repeating_runner_reloads(self, spark):
        # ≅ jdbc_static_spec.rb:141-158 without wall-clock cron precision
        calls = {"n": 0}

        def fetch():
            calls["n"] += 1
            return spark.createDataFrame(
                [("10.1.1.1", f"v{calls['n']}", "L")], SERVERS_SCHEMA
            )

        store = DimensionStore(
            spark,
            [LocalDbObject({"name": "servers",
                            "columns": [["ip", "varchar(64)"],
                                        ["name", "varchar(64)"],
                                        ["location", "varchar(64)"]]})],
            [(LoaderSpec({"local_table": "servers", "query": "q"}), fetch)],
        )
        runner = RepeatingLoadRunner(store, "0.2s")
        runner.start()
        try:
            deadline = time.time() + 20
            while runner.reload_count < 3 and time.time() < deadline:
                time.sleep(0.1)
        finally:
            runner.stop()
        assert runner.reload_count >= 3
        names = [r["name"] for r in store.dims()["servers"].collect()]
        assert names == [f"v{calls['n']}"]  # lookups see the newest snapshot
