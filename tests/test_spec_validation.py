"""Tier-1 validation tests, mirroring the reference's unit specs
(spec/filters/jdbc/lookup_spec.rb, db_object_spec.rb, loader_spec.rb,
lookup_processor_spec.rb) — same error conditions, messages verbatim
where the reference asserts them."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from logstash_filter_jdbc_static_spark.schema import derby_type_to_spark
from logstash_filter_jdbc_static_spark.spec import (
    DEFAULT_MAX_ROWS,
    LoaderSpec,
    LocalDbObject,
    LookupSpec,
    PipelineSpec,
    ValidationError,
)


class TestLookupSpec:
    def test_query_required(self):
        lk = LookupSpec({"id": "L1"})
        assert "The options for 'L1' must include a 'query' string" in lk.option_errors

    def test_parameters_and_prepared_mutually_exclusive(self):
        # lookup_spec.rb:48-57
        lk = LookupSpec(
            {
                "id": "L1",
                "query": "select * from t where a = :a and b = ?",
                "parameters": {"a": "fa"},
                "prepared_parameters": ["fb"],
            }
        )
        assert (
            "Can't specify 'parameters' and 'prepared_parameters' in the same lookup"
            in lk.option_errors
        )

    def test_prepared_count_mismatch(self):
        # lookup_spec.rb:59-67, lookup.rb:224-235
        lk = LookupSpec(
            {
                "id": "L1",
                "query": "select * from t where a = ? and b = ?",
                "prepared_parameters": ["fa"],
            }
        )
        assert (
            "The 'prepared_parameters' option for 'L1' doesn't match count "
            "with query's placeholder" in lk.option_errors
        )

    def test_parameters_must_be_hash(self):
        lk = LookupSpec({"id": "L1", "query": "q", "parameters": ["x"]})
        assert "The 'parameters' option for 'L1' must be a Hash" in lk.option_errors

    def test_defaults(self):
        lk = LookupSpec({"query": "select * from t"}, index=2)
        assert lk.id == "lookup-3"
        assert lk.target == "lookup-3"  # target defaults to id (lookup.rb:54-60)
        assert lk.id_used_as_target
        assert lk.tag_on_failure == ["_jdbcstaticfailure"]
        assert lk.tag_on_default_use == ["_jdbcstaticdefaultsused"]
        assert not lk.use_default

    def test_global_tag_override(self):
        lk = LookupSpec(
            {"query": "q"}, {"tag_on_failure": ["boom"], "tag_on_default_use": None}
        )
        assert lk.tag_on_failure == ["boom"]
        assert lk.tag_on_default_use == ["_jdbcstaticdefaultsused"]


class TestPipelineSpecUniqueness:
    # lookup_processor_spec.rb:47-110
    def test_duplicate_ids(self):
        with pytest.raises(ValidationError) as ei:
            PipelineSpec(
                lookups=[
                    {"id": "L1", "query": "select * from t", "target": "a"},
                    {"id": "L1", "query": "select * from t", "target": "b"},
                ]
            )
        assert "Id setting must be different across all lookups" in ei.value.errors
        assert "'L1' is specified multiple times" in ei.value.errors

    def test_duplicate_targets(self):
        with pytest.raises(ValidationError) as ei:
            PipelineSpec(
                lookups=[
                    {"id": "L1", "query": "select * from t", "target": "same"},
                    {"id": "L2", "query": "select * from t", "target": "same"},
                ]
            )
        assert "Target setting must be different across all lookups" in ei.value.errors
        assert "'L1', 'L2' have the same target field setting" in ei.value.errors

    def test_id_as_target_skips_target_check(self):
        # lookup_processor.rb:86-88
        spec = PipelineSpec(
            lookups=[
                {"id": "L1", "query": "select * from t"},
                {"id": "L2", "query": "select * from t"},
            ]
        )
        assert [lk.target for lk in spec.lookups] == ["L1", "L2"]


class TestDbObject:
    def test_requires_name_and_columns(self):
        obj = LocalDbObject({})
        assert "DbObject options must include a 'name' string" in obj.option_errors
        assert (
            "DbObject options for 'unnamed' must include a 'columns' array"
            in obj.option_errors
        )

    def test_non_uniform_columns(self):
        obj = LocalDbObject({"name": "t", "columns": [["a", "int"], ["b"]]})
        assert (
            "The columns array for 't' is not uniform, it should contain "
            "arrays of two strings only" in obj.option_errors
        )

    def test_bad_index_column(self):
        # db_object_spec.rb:66-71
        obj = LocalDbObject(
            {
                "name": "t",
                "columns": [["ip", "varchar(64)"]],
                "index_columns": ["nope"],
            }
        )
        assert (
            "The index_columns element: 'nope' must be a column defined in "
            "the columns array" in obj.option_errors
        )

    def test_schema_mapping(self):
        obj = LocalDbObject(
            {
                "name": "servers",
                "columns": [
                    ["ip", "varchar(64)"],
                    ["cnt", "int"],
                    ["big", "bigint"],
                    ["amt", "decimal(10,2)"],
                    ["seen", "timestamp"],
                ],
                "index_columns": ["ip"],
            }
        )
        assert obj.valid
        assert obj.schema == T.StructType(
            [
                T.StructField("ip", T.StringType(), True),
                T.StructField("cnt", T.IntegerType(), True),
                T.StructField("big", T.LongType(), True),
                T.StructField("amt", T.DecimalType(10, 2), True),
                T.StructField("seen", T.TimestampType(), True),
            ]
        )
        assert obj.index_columns == ["ip"]


class TestLoaderSpec:
    def test_defaults(self):
        ld = LoaderSpec({"local_table": "servers", "query": "select * from ref"})
        assert ld.valid
        assert ld.id == "servers"
        assert ld.max_rows == DEFAULT_MAX_ROWS  # loader.rb:73

    def test_requires_table_and_query(self):
        ld = LoaderSpec({})
        assert "The options must include a 'local_table' string" in ld.option_errors
        assert "The options for 'None' must include a 'query' string" in ld.option_errors


class TestDerbyTypes:
    @pytest.mark.parametrize(
        "derby,expected",
        [
            ("varchar(64)", T.StringType()),
            ("text", T.StringType()),
            ("int", T.IntegerType()),
            ("INTEGER", T.IntegerType()),
            ("bigint", T.LongType()),
            ("double", T.DoubleType()),
            ("boolean", T.BooleanType()),
            ("date", T.DateType()),
            ("numeric(5)", T.DecimalType(5, 0)),
        ],
    )
    def test_map(self, derby, expected):
        assert derby_type_to_spark(derby) == expected

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            derby_type_to_spark("geometry")
