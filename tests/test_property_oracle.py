"""Property-based equivalence: the set-oriented Spark enricher vs the
row-at-a-time pure-Python oracle (oracle.py), over randomized facts,
dims and lookup specs (hypothesis). This is the reference's per-event
semantics checked against our whole-table plan on arbitrary inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from logstash_filter_jdbc_static_spark import oracle
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.spec import PipelineSpec

KEYS = ["k1", "k2", "k3", None]
VALS = ["v1", "v2", "v3"]

FACT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ip", T.StringType(), True),
    ]
)
DIM_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

fact_rows = st.lists(
    st.tuples(st.sampled_from(KEYS)), min_size=1, max_size=12
)
dim_rows = st.lists(
    st.tuples(st.sampled_from([k for k in KEYS if k]), st.sampled_from(VALS)),
    min_size=0,
    max_size=8,
)
use_default = st.booleans()
use_prepared = st.booleans()
use_like = st.booleans()


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(facts=fact_rows, dims=dim_rows, default=use_default,
       prepared=use_prepared, like=use_like)
def test_spark_matches_row_at_a_time_oracle(spark, facts, dims, default, prepared, like):
    op = "LIKE" if like else "="
    lookup: dict = {"id": "server"}
    if prepared:
        lookup["query"] = f"SELECT name FROM servers WHERE ip {op} ?"
        lookup["prepared_parameters"] = ["ip"]
    else:
        lookup["query"] = f"SELECT name FROM servers WHERE ip {op} :ip"
        lookup["parameters"] = {"ip": "ip"}
    if default:
        lookup["default_hash"] = {"name": "dflt"}
    spec = PipelineSpec(lookups=[lookup])
    spec2 = PipelineSpec(lookups=[dict(lookup)])

    fact_data = [(f"c{i}", i, k[0]) for i, k in enumerate(facts)]
    fact_df = spark.createDataFrame(fact_data, FACT_SCHEMA)
    dim_df = spark.createDataFrame(dims, DIM_SCHEMA)

    enricher = LookupEnricher(spec, {"servers": dim_df})
    got = {
        r["turn_idx"]: (
            None if r["server"] is None else [d.asDict() for d in r["server"]],
            list(r["tags"]),
            r["matched"],
        )
        for r in enricher.apply(fact_df).collect()
    }

    tables = {"servers": [{"ip": ip, "name": nm} for ip, nm in dims]}
    exp = {}
    for conv_id, turn_idx, ip in fact_data:
        event = {"conv_id": conv_id, "turn_idx": turn_idx}
        if ip is not None:
            event["ip"] = ip
        oracle.enhance(event, spec2, tables)
        exp[turn_idx] = (event.get("server"), event["tags"], event["matched"])

    assert got == exp
