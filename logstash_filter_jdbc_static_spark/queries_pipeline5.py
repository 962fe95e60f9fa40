"""Fifth wave of gated queries: the widened lookup WHERE surface
(round-2 verdict #1) under the driver's rows+schema+hash gate.

The reference hands lookup SQL verbatim to Derby (lookup.rb:131-147), so
disjunctions, IN-lists, BETWEEN ranges and NULL tests are all legal
configs there; parse_lookup_query now compiles them (DNF) onto the same
three physical paths. Each query below pins one new shape end-to-end:

1. ``lookup_in_list``       — IN (:param, 'literal') fan-out, inline path
2. ``lookup_or_disjunction``— equality OR pattern-LIKE, inline path
3. ``lookup_between``       — BETWEEN :lo AND :hi + static numeric/null
                              predicates, map-probe path at sf>=0.01
4. ``lookup_shuffle_map``   — the shuffle_map map-back strategy under the
                              driver gate (round-2 verdict #4), with a
                              conversation-derived high-cardinality tuple
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.queries import _PARSED_CTE, register
from logstash_filter_jdbc_static_spark.sources.registry import load_table_split
from logstash_filter_jdbc_static_spark.sources.transcripts import (
    SERVERS_CTE,
    TOOL_CATALOG_CTE,
    TRANSCRIPTS_CTE,
    load_transcripts,
    servers_df,
    tool_catalog_df,
    with_ctes,
)
from logstash_filter_jdbc_static_spark.spec import PipelineSpec

# ------------------------------------------------------------------
# 1. IN-list lookup: placeholder + literal members, multi-row fan-in.
#    tool_0 always matches; the event's own tool adds a second row when
#    it exists in the catalog (and differs from tool_0).
# ------------------------------------------------------------------


@register(
    "lookup_in_list",
    with_ctes(
        TOOL_CATALOG_CTE,
        TRANSCRIPTS_CTE,
        body="""
        SELECT t.conv_id, t.turn_idx, t.tool,
               CAST(count(tc.tool) AS BIGINT) AS n_matches,
               coalesce(array_to_string(
                 list_sort(list(tc.category || ':' || tc.owner)
                           FILTER (WHERE tc.tool IS NOT NULL)), ','), '') AS hits_str
        FROM transcripts t
        LEFT JOIN tool_catalog tc ON tc.tool IN (t.tool, 'tool_0')
        GROUP BY 1, 2, 3
        """,
    ),
)
def lookup_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    spec = PipelineSpec(
        lookups=[
            {
                "id": "toolhits",
                "query": "SELECT category, owner FROM tool_catalog "
                         "WHERE tool IN (:tool, 'tool_0')",
                "parameters": {"tool": "tool"},
            }
        ]
    )
    out = LookupEnricher(spec, {"tool_catalog": tool_catalog_df(spark)}).apply(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.size("toolhits").cast("long").alias("n_matches"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.col("toolhits"),
                    lambda r: F.concat(r.getField("category"), F.lit(":"),
                                       r.getField("owner")),
                )
            ),
            ",",
        ).alias("hits_str"),
    )


# ------------------------------------------------------------------
# 2. OR-disjunction lookup: equality on one column OR pattern-LIKE on
#    another — a dim row satisfying BOTH branches still yields one
#    payload row (plain SQL join semantics). Malformed turns have both
#    params invalid => failed, payload NULL.
# ------------------------------------------------------------------

_OCTET2_CTE = r"""
octeted AS (
  SELECT p.*, nullif(regexp_extract(text, 'from_ip=\d+\.(\d+)\.', 1), '') AS octet
  FROM parsed p
)
"""


@register(
    "lookup_or_disjunction",
    with_ctes(
        SERVERS_CTE,
        TRANSCRIPTS_CTE,
        _PARSED_CTE,
        _OCTET2_CTE,
        body="""
        SELECT x.conv_id, x.turn_idx, x.from_ip, x.octet,
               CASE WHEN x.from_ip IS NULL THEN NULL
                    ELSE CAST(count(s.name) AS BIGINT) END AS n_matches,
               CASE WHEN x.from_ip IS NULL THEN NULL
                    ELSE coalesce(array_to_string(
                      list_sort(list(s.name) FILTER (WHERE s.name IS NOT NULL)), ','), '')
               END AS names_str
        FROM octeted x
        LEFT JOIN servers s
          ON s.ip = x.from_ip OR s.location LIKE '%' || x.octet || '%'
        GROUP BY 1, 2, 3, 4
        """,
    ),
)
def lookup_or_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    parsed = t.withColumn(
        "from_ip",
        F.nullif(
            F.regexp_extract(F.col("text"), r"from_ip=((?:\d{1,3}\.){3}\d{1,3})", 1),
            F.lit(""),
        ),
    ).withColumn(
        "octet",
        F.nullif(F.regexp_extract(F.col("text"), r"from_ip=\d+\.(\d+)\.", 1), F.lit("")),
    )
    spec = PipelineSpec(
        lookups=[
            {
                "id": "server",
                "query": "SELECT name FROM servers "
                         "WHERE ip = :ip OR location LIKE :loc",
                "parameters": {"ip": "from_ip", "loc": "%%{[octet]}%"},
            }
        ]
    )
    out = LookupEnricher(spec, {"servers": servers_df(spark)}).apply(parsed)
    return out.select(
        "conv_id",
        "turn_idx",
        "from_ip",
        "octet",
        F.size("server").cast("long").alias("n_matches"),
        F.when(
            F.col("server").isNotNull(),
            F.array_join(
                F.array_sort(F.transform(F.col("server"), lambda r: r.getField("name"))),
                ",",
            ),
        ).alias("names_str"),
    )


# ------------------------------------------------------------------
# 3. BETWEEN range lookup with static guards: a 3-key window over the
#    customer dim, plus a literal numeric comparison and an IS NOT NULL
#    — both static predicates ride the probe condition (dim-side), the
#    bound range drives the per-distinct-tuple map-probe (the dim
#    outgrows inline_threshold at sf >= 0.01).
# ------------------------------------------------------------------


@register(
    "lookup_between",
    with_ctes(
        TRANSCRIPTS_CTE,
        body="""
        SELECT t.conv_id, t.turn_idx, t.lo_key,
               CAST(count(c.c_custkey) AS BIGINT) AS n_matches,
               coalesce(string_agg(c.c_name, ',' ORDER BY c.c_custkey), '') AS names
        FROM (SELECT conv_id, turn_idx,
                     CAST((turn_idx % 40) * 25 + 1 AS BIGINT) AS lo_key
              FROM transcripts) t
        LEFT JOIN customer c
          ON c.c_custkey BETWEEN t.lo_key AND t.lo_key + 2
         AND c.c_custkey > 0 AND c.c_name IS NOT NULL
        GROUP BY 1, 2, 3
        """,
    ),
)
def lookup_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        load_transcripts(spark, sf_dir)
        .withColumn("lo_key", ((F.col("turn_idx") % 40) * 25 + 1).cast("long"))
        .withColumn("hi_key", (F.col("lo_key") + 2).cast("long"))
    )
    spec = PipelineSpec(
        lookups=[
            {
                "id": "cust",
                "query": "SELECT c_custkey, c_name FROM customer "
                         "WHERE c_custkey BETWEEN :lo AND :hi "
                         "AND c_custkey > 0 AND c_name IS NOT NULL",
                "parameters": {"lo": "lo_key", "hi": "hi_key"},
            }
        ]
    )
    dim = load_table_split(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = LookupEnricher(spec, {"customer": dim}).apply(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "lo_key",
        F.size("cust").cast("long").alias("n_matches"),
        F.array_join(
            F.transform(F.col("cust"), lambda r: r.getField("c_name")), ","
        ).alias("names"),
    )


# ------------------------------------------------------------------
# 4. shuffle_map strategy under the driver gate: a conversation-derived
#    parameter tuple (hundreds of distinct 3-digit suffixes) probed
#    against the customer dim with the shuffle join map-back — the
#    adversarial-cardinality path (round-2 verdict #4) now gated, not
#    just property-tested.
# ------------------------------------------------------------------


@register(
    "lookup_shuffle_map",
    with_ctes(
        TRANSCRIPTS_CTE,
        body="""
        SELECT t.conv_id, t.turn_idx, t.digit3,
               CAST(count(c.c_custkey) AS BIGINT) AS n_matches,
               coalesce(string_agg(c.c_name, ',' ORDER BY c.c_custkey), '') AS names
        FROM (SELECT conv_id, turn_idx,
                     lpad(CAST((CAST(substr(conv_id, 6) AS INTEGER) * 7 + turn_idx) % 1000
                               AS VARCHAR), 3, '0') AS digit3
              FROM transcripts) t
        LEFT JOIN customer c ON c.c_name LIKE '%' || t.digit3
        GROUP BY t.conv_id, t.turn_idx, t.digit3
        """,
    ),
)
def lookup_shuffle_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir).withColumn(
        "digit3",
        F.lpad(
            ((F.substring("conv_id", 6, 10).cast("int") * 7 + F.col("turn_idx")) % 1000)
            .cast("string"),
            3,
            "0",
        ),
    )
    spec = PipelineSpec(
        lookups=[
            {
                "id": "cust",
                "query": "SELECT c_custkey, c_name FROM customer "
                         "WHERE c_name LIKE :pat",
                "parameters": {"pat": "%%{digit3}"},
            }
        ]
    )
    dim = load_table_split(spark, sf_dir, "customer").select("c_custkey", "c_name")
    enricher = LookupEnricher(
        spec, {"customer": dim}, inline_threshold=0, pattern_strategy="shuffle_map"
    )
    out = enricher.apply(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "digit3",
        F.size("cust").cast("long").alias("n_matches"),
        F.array_join(
            F.transform(F.col("cust"), lambda x: x.getField("c_name")), ","
        ).alias("names"),
    )
