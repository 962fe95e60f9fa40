"""Second wave of pipeline queries: matched-gated field hoisting,
salted aggregation (skew path), stable-turn-order conversation stats,
and the dynamic-map parameter binding path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from logstash_filter_jdbc_static_spark.operators.aggregate import conv_bucket_sql
from logstash_filter_jdbc_static_spark.operators.matched import (
    apply_matched_options,
)
from logstash_filter_jdbc_static_spark.operators.parse import GrokParser
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.operators.skew import salted_count
from logstash_filter_jdbc_static_spark.plans.pipeline import (
    TRANSCRIPT_GROK,
    build_enricher,
    enrich_and_route,
)
from logstash_filter_jdbc_static_spark.queries import (
    _ENRICHED_CTE,
    _PARSED_CTE,
    register,
)
from logstash_filter_jdbc_static_spark.sources.transcripts import (
    SERVERS_CTE,
    TOOL_CATALOG_CTE,
    TRANSCRIPTS_CTE,
    load_transcripts,
    servers_df,
    with_ctes,
)
from logstash_filter_jdbc_static_spark.spec import PipelineSpec


def _ctes(*extra: str, body: str) -> str:
    return with_ctes(
        SERVERS_CTE, TOOL_CATALOG_CTE, TRANSCRIPTS_CTE, _PARSED_CTE,
        _ENRICHED_CTE, *extra, body=body,
    )


# ---------------------------------------- matched hoist (add_field)

@register(
    "pipeline_matched_hoist",
    _ctes(
        body="""
        SELECT conv_id, turn_idx,
               CASE WHEN from_ip IS NOT NULL
                    THEN coalesce(CASE WHEN s_ip IS NULL THEN 'unknown-server' ELSE s_name END, '')
                         || ' @ '
                         || coalesce(CASE WHEN s_ip IS NULL THEN 'NOWHERE' ELSE s_location END, '')
               END AS server_label
        FROM enriched
        """
    ),
)
def pipeline_matched_hoist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs/index.asciidoc:127-131: hoist nested lookup results to the
    event root via add_field, applied only to matched rows."""
    t = load_transcripts(spark, sf_dir)
    routed = enrich_and_route(t, build_enricher(spark))
    out = apply_matched_options(
        routed,
        add_field={
            "server_label": "%{[server][0][name]} @ %{[server][0][location]}"
        },
    )
    return out.select("conv_id", "turn_idx", "server_label")


# -------------------------------------------- salted agg (skew path)

@register(
    "pipeline_salted_counts",
    _ctes(
        body=f"""
        SELECT route, role, count(*) AS count
        FROM enriched
        GROUP BY 1, 2
        """
    ),
)
def pipeline_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation produces the same counts as the naive
    groupBy (the skew-defused physical plan for hot conv_ids)."""
    t = load_transcripts(spark, sf_dir)
    routed = enrich_and_route(t, build_enricher(spark))
    return salted_count(routed, ["route", "role"], order_cols=["conv_id"])


# --------------------------- conversation stats (stable turn order)

@register(
    "conv_turn_stats",
    with_ctes(
        TRANSCRIPTS_CTE,
        body=f"""
        SELECT conv_id,
               count(*) AS n_turns,
               min(turn_idx) AS first_turn,
               max(turn_idx) AS last_turn,
               CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
               max(length(text)) AS max_text_len,
               {conv_bucket_sql('conv_id')} AS conv_bucket
        FROM transcripts
        GROUP BY conv_id
        """,
    ),
)
def conv_turn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation rollup on the window-derived turn order: the
    stable (conv_id, turn_idx) invariant the north_rule requires."""
    from logstash_filter_jdbc_static_spark.operators.aggregate import conv_bucket

    t = load_transcripts(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.max(F.length("text")).alias("max_text_len"),
        conv_bucket(),
    )


# ------------------------------- dynamic-map parameter binding path

@register(
    "lookup_map_field_param",
    _ctes(
        body="""
        SELECT conv_id, turn_idx,
               CASE WHEN from_ip IS NULL THEN NULL
                    WHEN s_ip IS NULL THEN '' ELSE s_name END AS server_name
        FROM enriched
        """
    ),
)
def lookup_map_field_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-event-field path: grok extracts into a MapType
    ``parsed`` column and the lookup binds ``[parsed][from_ip]`` —
    the nested field-reference syntax of the reference (lookup.rb:29)."""
    t = load_transcripts(spark, sf_dir)
    parsed = GrokParser(TRANSCRIPT_GROK).apply(t, as_map=True)
    spec = PipelineSpec(
        lookups=[
            {
                "id": "server",
                "query": "SELECT name FROM servers WHERE ip = :ip",
                "parameters": {"ip": "[parsed][from_ip]"},
            }
        ]
    )
    enricher = LookupEnricher(spec, {"servers": servers_df(spark)})
    out = enricher.apply(parsed)
    return out.select(
        "conv_id",
        "turn_idx",
        F.coalesce(
            F.get(F.col("server"), 0).getField("name"),
            F.when(F.col("server").isNotNull(), F.lit("")),
        ).alias("server_name"),
    )
