"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

This is the correctness surface the driver checks (row-count + schema +
order-insensitive value-hash at sf0.01). Column names/types are aligned
between both engines; complex payloads are projected to deterministic
scalars (sorted, stringified) so hashes are stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from logstash_filter_jdbc_static_spark.operators.aggregate import (
    conv_bucket_sql,
    sink_counts,
)
from logstash_filter_jdbc_static_spark.operators.parse import GrokParser
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.operators.route import with_route
from logstash_filter_jdbc_static_spark.plans.pipeline import (
    TOOL_DEFAULT,
    build_enricher,
    enrich_and_route,
    flagship_spec,
    routed_projection,
    run_pipeline,
)
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

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------
# Shared oracle fragments (DuckDB dialect). The oracle re-derives the
# lookup/tag/route semantics independently as plain SQL — it does not
# share any Spark code path.
# --------------------------------------------------------------------

_PARSED_CTE = r"""
parsed AS (
  SELECT t.*,
         nullif(regexp_extract(text, 'from_ip=((?:\d{1,3}\.){3}\d{1,3})', 1), '') AS from_ip
  FROM transcripts t
)
"""

_ENRICHED_CTE = """
enriched AS (
  SELECT p.*,
         s.ip AS s_ip, s.name AS s_name, s.location AS s_location,
         tc.tool AS tc_tool, tc.category AS tc_category,
         tc.owner AS tc_owner, tc.risk_level AS tc_risk_level,
         CASE WHEN p.from_ip IS NULL THEN 'malformed'
              WHEN s.ip IS NULL OR tc.tool IS NULL THEN 'miss'
              ELSE 'hit' END AS route
  FROM parsed p
  LEFT JOIN servers s ON s.ip = p.from_ip
  LEFT JOIN tool_catalog tc ON tc.tool = p.tool
)
"""


def _pipeline_ctes(*extra: str, body: str) -> str:
    return with_ctes(
        SERVERS_CTE, TOOL_CATALOG_CTE, TRANSCRIPTS_CTE, _PARSED_CTE, _ENRICHED_CTE,
        *extra, body=body,
    )


# --------------------------------------------------------------------
# 1. Flagship pipeline: per-sink aggregate counts (north_rule oracle)
# --------------------------------------------------------------------

@register(
    "pipeline_route_counts",
    _pipeline_ctes(
        body=f"""
        SELECT route, role, tool,
               {conv_bucket_sql('conv_id')} AS conv_bucket,
               count(*) AS n_turns
        FROM enriched
        GROUP BY 1, 2, 3, 4
        """
    ),
)
def pipeline_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    _, counts = run_pipeline(t, spark)
    return counts


# --------------------------------------------------------------------
# 2. Flagship pipeline: routed rows (row-level equality incl. per-turn
#    text equality under stable (conv_id, turn_idx) ordering)
# --------------------------------------------------------------------

@register(
    "pipeline_routed_rows",
    _pipeline_ctes(
        body=f"""
        SELECT conv_id, turn_idx, role, tool, text, route,
               CASE WHEN from_ip IS NULL THEN NULL
                    WHEN s_ip IS NULL THEN 'unknown-server' ELSE s_name END AS server_name,
               CASE WHEN from_ip IS NULL THEN NULL
                    WHEN s_ip IS NULL THEN 'NOWHERE' ELSE s_location END AS server_location,
               CASE WHEN tc_tool IS NULL THEN '{TOOL_DEFAULT["category"]}' ELSE tc_category END AS tool_category,
               CASE WHEN tc_tool IS NULL THEN '{TOOL_DEFAULT["owner"]}' ELSE tc_owner END AS tool_owner,
               CASE WHEN tc_tool IS NULL THEN {TOOL_DEFAULT["risk_level"]} ELSE tc_risk_level END AS tool_risk,
               concat_ws(',',
                 CASE WHEN from_ip IS NULL THEN '_jdbcstaticfailure' END,
                 CASE WHEN (from_ip IS NOT NULL AND s_ip IS NULL) OR tc_tool IS NULL
                      THEN '_jdbcstaticdefaultsused' END) AS tags_str,
               (from_ip IS NOT NULL) AS matched
        FROM enriched
        """
    ),
)
def pipeline_routed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    routed, _ = run_pipeline(t, spark)
    return routed_projection(routed)


# --------------------------------------------------------------------
# 3. Single equi lookup, hit path (A5/A6 Getfier + broadcast hash join)
# --------------------------------------------------------------------

@register(
    "lookup_equi_hit",
    _pipeline_ctes(
        body="""
        SELECT conv_id, turn_idx, from_ip,
               CASE WHEN from_ip IS NULL THEN NULL ELSE coalesce(s_name, '') END AS server_name,
               CASE WHEN from_ip IS NULL THEN NULL ELSE coalesce(s_location, '') END AS server_location,
               CASE WHEN from_ip IS NULL THEN NULL
                    WHEN s_ip IS NULL THEN 0 ELSE 1 END AS n_matches
        FROM enriched
        """
    ),
)
def lookup_equi_hit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    spec = PipelineSpec(
        lookups=[
            {
                "id": "server",
                "query": "SELECT name, location FROM servers WHERE ip = :ip",
                "parameters": {"ip": "from_ip"},
            }
        ]
    )
    enricher = LookupEnricher(spec, {"servers": servers_df(spark)})
    parsed = GrokParser("from_ip=%{IPV4:from_ip}").apply(t)
    out = enricher.apply(parsed)
    # valid-but-empty without default => [] (spec/filters/jdbc_static_spec.rb:98-105)
    return out.select(
        "conv_id",
        "turn_idx",
        "from_ip",
        F.coalesce(F.get(F.col("server"), 0).getField("name"),
                   F.when(F.col("server").isNotNull(), F.lit(""))).alias("server_name"),
        F.coalesce(F.get(F.col("server"), 0).getField("location"),
                   F.when(F.col("server").isNotNull(), F.lit(""))).alias("server_location"),
        F.size(F.col("server")).cast("int").alias("n_matches"),
    )


# --------------------------------------------------------------------
# 4. Suffix-LIKE pattern lookup (A6 Sprintfier "%%{[x]}" — the canonical
#    rspec case, spec/filters/jdbc_static_spec.rb:90-96)
# --------------------------------------------------------------------

@register(
    "lookup_like_suffix",
    _pipeline_ctes(
        r"""
        suffixed AS (
          SELECT p.*, nullif(regexp_extract(text, 'from_ip=\d+((?:\.\d+)+)', 1), '') AS ip_suffix
          FROM parsed p
        )
        """,
        body="""
        SELECT x.conv_id, x.turn_idx, x.ip_suffix,
               CASE WHEN x.ip_suffix IS NULL THEN NULL ELSE coalesce(s.name, '') END AS server_name,
               CASE WHEN x.ip_suffix IS NULL THEN NULL ELSE coalesce(s.location, '') END AS server_location
        FROM suffixed x
        LEFT JOIN servers s ON s.ip LIKE '%' || x.ip_suffix
        """
    ),
)
def lookup_like_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    parsed = t.withColumn(
        "ip_suffix",
        F.nullif(F.regexp_extract(F.col("text"), r"from_ip=\d+((?:\.\d+)+)", 1), F.lit("")),
    )
    spec = PipelineSpec(
        lookups=[
            {
                "id": "server",
                "query": "SELECT name, location FROM servers WHERE ip LIKE :ip",
                "parameters": {"ip": "%%{[ip_suffix]}"},
            }
        ]
    )
    enricher = LookupEnricher(spec, {"servers": servers_df(spark)})
    out = enricher.apply(parsed)
    return out.select(
        "conv_id",
        "turn_idx",
        "ip_suffix",
        F.coalesce(F.get(F.col("server"), 0).getField("name"),
                   F.when(F.col("server").isNotNull(), F.lit(""))).alias("server_name"),
        F.coalesce(F.get(F.col("server"), 0).getField("location"),
                   F.when(F.col("server").isNotNull(), F.lit(""))).alias("server_location"),
    )


# --------------------------------------------------------------------
# 5. Miss + default_hash + tag_on_default_use (A10)
# --------------------------------------------------------------------

@register(
    "lookup_default_miss",
    _pipeline_ctes(
        body=f"""
        SELECT conv_id, turn_idx, tool,
               CASE WHEN tc_tool IS NULL THEN '{TOOL_DEFAULT["category"]}' ELSE tc_category END AS tool_category,
               CASE WHEN tc_tool IS NULL THEN {TOOL_DEFAULT["risk_level"]} ELSE tc_risk_level END AS tool_risk,
               CASE WHEN tc_tool IS NULL THEN '_jdbcstaticdefaultsused' ELSE '' END AS tags_str
        FROM enriched
        """
    ),
)
def lookup_default_miss(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    spec = PipelineSpec(
        lookups=[
            {
                "id": "toolinfo",
                "query": "SELECT category, owner, risk_level FROM tool_catalog WHERE tool = :tool",
                "parameters": {"tool": "tool"},
                "default_hash": TOOL_DEFAULT,
            }
        ]
    )
    enricher = LookupEnricher(spec, {"tool_catalog": tool_catalog_df(spark)})
    out = enricher.apply(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.get(F.col("toolinfo"), 0).getField("category").alias("tool_category"),
        F.get(F.col("toolinfo"), 0).getField("risk_level").alias("tool_risk"),
        F.array_join(F.col("tags"), ",").alias("tags_str"),
    )


# --------------------------------------------------------------------
# 6. Prepared positional `?` parameters (A7) — same results as named
# --------------------------------------------------------------------

@register(
    "lookup_prepared_positional",
    _pipeline_ctes(
        body="""
        SELECT conv_id, turn_idx,
               CASE WHEN from_ip IS NULL THEN NULL
                    WHEN s_ip IS NULL THEN '' ELSE s_name END AS server_name
        FROM enriched
        """
    ),
)
def lookup_prepared_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    spec = PipelineSpec(
        lookups=[
            {
                "id": "server",
                "query": "SELECT name FROM servers WHERE ip = ?",
                "prepared_parameters": ["from_ip"],
            }
        ]
    )
    enricher = LookupEnricher(spec, {"servers": servers_df(spark)})
    parsed = GrokParser("from_ip=%{IPV4:from_ip}").apply(t)
    out = enricher.apply(parsed)
    return out.select(
        "conv_id",
        "turn_idx",
        F.coalesce(F.get(F.col("server"), 0).getField("name"),
                   F.when(F.col("server").isNotNull(), F.lit(""))).alias("server_name"),
    )


# --------------------------------------------------------------------
# 7. Multi-row fan-in: duplicate-key dim -> array payload regrouped so
#    one input turn stays one output turn (2B last row)
# --------------------------------------------------------------------

TOOL_ALIAS_ROWS = [
    ("tool_0", "srch"), ("tool_0", "find"), ("tool_1", "dev"),
    ("tool_2", "web"), ("tool_2", "surf"), ("tool_2", "nav"),
    ("tool_4", "sqlx"),
]
_TOOL_ALIAS_CTE = (
    "tool_aliases(tool, alias) AS (VALUES "
    + ", ".join(f"('{t}', '{a}')" for t, a in TOOL_ALIAS_ROWS)
    + ")"
)


@register(
    "lookup_multirow_fanin",
    _pipeline_ctes(
        _TOOL_ALIAS_CTE,
        body="""
        SELECT e.conv_id, e.turn_idx, e.tool,
               count(a.alias) AS n_aliases,
               coalesce(array_to_string(list_sort(list(a.alias) FILTER (WHERE a.alias IS NOT NULL)), ','), '') AS aliases_str
        FROM enriched e
        LEFT JOIN tool_aliases a ON a.tool = e.tool
        GROUP BY 1, 2, 3
        """
    ),
)
def lookup_multirow_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    aliases = spark.createDataFrame(
        TOOL_ALIAS_ROWS,
        T.StructType(
            [
                T.StructField("tool", T.StringType(), False),
                T.StructField("alias", T.StringType(), False),
            ]
        ),
    )
    spec = PipelineSpec(
        lookups=[
            {
                "id": "aliases",
                "query": "SELECT alias FROM tool_aliases WHERE tool = :tool",
                "parameters": {"tool": "tool"},
            }
        ]
    )
    enricher = LookupEnricher(spec, {"tool_aliases": aliases})
    out = enricher.apply(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.size("aliases").cast("long").alias("n_aliases"),
        F.array_join(
            F.array_sort(F.transform(F.col("aliases"), lambda x: x.getField("alias"))), ","
        ).alias("aliases_str"),
    )


def queries() -> dict[str, QueryFn]:
    _load_plugins()
    return {k: v for k, v in QUERIES.items() if k not in _consolidated()}


def oracle_sql() -> dict[str, str]:
    _load_plugins()
    return {k: v for k, v in ORACLES.items() if k not in _consolidated()}


def _consolidated() -> dict[str, str]:
    """Part queries folded into a merged gate entry (queries_merged):
    excluded from the driver-facing registry — the driver's
    CORRECTNESS gate runs only the first 50 entries, so overlapping
    operator exercisers share one gated row. The part functions stay
    registered/importable for tests and the merged joins."""
    from logstash_filter_jdbc_static_spark.queries_merged import CONSOLIDATED

    return CONSOLIDATED


def _load_plugins() -> None:
    """Import sibling query modules so their @register calls run."""
    import logstash_filter_jdbc_static_spark.queries_data  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline2  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline3  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline4  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline5  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline6  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline7  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline8  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_pipeline9  # noqa: F401
    import logstash_filter_jdbc_static_spark.queries_relational  # noqa: F401
    # LAST: joins the part registrations above into merged gate entries
    import logstash_filter_jdbc_static_spark.queries_merged  # noqa: F401
