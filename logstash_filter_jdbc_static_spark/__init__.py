"""PySpark-native enrichment engine with the capabilities of
logstash-plugins/logstash-filter-jdbc_static.

The reference (read-only at /root/reference) is a per-event JRuby filter
backed by an embedded in-memory Apache Derby SQL store: remote "loader"
queries snapshot dimension tables locally, per-event "lookup" queries with
:named / ? positional parameters enrich events, tag_on_failure /
tag_on_default_use drive downstream routing
(lib/logstash/filters/jdbc_static.rb:154-157, lib/logstash/filters/jdbc/lookup.rb).

This engine re-expresses those semantics set-oriented and Spark-first:

- dimension snapshots  -> small DataFrames + ``F.broadcast`` hash joins
- :param / ? binding   -> derived join-key columns (Getfier/Sprintfier)
- per-event loop       -> one Catalyst plan over the whole fact table
- tags + routing       -> ``when/otherwise`` column logic + fan-out sinks
- cron reload          -> dimension refresh with an atomic snapshot swap

plus the parse -> enrich -> route -> aggregate pipeline and large-scale
training-data operators (dedup, similarity, text analysis) this engine is
meant to serve at 100 TB scale.
"""

__version__ = "0.1.0"

from logstash_filter_jdbc_static_spark.spec import (  # noqa: F401
    LocalDbObject,
    LoaderSpec,
    LookupSpec,
    PipelineSpec,
    ValidationError,
)
