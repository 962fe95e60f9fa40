"""Parse stage: grok-style field extraction from the ``text`` column.

The reference consumes already-parsed Logstash events; the north_rule puts
the parse stage inside this engine: named-group regex patterns are
compiled to native ``regexp_extract`` expressions (JVM-side, inside
whole-stage codegen — no per-row Python, per BASELINE.json input_hint).
Rows where a required field fails to extract are the "invalid parameter"
analogue (lookup.rb:28-35) and get routed to the malformed sink.

A small grok-pattern dictionary is included so pipelines can be declared
with familiar ``%{IPV4:from_ip}`` syntax; it compiles down to one combined
Java regex per pattern.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# Minimal grok dictionary (public logstash-patterns-core shapes).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPORHOST": r"(?:\d{1,3}\.){3}\d{1,3}|[\w.-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
}

_GROK_REF_RE = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok pattern into (java_regex, [field names]).

    Named captures become positional groups; the returned field list maps
    group index -> output column name.
    """
    fields: list[str] = []

    def _sub(m: re.Match) -> str:
        name, alias = m.group(1), m.group(2)
        if name not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = GROK_PATTERNS[name]
        if alias:
            fields.append(alias)
            return f"({body})"
        return f"(?:{body})"

    regex = _GROK_REF_RE.sub(_sub, pattern)
    return regex, fields


class GrokParser:
    """Extract fields from ``text`` with one regexp per field group.

    ``required``: fields whose extraction failure marks the row malformed
    (empty extract => null field => downstream invalid-parameter routing).
    """

    def __init__(
        self,
        pattern: str,
        source: str = "text",
        required: list[str] | None = None,
    ):
        self.regex, self.fields = compile_grok(pattern)
        self.source = source
        self.required = list(required or [])
        unknown = [f for f in self.required if f not in self.fields]
        if unknown:
            raise ValueError(f"required fields {unknown} not captured by pattern")

    def extract_column(self, name: str) -> Column:
        idx = self.fields.index(name) + 1
        ext = F.regexp_extract(F.col(self.source), self.regex, idx)
        return F.when(ext == "", F.lit(None)).otherwise(ext)

    def apply(self, df: DataFrame, as_map: bool = False) -> DataFrame:
        """Add one column per captured field (or a single ``parsed`` map
        column when ``as_map`` — the dynamic-event-field analogue)."""
        if as_map:
            pairs: list[Column] = []
            for f_name in self.fields:
                pairs.append(F.lit(f_name))
                pairs.append(self.extract_column(f_name))
            return df.withColumn("parsed", F.create_map(*pairs))
        for f_name in self.fields:
            df = df.withColumn(f_name, self.extract_column(f_name))
        return df

    def malformed_predicate(self) -> Column:
        """True when any required field failed to extract."""
        if not self.required:
            return F.lit(False)
        cond = F.lit(False)
        for f_name in self.required:
            cond = cond | F.col(f_name).isNull()
        return cond
