"""filter_matched common options: add_field / remove_field applied ONLY
to matched events (jdbc_static.rb:156 gates filter_matched on all
lookups returning true; docs example hoists
``%{[server][0][description]}`` to the event root,
docs/index.asciidoc:127-131).

Field templates support the Logstash sprintf syntax with nested paths
including array indexes (``[target][0][field]``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from logstash_filter_jdbc_static_spark.operators.processor import MATCHED_COL

_SPRINTF_SPLIT = re.compile(r"(%\{[^}]+\})")
_FIELD_REF = re.compile(r"\[([^\]]+)\]")


def resolve_ref(df: DataFrame, ref: str) -> Column:
    """``[server][0][description]`` -> get(col('server'), 0).description;
    bare names pass through. Numeric segments index arrays (null-safe)."""
    segments = _FIELD_REF.findall(ref) or [ref]
    col: Column | None = None
    for seg in segments:
        if col is None:
            col = F.col(seg)
        elif seg.lstrip("-").isdigit():
            col = F.get(col, int(seg))
        else:
            col = col.getField(seg)
    assert col is not None
    return col


def sprintf_column(df: DataFrame, template: str) -> Column:
    parts = [p for p in _SPRINTF_SPLIT.split(template) if p != ""]
    cols = [
        resolve_ref(df, p[2:-1]).cast("string")
        if p.startswith("%{") and p.endswith("}")
        else F.lit(p)
        for p in parts
    ]
    return F.concat(*cols) if len(cols) > 1 else cols[0]


def apply_matched_options(
    df: DataFrame,
    add_field: dict[str, str] | None = None,
    remove_field: list[str] | None = None,
) -> DataFrame:
    """add_field values are sprintf templates; applied only where
    ``matched`` is true (unmatched rows get null / keep the field)."""
    out = df
    for name, template in (add_field or {}).items():
        out = out.withColumn(
            name,
            F.when(F.col(MATCHED_COL), sprintf_column(out, template)),
        )
    for name in remove_field or []:
        # removal is also matched-gated in Logstash; a column can't be
        # half-dropped, so unmatched rows keep their value and matched
        # rows are nulled — unless ALL rows matched, then drop outright.
        out = out.withColumn(
            name, F.when(~F.col(MATCHED_COL), F.col(name))
        )
    return out
