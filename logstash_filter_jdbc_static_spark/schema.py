"""Schema system: Derby SQL type strings -> Spark types, and the fixed
transcript fact schema.

The reference declares lookup-table schemas up-front as ``[name,
SQL-type-string]`` pairs (db_object.rb:48-99, column.rb:21-37; docs example
``["ip", "varchar(64)"]`` at docs/index.asciidoc:511-519).  Types are raw
Derby strings checked only at table-build time; we map them to Spark types
at spec-validation time instead, failing fast like the reference's eager
connection check (basic_database.rb:85-115).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Fact-table schema per BASELINE.json input_hint: one row = one turn
# (== one Logstash event, jdbc_static.rb:154-157).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Derby/ANSI SQL type string -> Spark type. Parametrized types are matched
# on the base name; decimal keeps precision/scale.
_SIMPLE_TYPES: dict[str, T.DataType] = {
    "varchar": T.StringType(),
    "char": T.StringType(),
    "text": T.StringType(),
    "clob": T.StringType(),
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "real": T.FloatType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "blob": T.BinaryType(),
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^(?:decimal|numeric)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$")
_PARAM_RE = re.compile(r"^([a-z ]+?)\s*\(\s*\d+\s*\)$")


def derby_type_to_spark(type_str: str) -> T.DataType:
    """Map a Derby SQL type string (e.g. ``varchar(64)``) to a Spark type.

    Raises ``ValueError`` for unknown types — the reference defers this to
    Derby's table-build (docs/index.asciidoc:517-519); we fail at validation.
    """
    s = type_str.strip().lower()
    m = _DECIMAL_RE.match(s)
    if m:
        precision = int(m.group(1) or 10)
        scale = int(m.group(2) or 0)
        return T.DecimalType(precision, scale)
    base = s
    m = _PARAM_RE.match(s)
    if m:
        base = m.group(1).strip()
    if base in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[base]
    raise ValueError(f"unsupported column type {type_str!r}")


def columns_to_struct(columns: list[list[str]] | list[tuple[str, str]]) -> T.StructType:
    """``[[name, type-string], ...]`` (db_object.rb:73-88) -> StructType."""
    fields = []
    for pair in columns:
        if not isinstance(pair, (list, tuple)) or len(pair) != 2:
            raise ValueError(f"the columns array field must have arrays of two strings, got {pair!r}")
        name, type_str = pair
        fields.append(T.StructField(str(name), derby_type_to_spark(str(type_str)), True))
    return T.StructType(fields)
