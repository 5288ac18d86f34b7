"""Postgres ↔ Spark type-name mapping.

The reference stores Postgres `format_type` spellings as data
(rust/create_schemamap_schema.sql:863: "character varying(50)", "timestamp
with time zone", …); keeping both spellings convertible preserves golden
fidelity when moving metadata between a Postgres-backed catalog and
Spark-native storage (SURVEY.md §7.3 flags this explicitly).
"""

from __future__ import annotations

import re

# base-name mappings (parameterless)
_PG_TO_SPARK = {
    "text": "string",
    "bigint": "bigint",
    "integer": "int",
    "smallint": "smallint",
    "boolean": "boolean",
    "real": "float",
    "double precision": "double",
    "timestamp with time zone": "timestamp",
    "timestamp without time zone": "timestamp_ntz",
    "date": "date",
    "uuid": "string",
    "jsonb": "string",
    "json": "string",
    "bytea": "binary",
    "name": "string",
    "oid": "bigint",
}

_SPARK_TO_PG = {
    "string": "text",
    "bigint": "bigint",
    "long": "bigint",
    "int": "integer",
    "integer": "integer",
    "smallint": "smallint",
    "short": "smallint",
    "boolean": "boolean",
    "float": "real",
    "double": "double precision",
    "timestamp": "timestamp with time zone",
    "timestamp_ntz": "timestamp without time zone",
    "date": "date",
    "binary": "bytea",
}

_VARCHAR_RE = re.compile(r"^character varying\((\d+)\)$")
_NUMERIC_RE = re.compile(r"^numeric\((\d+),(\d+)\)$")
_ARRAY_RE = re.compile(r"^(.*)\[\]$")


def pg_type_to_spark(pg: str) -> str:
    """Postgres format_type spelling → Spark SQL type string."""
    pg = pg.strip().lower()
    m = _ARRAY_RE.match(pg)
    if m:
        return f"array<{pg_type_to_spark(m.group(1))}>"
    m = _VARCHAR_RE.match(pg)
    if m:
        return "string"  # Spark has no length-parameterized varchar in practice
    m = _NUMERIC_RE.match(pg)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if pg == "numeric":
        return "decimal(38,18)"
    return _PG_TO_SPARK.get(pg, "string")


def spark_type_to_pg(spark_type: str) -> str:
    """Spark SQL type string → Postgres spelling (for JDBC sinks / metadata)."""
    s = spark_type.strip().lower()
    m = re.match(r"^array<(.*)>$", s)
    if m:
        return f"{spark_type_to_pg(m.group(1))}[]"
    m = re.match(r"^decimal\((\d+),(\d+)\)$", s)
    if m:
        return f"numeric({m.group(1)},{m.group(2)})"
    m = re.match(r"^varchar\((\d+)\)$", s)
    if m:
        return f"character varying({m.group(1)})"
    return _SPARK_TO_PG.get(s, "text")
