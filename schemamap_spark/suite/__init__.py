"""Declared correctness suite (SURVEY.md §2.3 + training-data ops).

Each query exists twice: a Spark DataFrame program (SPARK_QUERIES) and an
ANSI-SQL oracle for DuckDB (ORACLE_SQL). The driver — and our own
tests/test_oracle_parity.py — runs both at sf0.01 and compares row count,
schema, and order-insensitive value hash. Column aliases MUST match pairwise.
"""

from __future__ import annotations

from schemamap_spark.suite import catalog_suite, imports_suite, llm, relational, streams

SPARK_QUERIES = {}
ORACLE_SQL = {}
for mod in (relational, catalog_suite, llm, streams, imports_suite):
    SPARK_QUERIES.update(mod.SPARK_QUERIES)
    ORACLE_SQL.update(mod.ORACLE_SQL)

__all__ = ["SPARK_QUERIES", "ORACLE_SQL"]
