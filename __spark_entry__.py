"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query on sf0.001 — per-nation order-status
  distribution with map aggregation + broadcast joins (exercises the engine's
  join/agg/struct paths end-to-end).
- queries(): every implemented operator from SURVEY.md §2 (relational Q01-Q26,
  catalog analytics over the repo fixtures, dedup/similarity/text/multimodal
  training-data ops, event-stream windowing).
- oracle_sql(): DuckDB-runnable equivalents; omitted only for genuinely
  engine-specific ops (simhash/LSH bucketing), which get rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module by file path from any cwd; make the
# engine package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: status-style relational slice over sf0.001."""
    from schemamap_spark.suite.relational import q19_map_agg

    return q19_map_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from schemamap_spark.suite import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from schemamap_spark.suite import ORACLE_SQL

    return dict(ORACLE_SQL)
