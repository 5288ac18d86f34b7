"""The `status` one-row dashboard aggregate.

Spark rendering of the reference's status view (reference
rust/create_schemamap_schema.sql:1237-1260): distinct counts, composite
distinct counts, and a battery of FILTERed counts — all in ONE agg() pass so
the SMO is scanned exactly once (map-side partial aggregation applies; at
scale this is a single shuffle of tiny partial-agg rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _count_where(cond) -> F.Column:
    return F.count(F.when(cond, F.lit(1)))


def status_aggregate(wide: DataFrame) -> DataFrame:
    """`wide` is the concept-extended columns view (ConceptRegistry.wide_columns)."""
    tbl = F.struct("schema_name", "table_name")
    return wide.agg(
        F.countDistinct("schema_name").alias("schema_count"),
        F.countDistinct("schema_name", "table_name").alias("table_count"),
        F.count(F.lit(1)).alias("column_count"),
        F.count_distinct(F.when(F.col("is_schema_migration_table"), tbl)).alias("schema_migration_table_count"),
        F.count_distinct(F.when(F.col("is_ignored_table"), tbl)).alias("ignored_table_count"),
        _count_where(F.col("is_pii")).alias("pii_count"),
        _count_where(F.col("is_metadata")).alias("metadata_count"),
        _count_where(F.col("is_primary_key")).alias("primary_key_count"),
        _count_where(F.col("is_foreign_key")).alias("foreign_key_count"),
        _count_where(F.col("is_unique_key")).alias("unique_key_count"),
        _count_where(F.col("is_check_constrained")).alias("check_constrained_count"),
        _count_where(F.col("is_exclusion_constrained")).alias("exclusion_constrained_count"),
        _count_where(F.col("is_indexed")).alias("indexed_count"),
        _count_where(F.col("is_generated")).alias("generated_count"),
        _count_where(F.col("is_natural_key")).alias("natural_key_count"),
        _count_where(F.col("is_surrogate_key")).alias("surrogate_key_count"),
        _count_where(F.col("is_self_reference")).alias("self_reference_count"),
        _count_where(F.col("is_external_reference")).alias("external_reference_count"),
    )
