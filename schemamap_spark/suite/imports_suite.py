"""Import-pipeline and doctor correctness queries (oracle-checked).

- import_validation: the validation stage of the import pipeline over the
  staging_organizations fixture — per-rule violation counts must equal a
  DuckDB recomputation of the same rules.
- doctor_grants: the doctor's grant aggregation (reference
  rust/src/doctor.rs:101-126) — nested map agg built then exploded back to
  rows for engine-neutral comparison (same technique as q19).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.catalog.fixture import DEFAULT_FIXTURE_DIR

FIX = DEFAULT_FIXTURE_DIR


def import_validation(spark, sf):
    from schemamap_spark.imports import ColumnRule, validate
    from schemamap_spark.sources.readers import read_staging_csv

    staging = read_staging_csv(spark, f"{FIX}/staging_organizations.csv")
    mapped = staging.select(
        F.col("id").cast("bigint").alias("id"),
        F.trim("name").alias("name"),
        F.col("website"),
    )
    checked = validate(
        mapped,
        [
            ColumnRule("name", not_null=True, min_length=3, max_length=255, unique=True),
            ColumnRule("website", like="http%"),
        ],
    )
    return (
        checked.select("id", F.explode("violations").alias("violation"))
        .groupBy("violation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("violation")
    )


def doctor_grants(spark, sf):
    grants = spark.read.parquet(f"{FIX}/table_grants.parquet")
    per = (
        grants.groupBy("grantee", "privilege_type")
        .agg(F.countDistinct("table_schema", "table_name").alias("table_count"))
    )
    # build the nested map (the operator under test), then explode back
    mapped = per.groupBy("grantee").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("privilege_type", "table_count")))
        ).alias("m")
    )
    return (
        mapped.select("grantee", F.explode("m").alias("privilege_type", "table_count"))
        .orderBy("grantee", "privilege_type")
    )


SPARK_QUERIES = {
    "import_validation": import_validation,
    "doctor_grants": doctor_grants,
}

ORACLE_SQL = {
    "import_validation": f"""
        with s as (
          select cast(id as bigint) as id, trim(name) as name, website
          from read_parquet('{FIX}/staging_organizations_csv.parquet')
        ),
        dups as (select name, count(*) as c from s group by 1),
        v as (
          select s.id, unnest(list_filter([
            case when s.name is null then 'name:not_null' end,
            case when s.name is not null and length(s.name) < 3 then 'name:min_length' end,
            case when s.name is not null and length(s.name) > 255 then 'name:max_length' end,
            case when s.name is not null and d.c > 1 then 'name:unique' end,
            case when s.website is not null and s.website not like 'http%' then 'website:like' end
          ], x -> x is not null)) as violation
          from s left join dups d on s.name = d.name
        )
        select violation, count(*) as n from v group by 1 order by 1
    """,
    "doctor_grants": f"""
        select grantee, privilege_type,
               count(distinct (table_schema, table_name)) as table_count
        from read_parquet('{FIX}/table_grants.parquet')
        group by 1, 2 order by 1, 2
    """,
}
