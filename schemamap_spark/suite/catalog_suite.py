"""Catalog-analytics correctness queries over the repo fixtures
(SURVEY.md §2.3 Q17, Q18, Q20, Q22–Q25).

The Spark side runs the REAL engine paths (SMO builder, concept registry,
status aggregate, candidate ranking, closure operator, merge recipes); the
DuckDB oracle recomputes each answer independently from the raw fixture
parquet with plain SQL — so the engine's join/agg pipeline is genuinely
cross-checked, not self-compared.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.catalog.fixture import DEFAULT_FIXTURE_DIR, FixtureCatalog

FIX = DEFAULT_FIXTURE_DIR


def _p(name: str) -> str:
    return f"read_parquet('{FIX}/{name}.parquet')"


def _engine(spark):
    """One engine per SparkSession: the SMO is built once (localCheckpoint
    materializes it), so repeated status/candidate queries replan against a
    materialized frame instead of rebuilding the introspection pipeline —
    the same behavior a real deployment gets from the persisted matview.
    Cached as an attribute of the session object itself (an id()-keyed dict
    could collide after the interpreter reuses a GC'd session's id)."""
    from schemamap_spark import SchemamapEngine

    eng = getattr(spark, "_schemamap_suite_engine", None)
    if eng is None:
        eng = SchemamapEngine(spark, FixtureCatalog(spark))
        spark._schemamap_suite_engine = eng
    return eng


# --- Q17: EXISTS over nested constraint array (P8) ---------------------------
def q17_exists_nested(spark, sf):
    smo = _engine(spark).smo()
    return smo.filter(F.exists("constraints", lambda c: c["type"] == "p")).agg(
        F.count(F.lit(1)).alias("pk_col_cnt")
    )


# --- Q18: array-membership join (J3) — explode → equi-join ---------------------
def q18_array_membership_join(spark, sf):
    attr = spark.read.parquet(f"{FIX}/cat_attr.parquet")
    con = spark.read.parquet(f"{FIX}/cat_constr.parquet")
    exploded = con.select(
        "schema_name", "table_name", F.explode("keys").alias("attnum")
    )
    joined = attr.join(exploded, ["schema_name", "table_name", "attnum"])
    return joined.agg(F.count(F.lit(1)).alias("membership_cnt"))


# --- Q20: recursive closure (J7) -----------------------------------------------
def q20_transitive_closure(spark, sf):
    from schemamap_spark.operators.graph import transitive_closure

    edges = spark.read.parquet(f"{FIX}/role_edges.parquet")
    return transitive_closure(edges).orderBy("member", "roleof")


# --- Q22: the status aggregate (X3/X4/A6) ----------------------------------------
def q22_status(spark, sf):
    return _engine(spark).status()


# --- Q23: MDE candidate ranking (A11/O2) -------------------------------------------
def q23_candidates(spark, sf):
    cands = _engine(spark).master_data_entity_candidates()
    return cands.select(
        "schema_name",
        "table_name",
        "approx_rows",
        "foreign_key_count",
        F.round("probability_master_data", 6).alias("probability_master_data"),
    ).limit(10)


# --- Q24: idempotent upsert (S11) ----------------------------------------------------
def q24_upsert_idempotent(spark, sf):
    from schemamap_spark.mapping.bidi import BidiMappingRegistry, _SEED

    reg = BidiMappingRegistry()
    for m in _SEED:  # re-apply the seed: ON CONFLICT DO UPDATE → same 3 rows
        reg.upsert(m)
    return reg.to_df(spark).orderBy("name")


# --- Q25: optimistic-lock merge (X8) ---------------------------------------------------
def q25_optimistic_merge(spark, sf):
    from schemamap_spark.sources.merge import merge_upsert

    orgs = spark.read.parquet(f"{FIX}/organizations.parquet")
    target = orgs.select("id", "name", "website", F.lit(0).cast("bigint").alias("version"))
    updates = (
        target.filter(F.col("id") <= 15)
        .select("id", F.upper(F.col("name")).alias("name"), "version")
    )
    merged = merge_upsert(
        target, updates, keys=["id"], update_cols=["name"], version_col="version"
    )
    return merged.select("id", "name", "version").orderBy("id")


SPARK_QUERIES = {
    "q17_exists_nested": q17_exists_nested,
    "q18_array_membership_join": q18_array_membership_join,
    "q20_transitive_closure": q20_transitive_closure,
    "q22_status": q22_status,
    "q23_candidates": q23_candidates,
    "q24_upsert_idempotent": q24_upsert_idempotent,
    "q25_optimistic_merge": q25_optimistic_merge,
}

# Shared oracle scaffolding: per-column constraint/index flags from the raw
# catalog fixtures (recomputes what the SMO builder + concepts derive).
_FLAGS_CTE = f"""
with rel as (
  select * from {_p('cat_rel')} where has_usage
),
base as (
  select a.schema_name, a.table_name, a.column_name, a.attnum, a.default_value
  from {_p('cat_attr')} a
  join rel r on a.schema_name = r.schema_name and a.table_name = r.table_name
),
conk as (
  select schema_name, table_name, constraint_type, definition, sequence_name,
         unnest(keys) as attnum
  from {_p('cat_constr')}
),
cflag as (
  select schema_name, table_name, attnum,
    bool_or(constraint_type = 'p') as has_p,
    bool_or(constraint_type = 'f') as has_f,
    bool_or(constraint_type = 'u') as has_u,
    bool_or(constraint_type = 'c') as has_c,
    bool_or(constraint_type = 'x') as has_x,
    bool_or(constraint_type = 'g') as has_g,
    bool_or(constraint_type = 'p' and sequence_name is null) as has_pnoseq,
    bool_or(constraint_type = 'f' and
            position((' references ' || lower(table_name) || '(') in lower(definition)) > 0)
      as has_selfref
  from conk group by 1, 2, 3
),
ik as (
  select schema_name, table_name, index_type, unnest(keys) as attnum
  from {_p('cat_idx')}
),
iflag as (
  select schema_name, table_name, attnum,
    bool_or(index_type = 'u') as idx_u,
    bool_or(index_type = 'i') as idx_i,
    bool_or(index_type = 'x') as idx_x
  from ik group by 1, 2, 3
),
wide as (
  select b.schema_name, b.table_name, b.column_name,
    regexp_matches(lower(b.column_name),
      '(?i)^(email|first_name|last_name|full_name|middle_name|phone|telephone|mobile|address|street|city|state|zip|postal|ssn|social_security|dob|date_of_birth|birthdate|credit_card|ccn|card_number|passport|driver_license|license_number|national_id|tax_id|tin|ein|bank_account|account_number|routing_number|iban|bic|swift|personal_id|medicare|medicaid|health_insurance|policy_number|insurance_number|patient_id|member_id|user_id|username|login|password|secret|token|api_key|auth)')
      as is_pii,
    b.column_name in ('created_at', 'updated_at', 'version') as is_metadata,
    b.table_name in ('schema_migrations','flyway_schema_history','databasechangelog',
      'databasechangeloglock','django_migrations','alembic_version','alembic_version_table',
      'knex_migrations','knex_migrations_lock','phinxlog','typeorm_metadata','goose_db_version')
      as is_migr,
    coalesce(c.has_p, false) as is_pk,
    coalesce(c.has_f, false) as is_fk,
    coalesce(c.has_u, false) or coalesce(i.idx_u, false) as is_uk,
    coalesce(c.has_c, false) as is_check,
    coalesce(c.has_x, false) as is_excl,
    coalesce(c.has_p, false) or coalesce(c.has_x, false)
      or coalesce(i.idx_i, false) or coalesce(i.idx_x, false) as is_indexed,
    coalesce(c.has_g, false) as is_gen,
    coalesce(c.has_pnoseq, false) and b.default_value is null as is_natural,
    coalesce(c.has_p, false)
      and not (coalesce(c.has_pnoseq, false) and b.default_value is null) as is_surrogate,
    coalesce(c.has_selfref, false) as is_selfref,
    not coalesce(c.has_f, false) and (
      lower(b.column_name) like '%_id' or lower(b.column_name) like '%url%' or
      lower(b.column_name) like '%uri%' or lower(b.column_name) like '%_ref%' or
      lower(b.column_name) like '%_code%' or lower(b.column_name) like '%uuid%' or
      lower(b.column_name) like '%guid%' or lower(b.column_name) like '%external_%')
      as is_extref
  from base b
  left join cflag c on b.schema_name = c.schema_name and b.table_name = c.table_name
                    and b.attnum = c.attnum
  left join iflag i on b.schema_name = i.schema_name and b.table_name = i.table_name
                    and b.attnum = i.attnum
)
"""

ORACLE_SQL = {
    "q17_exists_nested": _FLAGS_CTE + "select count(*) as pk_col_cnt from wide where is_pk",
    "q18_array_membership_join": f"""
        select count(*) as membership_cnt
        from {_p('cat_attr')} a
        join (select schema_name, table_name, unnest(keys) as attnum from {_p('cat_constr')}) c
          on a.schema_name = c.schema_name and a.table_name = c.table_name
         and a.attnum = c.attnum
    """,
    "q20_transitive_closure": f"""
        with recursive cl(member, roleof) as (
          select member, roleof from {_p('role_edges')}
          union
          select cl.member, e.roleof
          from cl join {_p('role_edges')} e on cl.roleof = e.member
        )
        select member, roleof from cl order by 1, 2
    """,
    "q22_status": _FLAGS_CTE + """
        select
          count(distinct schema_name) as schema_count,
          count(distinct (schema_name, table_name)) as table_count,
          count(*) as column_count,
          count(distinct (schema_name, table_name)) filter (where is_migr)
            as schema_migration_table_count,
          count(distinct (schema_name, table_name)) filter (where is_migr)
            as ignored_table_count,
          count(*) filter (where is_pii) as pii_count,
          count(*) filter (where is_metadata) as metadata_count,
          count(*) filter (where is_pk) as primary_key_count,
          count(*) filter (where is_fk) as foreign_key_count,
          count(*) filter (where is_uk) as unique_key_count,
          count(*) filter (where is_check) as check_constrained_count,
          count(*) filter (where is_excl) as exclusion_constrained_count,
          count(*) filter (where is_indexed) as indexed_count,
          count(*) filter (where is_gen) as generated_count,
          count(*) filter (where is_natural) as natural_key_count,
          count(*) filter (where is_surrogate) as surrogate_key_count,
          count(*) filter (where is_selfref) as self_reference_count,
          count(*) filter (where is_extref) as external_reference_count
        from wide
    """,
    "q23_candidates": f"""
        with ts as (
          select r.schema_name, r.table_name, r.approx_rows,
            (select count(*) from {_p('cat_constr')} c
              where c.constraint_type = 'f'
                and c.ref_schema = r.schema_name and c.ref_table = r.table_name)
              as foreign_key_count
          from {_p('cat_rel')} r
          where r.object_type = 'r' and r.has_usage
        ),
        mm as (
          select min(approx_rows) as mn, max(approx_rows) as mx,
                 min(foreign_key_count) as mnf, max(foreign_key_count) as mxf
          from ts
        )
        select schema_name, table_name, approx_rows, foreign_key_count,
          round(coalesce(
            case when mxf = mnf and mxf = 0
              then (mx - approx_rows) * 1.0 / nullif(mx - mn, 0)
              else 0.5 * ((mx - approx_rows) * 1.0 / nullif(mx - mn, 0))
                 + 0.5 * ((foreign_key_count - mnf) * 1.0 / nullif(mxf - mnf, 0))
            end, 0), 6) as probability_master_data
        from ts, mm
        order by coalesce(
            case when mxf = mnf and mxf = 0
              then (mx - approx_rows) * 1.0 / nullif(mx - mn, 0)
              else 0.5 * ((mx - approx_rows) * 1.0 / nullif(mx - mn, 0))
                 + 0.5 * ((foreign_key_count - mnf) * 1.0 / nullif(mxf - mnf, 0))
            end, 0) desc, schema_name, table_name
        limit 10
    """,
    "q24_upsert_idempotent": f"select name, i18n, forward_fn_name, backward_fn_name, "
                             f"input_type, exact from {_p('bidi_mapping_fns')} order by name",
    "q25_optimistic_merge": f"""
        select id,
               case when id <= 15 then upper(name) else name end as name,
               cast(case when id <= 15 then 1 else 0 end as bigint) as version
        from {_p('organizations')}
        order by id
    """,
}
