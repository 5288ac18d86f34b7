"""Structural guards for the JDBC Postgres catalog adapter's pushdown SQL
(no live server in this container — these pin the introspection surface)."""

from __future__ import annotations

from schemamap_spark.catalog.jdbc import (
    COLUMNS_SQL,
    CONSTRAINTS_SQL,
    INDEXES_SQL,
    RELATIONS_SQL,
)


def test_relations_sql_shape():
    s = RELATIONS_SQL.lower()
    assert "pg_catalog.pg_class" in s and "pg_catalog.pg_namespace" in s
    assert "relkind in ('r','v','m')" in s
    for alias in ("schema_name", "table_name", "object_type", "has_usage", "approx_rows"):
        assert alias in s
    assert "'pg_catalog'" in s and "'information_schema'" in s  # ignored schemas


def test_columns_sql_shape():
    s = COLUMNS_SQL.lower()
    assert "pg_catalog.pg_attribute" in s
    assert "att.attnum > 0" in s and "not att.attisdropped" in s
    assert "format_type" in s and "pg_get_expr" in s and "col_description" in s


def test_constraints_sql_shape():
    s = CONSTRAINTS_SQL.lower()
    assert "pg_catalog.pg_constraint" in s
    assert "pg_get_constraintdef" in s
    assert "union all" in s and "attgenerated" in s  # generated-column pseudo-constraints
    assert "'generated_column'" in s


def test_indexes_sql_shape():
    s = INDEXES_SQL.lower()
    assert "pg_catalog.pg_index" in s
    assert "indisprimary = false" in s and "ix.indisvalid" in s
    assert "regexp_replace(pg_get_indexdef" in s


def test_engine_doctor_api(spark, engine):
    rep = engine.doctor()
    assert "schemamap_readonly" in rep["roles_reaching_schemamap"]
    assert rep["smo_columns"] > 1300
    assert isinstance(rep["installation"]["mdes_defined"], bool)
    some_grantee = sorted(rep["grants"])[0]
    assert all(isinstance(v, int) for v in rep["grants"][some_grantee].values())


def test_fixture_catalog_role_fixtures_fall_back(spark, tmp_path):
    """A custom fixture dir without role_edges/table_grants parquet (they were
    added later than the catalog fixtures) must fall back to the repo defaults
    instead of breaking doctor()."""
    import shutil

    from schemamap_spark.catalog.fixture import DEFAULT_FIXTURE_DIR, FixtureCatalog

    custom = tmp_path / "fixtures"
    custom.mkdir()
    for f in ("cat_rel", "cat_attr", "cat_constr", "cat_idx"):
        shutil.copy(f"{DEFAULT_FIXTURE_DIR}/{f}.parquet", custom / f"{f}.parquet")
    cat = FixtureCatalog(spark, str(custom))
    assert cat.role_edges().count() > 0
    assert cat.table_grants().count() > 0
    # catalog fixtures still come from the custom dir
    assert cat.relations().count() > 0
