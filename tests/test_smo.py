"""SMO builder tests — shape, canonicalization, privilege filtering, what-if.

Mirrors the reference's integration assertions (core_test.clj:133-254).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.smo.builder import SMO_COLUMNS, build_smo


def test_smo_shape(engine):
    smo = engine.smo()
    assert [f.name for f in smo.schema.fields] == SMO_COLUMNS
    assert smo.schema["constraints"].dataType.elementType["name"].dataType.typeName() == "string"
    assert smo.schema["indexes"].dataType.elementType["immediate"].dataType.typeName() == "boolean"
    assert smo.count() > 1300  # FIXTURES.md scale target


def test_privilege_filter(engine):
    # 'internal' schema has has_usage=false and must be invisible
    smo = engine.smo()
    assert smo.filter(F.col("schema_name") == "internal").count() == 0


def test_constraint_arrays_sorted_and_nonnull(engine):
    smo = engine.smo()
    bad = smo.filter(F.col("constraints").isNull() | F.col("indexes").isNull()).count()
    assert bad == 0
    # arrays are sort_array-canonical: sorting again changes nothing
    changed = smo.filter(
        (F.sort_array("constraints") != F.col("constraints"))
        | (F.sort_array("indexes") != F.col("indexes"))
    ).count()
    assert changed == 0


def test_pk_lands_on_id_column(engine):
    smo = engine.smo()
    row = smo.filter(
        (F.col("schema_name") == "public")
        & (F.col("table_name") == "organizations")
        & (F.col("column_name") == "id")
    ).collect()[0]
    types = [c["type"] for c in row["constraints"]]
    assert "p" in types


def test_what_if_refresh(spark, engine):
    """Reference what-if test (core_test.clj:209-254): drop a table from the
    catalog → refresh → counts change → restore → counts back."""
    from schemamap_spark.catalog import FixtureCatalog

    class DroppingCatalog(FixtureCatalog):
        def relations(self):
            return super().relations().filter(
                ~((F.col("schema_name") == "public") & (F.col("table_name") == "projects"))
            )

    from schemamap_spark import SchemamapEngine

    base_count = engine.smo().count()
    eng2 = SchemamapEngine(spark, DroppingCatalog(spark))
    dropped_count = eng2.smo().count()
    assert dropped_count < base_count
    # restore = fresh engine over the unmodified catalog
    eng3 = SchemamapEngine(spark, FixtureCatalog(spark))
    assert eng3.smo().count() == base_count


def test_smo_diff_detects_drift(spark):
    """Column-granular drift: dropped table -> removed rows; new column ->
    added; type/nullability flips -> changed with attr details; identical
    snapshots (including array reordering) -> empty diff."""
    from schemamap_spark.catalog.fixture import FixtureCatalog
    from schemamap_spark.smo.builder import build_smo, smo_diff
    from pyspark.sql import functions as F

    old = build_smo(FixtureCatalog(spark)).persist()

    # identical snapshots: zero drift even if array order perturbs
    same = old.withColumn("constraints", F.reverse("constraints"))
    assert smo_diff(old, same).count() == 0

    # drop one table, retype one column, add one column
    victim = old.select("schema_name", "table_name").first()
    new = old.filter(
        ~((F.col("schema_name") == victim.schema_name)
          & (F.col("table_name") == victim.table_name))
    )
    # retype one surviving column and add one new column (data-driven: the
    # fixture's column names are generated, so pick from what exists)
    target = new.select("schema_name", "table_name", "column_name").first()
    is_target = (
        (F.col("schema_name") == target.schema_name)
        & (F.col("table_name") == target.table_name)
        & (F.col("column_name") == target.column_name)
    )
    new = new.withColumn(
        "data_type",
        F.when(is_target, F.lit("character varying(99)")).otherwise(F.col("data_type")),
    )
    extra = old.filter(
        (F.col("schema_name") == target.schema_name)
        & (F.col("table_name") == target.table_name)
        & (F.col("column_name") == target.column_name)
    ).withColumn("column_name", F.lit("brand_new_col"))
    new = new.unionByName(extra)

    d = smo_diff(old, new).persist()
    by_change = {r["change"] for r in d.select("change").distinct().collect()}
    assert by_change == {"added", "removed", "changed"}
    removed = d.filter(F.col("change") == "removed")
    assert removed.filter(
        (F.col("schema_name") == victim.schema_name)
        & (F.col("table_name") == victim.table_name)
    ).count() == removed.count() > 0
    changed = d.filter(F.col("change") == "changed").collect()
    assert len(changed) == 1
    assert changed[0].column_name == target.column_name
    assert any("character varying(99)" in s for s in changed[0].details)
    added = d.filter(F.col("change") == "added").collect()
    assert [r.column_name for r in added] == ["brand_new_col"]
