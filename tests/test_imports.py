"""Import pipeline: staging → mapping → validation → merge → state machine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schemamap_spark.imports import ColumnRule, ImportPipeline, MigrationState
from schemamap_spark.imports.states import check_transition
from schemamap_spark.sources.merge import OptimisticLockError, merge_upsert
from schemamap_spark.sources.readers import read_staging_csv

FIX = "/root/repo/fixtures"


def test_full_import_run(spark):
    staging = read_staging_csv(spark, f"{FIX}/staging_organizations.csv")
    target = spark.read.parquet(f"{FIX}/organizations.parquet").select("id", "name", "website")

    pipe = ImportPipeline(spark)
    res = pipe.run(
        staging=staging,
        target=target,
        keys=["id"],
        column_mappings={
            "id": ("id", "identity"),
            "name": ("name", "trim_str"),
            "website": ("website", "identity"),
        },
        casts={"id": "bigint"},
        rules=[
            ColumnRule("name", not_null=True, min_length=3, max_length=255, unique=True),
            ColumnRule("website", like="http%"),
        ],
        mde_name="organizations",
        source="CSV",
    )
    assert res.state is MigrationState.IMPORTED
    assert res.loaded_rows == 200
    assert res.violation_rows > 0         # the fixture plants ~10 violations
    assert res.valid_rows + res.violation_rows == 200
    # trimmed names made it through the mapping
    merged_names = {r.name for r in res.merged.collect()}
    assert all(not n.startswith(" ") for n in merged_names if n)

    dm = pipe.data_migrations().collect()
    assert len(dm) == 1 and dm[0].state == "IMPORTED" and dm[0].version == 3


def test_fk_validation(spark):
    staging = read_staging_csv(spark, f"{FIX}/staging_projects.csv")
    orgs = spark.read.parquet(f"{FIX}/organizations.parquet")
    target = spark.read.parquet(f"{FIX}/projects.parquet").select(
        "id", "organization_id", "name"
    )
    pipe = ImportPipeline(spark)
    res = pipe.run(
        staging=staging,
        target=target,
        keys=["id"],
        column_mappings={
            "id": ("id", "identity"),
            "organization_id": ("organization_id", "identity"),
            "name": ("name", "trim_str"),
        },
        casts={"id": "bigint", "organization_id": "bigint"},
        rules=[ColumnRule("organization_id", fk=(orgs, "id"))],
        mde_name="projects",
    )
    assert res.state is MigrationState.IMPORTED
    assert res.violation_rows == 20  # planted orphans
    kinds = {v for r in res.violations.select("violations").collect() for v in r.violations}
    assert kinds == {"organization_id:fk"}


def test_state_machine_guards():
    with pytest.raises(ValueError):
        check_transition(MigrationState.LOADING, MigrationState.IMPORTED)
    check_transition(MigrationState.LOADING, MigrationState.LOADED)


def test_optimistic_lock_raises(spark):
    target = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "id long, name string, version long"
    )
    stale = spark.createDataFrame([(1, "A", 99)], "id long, name string, version long")
    with pytest.raises(OptimisticLockError):
        merge_upsert(target, stale, keys=["id"], update_cols=["name"], version_col="version")


def test_merge_inserts_unmatched(spark):
    target = spark.createDataFrame([(1, "a", 0)], "id long, name string, version long")
    updates = spark.createDataFrame(
        [(1, "A", 0), (2, "new", 0)], "id long, name string, version long"
    )
    out = {r.id: (r.name, r.version) for r in
           merge_upsert(target, updates, keys=["id"], update_cols=["name"],
                        version_col="version").collect()}
    assert out[1] == ("A", 1)    # matched: updated + version bump
    assert out[2] == ("new", 0)  # inserted with its version


def test_split_comma_mapping(spark):
    staging = read_staging_csv(spark, f"{FIX}/staging_organizations.csv")
    from schemamap_spark.mapping.bidi import BidiMappingRegistry

    reg = BidiMappingRegistry()
    fwd = reg.forward("split_comma_array")
    back = reg.backward("split_comma_array")
    rt = staging.select(
        "tags", back(fwd(F.col("tags"))).alias("roundtrip")
    ).filter(F.col("tags") != F.col("roundtrip"))
    assert rt.count() == 0  # exact=True mapping round-trips losslessly


def test_export_backward_roundtrip(spark):
    """exact=True mappings must round-trip: import forward then export
    backward reproduces the staging values."""
    staging = read_staging_csv(spark, f"{FIX}/staging_organizations.csv")
    pipe = ImportPipeline(spark)
    imported = staging.select(
        pipe.mappings.forward("split_comma_array")(F.col("tags")).alias("tags_arr"),
        F.col("tags").alias("orig"),
    )
    exported = pipe.export(imported, {"tags_arr": ("tags", "split_comma_array")})
    joined = imported.select("orig").join(
        exported.select(F.col("tags").alias("back")), F.col("orig") == F.col("back"), "left_anti"
    )
    # every original has a matching exported value (multiset equality via anti-join both ways)
    assert joined.count() == 0
