"""Tenants / MDEs / candidate ranking."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_tenants_default_empty_then_override(spark, engine):
    assert engine.entities.list_tenants().count() == 0
    fixture_dir = "/root/repo/fixtures"

    engine.entities.define_tenants(
        lambda s: s.read.parquet(f"{fixture_dir}/tenants.parquet")
    )
    t = engine.entities.list_tenants()
    assert t.count() == 25
    assert [f.name for f in t.schema.fields] == [
        "tenant_id", "tenant_short_name", "tenant_display_name", "tenant_locale", "tenant_data",
    ]
    assert engine.verify_installation()["tenants_defined"] is True


def test_mde_registry(spark, engine):
    engine.entities.define_master_data_entity(
        "organizations",
        lambda s: s.read.parquet("/root/repo/fixtures/organizations.parquet"),
    )
    assert [r.mde_name for r in engine.entities.list_mdes().collect()] == ["organizations"]
    assert spark.table("mde_organizations").count() == 200


def test_candidate_ranking(engine):
    cands = engine.master_data_entity_candidates()
    rows = cands.limit(10).collect()
    assert len(rows) == 10
    # scores in [0,1], descending
    probs = [r.probability_master_data for r in rows]
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert probs == sorted(probs, reverse=True)
    # master-data tables (small + heavily referenced dims) rank on top
    assert rows[0].table_name == "organizations"


def test_i18n_roundtrip(engine):
    doc = json.load(open("/root/repo/fixtures/i18n.json"))
    engine.update_i18n(doc)
    assert engine.i18n()["en"]["models"]["organizations"] == "Organizations"
    engine.update_i18n({"fr": {"models": {}}})
    assert set(engine.i18n()) == {"en", "de", "fr"}


def test_i18n_survives_engine_restart(spark, tmp_path):
    """With a warehouse the i18n store is persisted (reference keeps it
    in-database, SCHEMA:258-277) — a fresh engine over the same warehouse
    must see earlier updates."""
    from schemamap_spark import SchemamapEngine
    from schemamap_spark.catalog import FixtureCatalog

    wh = str(tmp_path / "wh")
    first = SchemamapEngine(spark, FixtureCatalog(spark), warehouse_dir=wh)
    first.update_i18n({"en": {"models": {"organizations": "Organizations"}}})
    first.update_i18n({"de": {"models": {}}})

    reborn = SchemamapEngine(spark, FixtureCatalog(spark), warehouse_dir=wh)
    assert set(reborn.i18n()) == {"en", "de"}
    assert reborn.i18n()["en"]["models"]["organizations"] == "Organizations"


def test_warehouse_on_file_uri(spark, tmp_path):
    """The engine warehouse rides the fscommit seam: a file:// warehouse
    (the sandbox's stand-in for hdfs://) supports the snapshot refresh
    swap, re-reading the persisted SMO, and the i18n store across an
    engine restart — identically to a plain-path warehouse."""
    from schemamap_spark import SchemamapEngine
    from schemamap_spark.catalog import FixtureCatalog

    wh = "file://" + str(tmp_path / "wh_uri")
    eng = SchemamapEngine(spark, FixtureCatalog(spark), warehouse_dir=wh)
    n1 = eng.refresh().count()
    assert n1 > 0
    n2 = eng.refresh().count()  # second refresh: swap over the existing dir
    assert n2 == n1
    import os

    assert not os.path.exists(str(tmp_path / "wh_uri" / "smo") + ".old")

    eng.update_i18n({"en": {"models": {"organizations": "Organizations"}}})
    reborn = SchemamapEngine(spark, FixtureCatalog(spark), warehouse_dir=wh)
    assert reborn.i18n()["en"]["models"]["organizations"] == "Organizations"

    plain = SchemamapEngine(
        spark, FixtureCatalog(spark), warehouse_dir=str(tmp_path / "wh_plain")
    )
    assert plain.refresh().count() == n1


def test_versioned_bootstrap_applies_once(tmp_path):
    """Flyway parity (reference core.clj:9-16): re-running init applies only
    missing versions; history records each applied migration."""
    from schemamap_spark.plans.versioning import Migration, SchemaVersionStore, apply_migrations

    wh = str(tmp_path)
    ran = []
    migs = [
        Migration(1, "layout", lambda: ran.append(1)),
        Migration(2, "seed", lambda: ran.append(2)),
    ]
    store = SchemaVersionStore(wh)
    assert apply_migrations(store, migs, dry_run=True) == ["V000001: layout", "V000002: seed"]
    assert ran == [] and store.current() == 0  # dry run: no actions, no records

    assert len(apply_migrations(store, migs)) == 2
    assert ran == [1, 2] and store.current() == 2
    assert apply_migrations(store, migs) == []  # idempotent re-run
    assert ran == [1, 2]

    migs.append(Migration(3, "upgrade", lambda: ran.append(3)))
    assert apply_migrations(store, migs) == ["V000003: upgrade"]
    assert store.current() == 3 and len(store.history()) == 3


def test_candidates_see_native_catalog_changes(spark):
    """ADVICE/VERDICT r18: SparkNativeCatalog's relations()/columns()
    enumerate the live Spark catalog EAGERLY into createDataFrame plans,
    so the engine's candidates plan memo would freeze the table set at
    first call. Such adapters must bypass the memo: a table created
    after the first candidates() call appears in the next one."""
    from schemamap_spark import SchemamapEngine
    from schemamap_spark.catalog import SparkNativeCatalog

    engine = SchemamapEngine(spark, SparkNativeCatalog(spark))
    spark.range(3).toDF("id").createOrReplaceTempView("_tmp_native_probe")
    spark.sql(
        "create table if not exists native_cand_a as select id from _tmp_native_probe"
    )
    try:
        first = engine.master_data_entity_candidates()
        names1 = {r.table_name for r in first.collect()}
        assert "native_cand_a" in names1
        assert "native_cand_b" not in names1

        spark.sql(
            "create table if not exists native_cand_b as "
            "select id from _tmp_native_probe"
        )
        names2 = {
            r.table_name for r in engine.master_data_entity_candidates().collect()
        }
        assert "native_cand_b" in names2  # the r18 staleness bug: memo froze this out
    finally:
        spark.sql("drop table if exists native_cand_a")
        spark.sql("drop table if exists native_cand_b")
        spark.catalog.dropTempView("_tmp_native_probe")


def test_candidates_memo_cleared_by_refresh(engine):
    """For lazy adapters the candidates plan memo is valid across calls
    (same prepared frame) but refresh() — the explicit re-read-the-catalog
    signal — must drop it."""
    c1 = engine.master_data_entity_candidates()
    assert engine.master_data_entity_candidates() is c1  # plan reuse
    engine.refresh()
    assert engine.master_data_entity_candidates() is not c1
