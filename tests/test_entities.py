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
