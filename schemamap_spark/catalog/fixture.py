"""Parquet-fixture catalog adapter — what tests and the correctness gate use."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from schemamap_spark.catalog.base import CatalogAdapter

DEFAULT_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures"
)


class FixtureCatalog(CatalogAdapter):
    def __init__(self, spark: SparkSession, fixture_dir: str = DEFAULT_FIXTURE_DIR):
        self.spark = spark
        self.dir = fixture_dir

    def _read(self, name: str, default_ok: bool = False) -> DataFrame:
        path = os.path.join(self.dir, f"{name}.parquet")
        if default_ok and not os.path.exists(path):
            # role/grant fixtures were added after the catalog fixtures; a
            # custom --fixtures dir predating them would break doctor(), which
            # used to fall back to the repo defaults — keep that behavior
            path = os.path.join(DEFAULT_FIXTURE_DIR, f"{name}.parquet")
        # route through the session-scoped relation cache (session.load_table,
        # r18): build_smo alone re-read four fixture relations per call at
        # ~80 ms each of pure listing+footer driver wall — identical metadata
        # for immutable fixture files. Data is still scanned per action; only
        # the resolved relation is reused. Callers that rewrite a fixture dir
        # mid-session (tools/gen_fixtures) run in their own process.
        from schemamap_spark.session import load_table

        return load_table(self.spark, os.path.dirname(path), name)

    def relations(self) -> DataFrame:
        return self._read("cat_rel")

    def columns(self) -> DataFrame:
        return self._read("cat_attr")

    def constraints(self) -> DataFrame:
        return self._read("cat_constr")

    def indexes(self) -> DataFrame:
        return self._read("cat_idx")

    def role_edges(self) -> DataFrame:
        return self._read("role_edges", default_ok=True)

    def table_grants(self) -> DataFrame:
        return self._read("table_grants", default_ok=True)
