from schemamap_spark.catalog.base import CatalogAdapter, IGNORED_SCHEMAS
from schemamap_spark.catalog.fixture import FixtureCatalog
from schemamap_spark.catalog.native import SparkNativeCatalog
from schemamap_spark.catalog.jdbc import JdbcPostgresCatalog

__all__ = ["CatalogAdapter", "FixtureCatalog", "SparkNativeCatalog", "JdbcPostgresCatalog", "IGNORED_SCHEMAS"]
