from schemamap_spark.smo.builder import build_smo, SMO_COLUMNS

__all__ = ["build_smo", "SMO_COLUMNS"]
