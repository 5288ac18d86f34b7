from schemamap_spark.functions import text

__all__ = ["text"]
