from schemamap_spark.sources.merge import merge_upsert, OptimisticLockError
from schemamap_spark.sources.readers import read_staging_csv, read_json_doc

__all__ = ["merge_upsert", "OptimisticLockError", "read_staging_csv", "read_json_doc"]
