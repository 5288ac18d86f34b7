from schemamap_spark.sources.merge import merge_upsert, OptimisticLockError
from schemamap_spark.sources.readers import read_staging_csv, read_json_doc
from schemamap_spark.sources.shards import (
    assign_shards,
    read_training_shards,
    shard_stats,
    write_training_shards,
)

__all__ = [
    "merge_upsert",
    "OptimisticLockError",
    "read_staging_csv",
    "read_json_doc",
    "assign_shards",
    "read_training_shards",
    "shard_stats",
    "write_training_shards",
]
