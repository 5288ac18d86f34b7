"""schemamap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of schemamap/schemamap (reference at
/root/reference, studied for behavior only; architecture is Spark-first).

Layers:
  catalog/    adapters producing raw metadata DataFrames (fixture / JDBC / native)
  smo/        schema-metadata-overview builder (nested constraint/index structs)
  concepts/   dynamic boolean column classifiers + the `status` aggregate
  entities/   tenants, master-data entities, candidate ranking
  mapping/    bidirectional value-mapping function registry
  imports/    staging → mapping → validation → merge pipeline + state machine
  sources/    readers (csv/json/jdbc/parquet) and sinks (append/upsert/merge)
  operators/  large-scale data ops: dedup, similarity search, multimodal
  functions/  scalar/text-analysis column functions
  plans/      dry-run / explain helpers
  streaming/  Structured Streaming ops over event streams
  snapshots/  warehouse snapshot/restore bookkeeping
"""

from schemamap_spark.engine import SchemamapEngine

__all__ = ["SchemamapEngine"]
__version__ = "0.1.0"
