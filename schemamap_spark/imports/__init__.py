from schemamap_spark.imports.pipeline import ImportPipeline, ImportResult
from schemamap_spark.imports.states import MigrationState, VALID_TRANSITIONS
from schemamap_spark.imports.validation import ColumnRule, validate

__all__ = [
    "ImportPipeline", "ImportResult", "MigrationState", "VALID_TRANSITIONS",
    "ColumnRule", "validate",
]
