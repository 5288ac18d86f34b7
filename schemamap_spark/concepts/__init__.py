from schemamap_spark.concepts.registry import ConceptRegistry
from schemamap_spark.concepts.builtins import BUILTIN_CONCEPTS
from schemamap_spark.concepts.status import status_aggregate

__all__ = ["ConceptRegistry", "BUILTIN_CONCEPTS", "status_aggregate"]
