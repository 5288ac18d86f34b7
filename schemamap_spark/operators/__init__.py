from schemamap_spark.operators.graph import transitive_closure

__all__ = ["transitive_closure"]
