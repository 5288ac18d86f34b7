from schemamap_spark.mapping.bidi import BidiMappingRegistry, BidiMapping

__all__ = ["BidiMappingRegistry", "BidiMapping"]
