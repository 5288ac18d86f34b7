from schemamap_spark.entities.candidates import master_data_entity_candidates
from schemamap_spark.entities.registry import EntityRegistry, TENANTS_SCHEMA

__all__ = ["master_data_entity_candidates", "EntityRegistry", "TENANTS_SCHEMA"]
