from schemamap_spark.snapshots.manager import SnapshotManager

__all__ = ["SnapshotManager"]
