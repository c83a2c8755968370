from .table import LakeTable, SnapshotConflict  # noqa: F401
