"""dibbs_ecr_refiner_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of CDCgov/dibbs-ecr-refiner
(reference read-only at /root/reference) as an idiomatic Spark engine:

- change-log tail (binlog/WAL-style batches of transcript mutations)
- duplicate-delivery dedup + last-writer-wins resolution by (ts, change_lsn)
- a vectorized refinement pass (condition-style filtering of turns down to
  pertinent role/tool/text content, mirroring the Refiner's eICR/RR trimming
  semantics — reference: refiner/app/services/ecr/refine.py:406-557)
- exactly-once MERGE into an Iceberg-shaped target table (manifest-committed
  parquet snapshots with per-bucket high-watermarks — reference analog:
  RefinerComplete manifest, refiner/app/lambda/lambda_function.py:276-295)
- schema evolution on write, resumable replay, per-batch lineage records.

Nothing here is a port: the reference's lxml tree mutation becomes DataFrame
expressions compiled once on the driver and executed by Catalyst/Tungsten.
"""

__version__ = "0.1.0"
