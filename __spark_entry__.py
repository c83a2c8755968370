"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1 shape) on sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  training-data ops), each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents. Queries without
  an oracle entry (approx sketches, mapInPandas plumbing) get the driver's
  rows-only check.

Implementations live in dibbs_ecr_refiner_spark.queries.*.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dibbs_ecr_refiner_spark.queries import all_oracles, all_queries
from dibbs_ecr_refiner_spark.queries.relational import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
