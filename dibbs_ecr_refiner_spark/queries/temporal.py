"""Temporal join operators Spark lacks natively (SURVEY §2.3 note:
"range/as-of join"), plus the grouped-map reconstruction exposed as an
oracle-checked query.

- as-of join: composed from a union + last_value window (no cross/theta
  join; one sort shuffle on the natural key) — the pattern that survives
  scale because state per key is one running value.
- range join: bucketize the range key + equi-join on (key, bucket) +
  residual filter — candidate pairs shuffle on the bucket, never n².
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/events.parquet")


@q(
    "asof_join",
    """
    SELECT e.event_id, e.user_id, p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_join(spark, sf):
    """For each error event, the most recent prior purchase by the same
    user. Union + running last_value over one window — a single sort
    shuffle keyed on user_id, O(1) state per key."""
    ev = _events(spark, sf)
    tagged = ev.where(F.col("event_type").isin("error", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_p = F.col("event_type") == "purchase"
    enriched = tagged.withColumn(
        "purchase_event_id",
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True).over(w),
    ).withColumn(
        "purchase_value",
        F.last(F.when(is_p, F.col("value")), ignorenulls=True).over(w),
    )
    return enriched.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "purchase_event_id", "purchase_value"
    )


@q(
    "range_join_bucketed",
    """
    SELECT a.event_id AS a, b.event_id AS b
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id <> b.event_id
     AND b.ts > a.ts - INTERVAL 10 MINUTE AND b.ts <= a.ts
    """,
)
def range_join_bucketed(spark, sf):
    """Pairs of events by the same user within a trailing 10-minute window.
    Expressed as bucketize(600s) → equi-join on (user, bucket∈{b,b-1}) →
    residual filter: the shuffle key is (user, bucket), so the join scales
    with bucket occupancy instead of degenerating into an inequality
    (broadcast-nested-loop) join."""
    ev = _events(spark, sf).select(
        "event_id", "user_id", "ts", (F.unix_timestamp("ts") / 600).cast("long").alias("bkt")
    )
    a = ev.select(
        F.col("event_id").alias("a"), "user_id", F.col("ts").alias("ts_a"), "bkt"
    ).withColumn("probe", F.explode(F.array(F.col("bkt"), F.col("bkt") - 1)))
    b = ev.select(
        F.col("event_id").alias("b"),
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ts_b"),
        F.col("bkt").alias("bkt_b"),
    )
    joined = a.join(b, (F.col("user_id") == F.col("u2")) & (F.col("probe") == F.col("bkt_b")))
    return joined.where(
        (F.col("a") != F.col("b"))
        & (F.col("ts_b") > F.col("ts_a") - F.expr("INTERVAL 10 MINUTE"))
        & (F.col("ts_b") <= F.col("ts_a"))
    ).select("a", "b")


def _role_line_sql() -> str:
    # mirrors operators/reconstruct.py's generic renderer for roles without
    # a registered reconstructor
    return """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           string_agg(line, '; ' ORDER BY role) AS summary
    FROM (
      SELECT user_id, event_type AS role,
             event_type || '_turns=' || COUNT(*) AS line
      FROM events GROUP BY user_id, event_type)
    GROUP BY user_id
    """


@q("reconstruct_summary", _role_line_sql())
def reconstruct_summary(spark, sf):
    """The flagship grouped-map pandas UDF (A5) against driver data: events
    reshaped as transcript turns (user ≙ conversation, event_type ≙ role),
    reconstructed per conversation, summary rows compared to a SQL oracle
    that re-derives the registry's generic renderer."""
    from ..operators.reconstruct import SUMMARY_TURN_IDX, reconstruct

    ev = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )
    out = reconstruct(transcripts)
    return out.where(F.col("turn_idx") == SUMMARY_TURN_IDX).select(
        "conv_id", F.col("text").alias("summary")
    )
