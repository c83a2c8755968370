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


# ------------------------------------------------------- reconstruction
# Events reshaped as transcript turns (user_id ≙ conversation, event types
# mapped onto transcript roles) so every renderer in the reconstructor
# registry (operators/reconstruct.py, ≙ SECTION_RECONSTRUCTORS) is
# exercised and oracle-checked: the SQL re-derives each renderer's exact
# field extraction + formatting.

_T_SQL = """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS turn_idx,
           CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
                WHEN 'error' THEN 'tool' WHEN 'purchase' THEN 'system'
                ELSE event_type END AS role,
           props AS text,
           CASE WHEN event_type = 'error'
                THEN 't' || CAST(CAST(FLOOR(value) AS BIGINT) % 3 AS VARCHAR) END AS tool,
           ts
    FROM events
"""

# per-role renderer lines, in SQL (must match operators/reconstruct.py
# byte-for-byte)
_USER_LINE_SQL = f"""
    SELECT conv_id,
           'USER[n=' || COUNT(*) || '] ' ||
           string_agg(turn_idx || ':' || substring(coalesce(text, ''), 1, 24),
                      ' / ' ORDER BY turn_idx) AS line
    FROM ({_T_SQL}) WHERE role = 'user' GROUP BY conv_id
"""
_ASSISTANT_LINE_SQL = f"""
    SELECT conv_id,
           'ASSISTANT[n=' || COUNT(*) || ' reconstructed=' ||
           SUM(CASE WHEN text LIKE '[reconstructed%' THEN 1 ELSE 0 END) ||
           '] last=' || arg_max(substring(coalesce(text, ''), 1, 24), turn_idx) AS line
    FROM ({_T_SQL}) WHERE role = 'assistant' GROUP BY conv_id
"""
_TOOL_LINE_SQL = f"""
    SELECT conv_id, 'TOOL[n=' || SUM(n) || '] ' ||
           string_agg(cell, ' / ' ORDER BY tool) AS line
    FROM (
      SELECT conv_id, coalesce(tool, 'none') AS tool, COUNT(*) AS n,
             coalesce(tool, 'none') || ':n=' || COUNT(*) ||
             ',first=' || MIN(turn_idx) || ',last=' || MAX(turn_idx) AS cell
      FROM ({_T_SQL}) WHERE role = 'tool'
      GROUP BY conv_id, coalesce(tool, 'none'))
    GROUP BY conv_id
"""
_SYSTEM_LINE_SQL = f"""
    SELECT conv_id,
           'SYSTEM[n=' || COUNT(*) || '] last=' ||
           arg_max(substring(coalesce(text, ''), 1, 24), turn_idx) AS line
    FROM ({_T_SQL}) WHERE role = 'system' GROUP BY conv_id
"""
_GENERIC_LINE_SQL = f"""
    SELECT conv_id, role, role || '_turns=' || COUNT(*) AS line
    FROM ({_T_SQL}) WHERE role NOT IN ('user', 'assistant', 'tool', 'system')
    GROUP BY conv_id, role
"""


def _transcripts(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    et = F.col("event_type")
    role = (
        F.when(et == "click", "user")
        .when(et == "view", "assistant")
        .when(et == "error", "tool")
        .when(et == "purchase", "system")
        .otherwise(et)
    )
    tool = F.when(
        et == "error",
        F.concat(F.lit("t"), (F.floor("value").cast("long") % 3).cast("string")),
    )
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        role.alias("role"),
        F.col("props").alias("text"),
        tool.alias("tool"),
        F.col("ts"),
    )


def _summary_of(transcripts: DataFrame) -> DataFrame:
    from ..operators.reconstruct import SUMMARY_TURN_IDX, reconstruct

    out = reconstruct(transcripts)
    return out.where(F.col("turn_idx") == SUMMARY_TURN_IDX).select(
        "conv_id", F.col("text").alias("summary")
    )


@q(
    "reconstruct_summary",
    f"""
    WITH lines AS (
      SELECT conv_id, 'user' AS role, line FROM ({_USER_LINE_SQL})
      UNION ALL SELECT conv_id, 'assistant', line FROM ({_ASSISTANT_LINE_SQL})
      UNION ALL SELECT conv_id, 'tool', line FROM ({_TOOL_LINE_SQL})
      UNION ALL SELECT conv_id, 'system', line FROM ({_SYSTEM_LINE_SQL})
      UNION ALL SELECT conv_id, role, line FROM ({_GENERIC_LINE_SQL}))
    SELECT conv_id, string_agg(line, '; ' ORDER BY role) AS summary
    FROM lines GROUP BY conv_id
    """,
)
def reconstruct_summary(spark, sf):
    """The flagship grouped-map pandas UDF (A5): all five registry
    renderers composing one summary turn per conversation, compared to a
    SQL oracle that re-derives every renderer's field extraction."""
    return _summary_of(_transcripts(spark, sf))


def _one_renderer_query(role: str):
    def query(spark, sf):
        t = _transcripts(spark, sf).where(F.col("role") == role)
        return _summary_of(t)

    return query


@q("reconstruct_user_timeline", f"SELECT conv_id, line AS summary FROM ({_USER_LINE_SQL})")
def reconstruct_user_timeline(spark, sf):
    """A5 renderer 1/5 in isolation: per-turn timeline table (turn_idx +
    fixed-width snippet, document order) ≙ reconstruction.py:520-767."""
    return _one_renderer_query("user")(spark, sf)


@q("reconstruct_assistant_findings", f"SELECT conv_id, line AS summary FROM ({_ASSISTANT_LINE_SQL})")
def reconstruct_assistant_findings(spark, sf):
    """A5 renderer 2/5: reconstruction accounting + latest-utterance
    extraction."""
    return _one_renderer_query("assistant")(spark, sf)


@q("reconstruct_tool_calls", f"SELECT conv_id, line AS summary FROM ({_TOOL_LINE_SQL})")
def reconstruct_tool_calls(spark, sf):
    """A5 renderer 3/5: per-tool call table (count, first/last turn) — the
    tool-call-args analog of the reference's medication table."""
    return _one_renderer_query("tool")(spark, sf)


@q("reconstruct_system_notices", f"SELECT conv_id, line AS summary FROM ({_SYSTEM_LINE_SQL})")
def reconstruct_system_notices(spark, sf):
    """A5 renderer 4/5: notice count + most-recent-notice extraction."""
    return _one_renderer_query("system")(spark, sf)


@q(
    "reconstruct_generic",
    f"""
    SELECT conv_id, string_agg(line, '; ' ORDER BY role) AS summary
    FROM ({_GENERIC_LINE_SQL}) GROUP BY conv_id
    """,
)
def reconstruct_generic(spark, sf):
    """A5 renderer 5/5: the generic fallback for unregistered roles."""
    t = _transcripts(spark, sf).where(
        ~F.col("role").isin("user", "assistant", "tool", "system")
    )
    return _summary_of(t)
