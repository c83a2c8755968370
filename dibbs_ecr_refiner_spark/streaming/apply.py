"""Structured Streaming front-end for the CDC apply.

The reference is micro-batch event-driven (SQS → Lambda,
refiner/app/lambda/lambda_function.py:150-345); batch-incremental replay is
therefore the engine's primary mode (engine.ReplayEngine). This module is
the same apply expressed as a *stream*: ``readStream`` tails the change-log
directory, and ``foreachBatch`` routes every micro-batch through the exact
same prepare_delta → LakeTable.merge pipeline.

Exactly-once story (≙ SURVEY §2.9 row 1):
- the file source is replayable and checkpointed (offsets = seen files);
- micro-batch epoch ids are stable across restarts for unprocessed data;
- ``merge`` is idempotent per batch id, so a crash between "epoch processed"
  and "checkpoint advanced" makes the re-run a no-op — the same
  at-least-once-source + idempotent-sink ⇒ exactly-once argument as the
  reference's deterministic output identity (ecr/augment.py:124-133).

Late/out-of-order data needs no watermark here: LWW against the target's
stored (ts, change_lsn) makes stale arrivals lose deterministically — state
is bounded by the target row, not by stream history.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..engine import ReplayEngine
from ..lake.table import LakeTable
from ..plans.config import RefinePlan

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("op", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("change_lsn", T.LongType()),
        T.StructField("ingest_file", T.StringType()),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
    ]
)


def stream_replay(
    spark: SparkSession,
    log_path: str,
    table: LakeTable,
    plan: RefinePlan,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    mode: str = "auto",
    fold_every: int | None = None,
):
    """Tail ``log_path`` as a stream and MERGE each micro-batch.

    With ``available_now=True`` the query drains everything currently in
    the log and stops (the batch-replay analog, good for tests/backfill);
    with False it runs continuously. ``mode="auto"`` (default, same rule
    as batch replay) resolves per micro-batch: COW while the batch is
    large relative to the table, MOR once the table dwarfs it — which for
    a long-running stream means MOR (the low-latency choice: commit cost
    O(micro-batch), independent of table size). Fold governance stays
    explicit here (``fold_every`` epochs, or ``maintenance.should_fold``
    out of band) — a continuous stream has no "completion" to fold at."""
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    changes = reader.parquet(log_path)

    eng = ReplayEngine(spark, table, plan)

    def handle(df, epoch_id: int):
        res = eng.apply_batch(df, f"epoch-{epoch_id:08d}", mode=mode)
        if (
            fold_every
            and not res.get("skipped")
            and (epoch_id + 1) % fold_every == 0
        ):
            eng.fold_deltas()

    writer = changes.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_between_lakes(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    checkpoint_dir: str,
    transform=None,
    available_now: bool = True,
    mode: str = "mor",
    max_versions_per_batch: int | None = None,
):
    """Bronze → silver: tail ``src``'s change stream with the native
    ``lake_cdc`` source (lake/stream_source.py) and LWW-merge each
    micro-batch into ``dst`` — a derived lake table maintained by
    Structured Streaming end to end, no external change log.

    ``transform`` (optional, DataFrame -> DataFrame) runs per micro-batch
    and must be row-wise-deterministic and preserve the key/order/
    ``_deleted`` columns: the change stream is at-least-once per offset
    span on a crash boundary, and row-wise transforms keep redelivered
    rows identical so ``dst``'s per-batch-id skip + LWW absorb them
    (same exactly-once argument as ``stream_replay``; a cross-row
    transform would break the per-key replay equivalence). Tombstones flow
    through: a delete in ``src`` deletes in ``dst``.

    Maintenance on ``src`` (fold/compact/rebucket) is invisible to the
    chain — the source skips rewrite commits — so both tables can be
    maintained independently while the stream runs. ``mode`` defaults to
    MOR: a long-lived chain is the steady-state regime where commit cost
    must stay O(micro-batch), not O(table)."""
    from ..lake.stream_source import register

    register(spark)
    reader = spark.readStream.format("lake_cdc").option("path", src.root)
    if max_versions_per_batch:
        reader = reader.option("maxVersionsPerBatch", str(max_versions_per_batch))
    changes = reader.load()

    def handle(df, epoch_id: int):
        out = transform(df) if transform is not None else df
        dst.merge(out, f"chain-{epoch_id:08d}", mode=mode)

    writer = changes.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_change_rates(spark: SparkSession, log_path: str, watermark: str = "1 hour"):
    """Streaming observability: per-(window, op) change rates with a
    watermark for late events — tumbling 10-minute windows over event time.
    (≙ outcome accounting A4, streamed.)"""
    changes = spark.readStream.schema(CHANGE_SCHEMA).parquet(log_path)
    return (
        changes.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("n"), F.approx_count_distinct("conv_id").alias("convs"))
    )


def streaming_dedup(spark: SparkSession, log_path: str, watermark: str = "1 hour"):
    """Stateful duplicate-delivery drop in streaming form: watermark-bounded
    dropDuplicates on (conv_id, turn_idx, change_lsn) — the streaming
    spelling of operators/cdc.dedup_deliveries (state evicted past the
    watermark, so memory is bounded)."""
    changes = spark.readStream.schema(CHANGE_SCHEMA).parquet(log_path)
    return changes.withWatermark("ts", watermark).dropDuplicates(
        ["conv_id", "turn_idx", "change_lsn"]
    )


def streaming_sessions(
    spark: SparkSession, log_path: str, gap: str = "30 minutes", watermark: str = "1 hour"
):
    """Session windows over the live change stream: per-conversation
    activity sessions closed after ``gap`` of event-time silence, state
    bounded by the watermark (a session older than watermark+gap can never
    merge again and is emitted/evicted). The streaming spelling of
    queries/cdcq.session_window_agg."""
    changes = spark.readStream.schema(CHANGE_SCHEMA).parquet(log_path)
    return (
        changes.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"))
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "first_ts",
            "n_events",
        )
    )
