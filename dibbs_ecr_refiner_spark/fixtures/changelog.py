"""Synthetic transcript change-log generator (pure Spark, seeded, scalable).

Generates the ``changes`` table of FIXTURES.md §2: a WAL/binlog of transcript
mutations keyed by (conv_id, turn_idx) with monotone ``change_lsn``,
out-of-order event times, exact-duplicate deliveries, deletes, Zipf-skewed
hot conversations, and a schema-evolution point past which ``extra`` carries
a new ``metadata`` key.

All randomness is ``xxhash64(column, seed)`` derived — the generator is a
deterministic function of (params, seed) and is itself a distributed Spark
job, so it scales to the 10^10-event regime (spark.range is split across
executors; no driver-side materialization).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Vocabulary for turn text. The KEEP_* subsets line up with the default
# refinement config in fixtures/config.py so that refinement has signal.
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "fever", "alert", "error", "condition", "followup", "oscar",
]
TOOLS = [f"t{i}" for i in range(10)]
ROLES = ["user", "assistant", "tool", "system"]
# role weights out of 16: user 5, assistant 6, tool 3, system 2
_ROLE_CUTS = [(5, "user"), (11, "assistant"), (14, "tool"), (16, "system")]

BASE_TS = "2026-01-01 00:00:00"


@dataclass(frozen=True)
class ChangeLogParams:
    n_conversations: int = 200
    turns_per_conv: int = 24
    n_events: int = 20_000          # upsert/delete events before duplicates
    pct_out_of_order: float = 0.10  # events whose ts disagrees with lsn order
    ooo_window_secs: int = 3600     # how far out-of-order ts may wander
    pct_deletes: float = 0.03
    pct_refine_ops: float = 0.05    # 'refine' ops (re-emit for re-refinement)
    pct_duplicates: float = 0.05    # exact duplicate deliveries (same lsn)
    zipf_boost: float = 3.0         # >1 skews events toward low conv ids
    schema_evolution_frac: float = 0.7  # extra['metadata'] appears past this
    n_batches: int = 8
    files_per_batch: int = 16       # a real WAL tail delivers many files
    with_items: bool = False        # emit the optional sub-items column (P4)
    seed: int = 42
    base_lsn: int = 0               # LSN/ts offset: a follow-up log strictly
                                    # after an earlier one (steady-state CDC)
    batch_prefix: str = "batch"     # distinct batch ids per log (the
                                    # applied-batches registry is id-keyed)


def _u01(col, seed_col_salt: int, seed: int):
    """Deterministic pseudo-uniform in [0,1) from a column."""
    h = F.xxhash64(col, F.lit(seed + seed_col_salt))
    # xxhash64 → long; fold to [0,1). abs() of Long.MIN_VALUE is negative,
    # so mask the sign bit instead.
    return (F.shiftrightunsigned(h, 1).cast("double")) / float(2**63)


def generate_changes(spark: SparkSession, params: ChangeLogParams | None = None) -> DataFrame:
    """Return the ``changes`` DataFrame (FIXTURES.md §2 schema), duplicates
    included, ordered by nothing in particular (callers must not rely on
    row order — exactly like a real log tail)."""
    p = params or ChangeLogParams()
    s = p.seed

    df = spark.range(0, p.n_events).withColumnRenamed("id", "e")

    # Zipf-ish conversation skew: u^boost concentrates mass near conv 0.
    u_conv = _u01(F.col("e"), 1, s)
    conv_idx = F.least(
        F.floor(F.pow(u_conv, F.lit(p.zipf_boost)) * p.n_conversations).cast("int"),
        F.lit(p.n_conversations - 1),
    )
    turn_idx = F.pmod(F.xxhash64(F.col("e"), F.lit(s + 2)), F.lit(p.turns_per_conv)).cast("int")

    u_op = _u01(F.col("e"), 3, s)
    op = (
        F.when(u_op < p.pct_deletes, F.lit("delete"))
        .when(u_op < p.pct_deletes + p.pct_refine_ops, F.lit("refine"))
        .when(u_op < 0.55, F.lit("update"))
        .otherwise(F.lit("insert"))
    )

    role_bucket = F.pmod(F.xxhash64(conv_idx, turn_idx, F.lit(s + 4)), F.lit(16))
    role = F.lit(None).cast("string")
    for cut, name in reversed(_ROLE_CUTS):
        role = F.when(role_bucket < cut, F.lit(name)).otherwise(role)

    tool = F.when(
        role == "tool",
        F.concat(F.lit("t"), F.pmod(F.xxhash64(F.col("e"), F.lit(s + 5)), F.lit(len(TOOLS))).cast("string")),
    ).otherwise(F.lit(None).cast("string"))

    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    words = [
        F.element_at(vocab_arr, (F.pmod(F.xxhash64(F.col("e"), F.lit(s + 10 + k)), F.lit(len(VOCAB))) + 1).cast("int"))
        for k in range(5)
    ]
    text = F.concat_ws(
        " ",
        F.lit("turn"),
        F.concat(conv_idx.cast("string"), F.lit(":"), turn_idx.cast("string")),
        F.lit("rev"),
        F.col("e").cast("string"),
        *words,
    )

    # Event time: mostly lsn-ordered; a fraction wanders ±ooo_window.
    u_ooo = _u01(F.col("e"), 6, s)
    jitter = F.when(
        u_ooo < p.pct_out_of_order,
        (F.pmod(F.xxhash64(F.col("e"), F.lit(s + 7)), F.lit(2 * p.ooo_window_secs)) - p.ooo_window_secs),
    ).otherwise(F.lit(0))
    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(
        secs=(F.col("e") + p.base_lsn + jitter).cast("double")
    )

    evo_lsn = int(p.n_events * p.schema_evolution_frac)
    extra = F.when(
        F.col("e") >= evo_lsn,
        F.create_map(
            F.lit("src"), F.lit("gen"),
            F.lit("metadata"), F.concat(F.lit("m-"), F.pmod(F.xxhash64(F.col("e"), F.lit(s + 8)), F.lit(100)).cast("string")),
        ),
    ).otherwise(F.create_map(F.lit("src"), F.lit("gen")))

    batch_size = max(1, (p.n_events + p.n_batches - 1) // p.n_batches)
    ingest_file = F.format_string(f"{p.batch_prefix}-%05d", (F.col("e") / batch_size).cast("int"))

    is_delete = op == "delete"

    # Optional sub-items (container components of a turn, P4): 0-3 structs
    # with a coded identity drawn from VOCAB ∪ non-keep junk, ~1/4 flagged
    # as shared context (guard-exempt, ≙ specimen-collection case).
    items_cols: list = []
    if p.with_items:
        item_vocab = VOCAB + ["junk1", "junk2", "junk3", "junk4"]
        iv_arr = F.array(*[F.lit(w) for w in item_vocab])
        n_items = F.pmod(F.xxhash64(F.col("e"), F.lit(s + 20)), F.lit(4)).cast("int")
        idxs = F.sequence(F.lit(1), n_items)
        mk_item = lambda i: F.struct(  # noqa: E731
            F.element_at(
                iv_arr,
                (F.pmod(F.xxhash64(F.col("e"), i, F.lit(s + 21)), F.lit(len(item_vocab))) + 1).cast("int"),
            ).alias("code"),
            F.concat(F.lit("item of rev "), F.col("e").cast("string")).alias("text"),
            (F.pmod(F.xxhash64(F.col("e"), i, F.lit(s + 22)), F.lit(4)) == 0).alias("is_context"),
        )
        items = F.transform(idxs, mk_item)
        items_cols = [F.when(is_delete, F.lit(None)).otherwise(items).alias("items")]

    out = df.select(
        F.concat(F.lit("conv-"), conv_idx.cast("string")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        op.alias("op"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(text).alias("text"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        ts.alias("ts"),
        (F.col("e") + p.base_lsn).alias("change_lsn"),
        ingest_file.alias("ingest_file"),
        extra.alias("extra"),
        *items_cols,
    )

    # Exact duplicate deliveries: re-emit a deterministic sample unchanged
    # (same change_lsn — an at-least-once delivery, not a new change).
    dups = out.where(_u01(F.col("change_lsn"), 9, s) < p.pct_duplicates)
    return out.unionByName(dups)


def write_changes(spark: SparkSession, path: str, params: ChangeLogParams | None = None) -> None:
    """Materialize the change log partitioned by ingest_file (one dir per
    batch ≙ one S3 'persistence_id' prefix per Lambda invocation,
    reference lambda_function.py:413-433), with ``files_per_batch`` parquet
    files per batch — a single giant file per batch would cap the scan
    parallelism of every downstream consumer at ~file_size/maxPartitionBytes
    tasks, which is not how a WAL tail arrives."""
    p = params or ChangeLogParams()
    subfile = F.pmod(F.xxhash64(F.col("change_lsn"), F.lit(p.seed + 99)), F.lit(p.files_per_batch))
    # explicit partition count: a bare repartition(cols) is AQE-rebalanced
    # down to ~advisory-size partitions (one file per batch at small SF),
    # which would serialize every downstream scan
    generate_changes(spark, p).repartition(
        p.n_batches * p.files_per_batch, F.col("ingest_file"), subfile
    ).write.mode("overwrite").partitionBy("ingest_file").parquet(path)
