"""Schema-enforced change-log ingestion with a corrupt-record policy.

≙ the reference's XML parse step: syntax errors become typed
XMLValidationError surfaced per document rather than crashing the batch
(refiner/app/services/file_io.py:84, services/pipeline.py:100-108), and
schema incompatibilities hard-fail before any work is wasted
(lambda_function.py:604-627, pipeline.py:281-287).

Spark mapping: PERMISSIVE read with ``columnNameOfCorruptRecord`` —
malformed rows land in a quarantine column instead of failing the job;
the loader splits them off so the engine only ever sees valid rows, and
the quarantine can be audited/retried (the per-record failure list of the
reference's SQS batch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming.apply import CHANGE_SCHEMA

CORRUPT_COL = "_corrupt_record"

INGEST_SCHEMA = T.StructType(
    [*CHANGE_SCHEMA.fields, T.StructField(CORRUPT_COL, T.StringType())]
)


def read_change_log_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a JSON-lines change log; returns (valid, quarantined).

    Valid rows additionally require the primary key + LSN to be present
    (a JSON object that parses but lacks the key is just as unusable as a
    syntax error)."""
    raw = (
        spark.read.schema(INGEST_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    ok = F.col(CORRUPT_COL).isNull() & F.col("conv_id").isNotNull() & F.col(
        "turn_idx"
    ).isNotNull() & F.col("change_lsn").isNotNull()
    valid = raw.where(ok).drop(CORRUPT_COL)
    quarantined = raw.where(~ok).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct("*"))).alias("raw"),
        F.input_file_name().alias("source_file"),
    )
    return valid, quarantined


# CSV carries no map type: ``extra`` arrives as a JSON-encoded string
# column and is decoded after the corrupt-record split.
_CSV_SCHEMA = T.StructType(
    [
        *[f for f in CHANGE_SCHEMA.fields if f.name != "extra"],
        T.StructField("extra", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_change_log_csv(spark: SparkSession, path: str, header: bool = True) -> tuple[DataFrame, DataFrame]:
    """Read a CSV change log with the same quarantine policy as the JSON
    loader; returns (valid, quarantined) with ``valid`` in the standard
    change schema (``extra`` decoded from its JSON-string cell).

    Same PERMISSIVE + corrupt-column mechanics: a row with the wrong
    column count / an unparseable timestamp or int lands in quarantine
    with its raw line, instead of failing the batch."""
    raw = (
        spark.read.schema(_CSV_SCHEMA)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[XXX]")
        # RFC-4180 quote doubling ("" inside a quoted cell), not backslash
        .option("escape", '"')
        .csv(path)
    )
    ok = F.col(CORRUPT_COL).isNull() & F.col("conv_id").isNotNull() & F.col(
        "turn_idx"
    ).isNotNull() & F.col("change_lsn").isNotNull()
    valid = (
        raw.where(ok)
        .drop(CORRUPT_COL)
        .withColumn("extra", F.from_json("extra", T.MapType(T.StringType(), T.StringType())))
        .select(*[f.name for f in CHANGE_SCHEMA.fields])
    )
    quarantined = raw.where(~ok).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct("*"))).alias("raw"),
        F.input_file_name().alias("source_file"),
    )
    return valid, quarantined
