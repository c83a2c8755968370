"""Native Structured Streaming CDC source (Python Data Source API):
``spark.readStream.format("lake_cdc")`` over a LakeTable.

Covers: initial full load == the poll/commit feed's reset semantics,
incremental delivery of exactly the new commits, checkpoint restart with
no redelivery, maintenance-fold invisibility, era-aware rename projection
from pre-rename files, and the batch face (``spark.read.format("lake_cdc")``)
matching ``LakeTable.read_changes`` row for row."""

import datetime as dt

import pytest

from dibbs_ecr_refiner_spark.lake import maintenance
from dibbs_ecr_refiner_spark.lake.feed import ChangeFeedReader
from dibbs_ecr_refiner_spark.lake.stream_source import register
from dibbs_ecr_refiner_spark.lake.table import LakeTable

TS = dt.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, change_lsn long, "
    "role string, text string, tool string, _deleted boolean"
)


def _delta(spark, rows):
    return spark.createDataFrame(
        [(c, i, TS, lsn, "user", x, None, d) for (c, i, x, lsn, d) in rows], SCHEMA
    )


def _key_set(rows):
    return {(r["conv_id"], r["turn_idx"], r["change_lsn"]) for r in rows}


class Sink:
    """foreachBatch collector (driver-side lists — local-mode test only)."""

    def __init__(self):
        self.batches = []

    def __call__(self, df, batch_id):
        self.batches.append((batch_id, df.collect()))

    @property
    def rows(self):
        return [r for _, rows in self.batches for r in rows]


def _stream(spark, root, checkpoint, sink, **opts):
    register(spark)
    reader = spark.readStream.format("lake_cdc").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def test_initial_load_then_incremental_only_new_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "a", 1, False), ("c2", 0, "b", 2, False)]), "b0")
    table.merge(_delta(spark, [("c1", 0, "a2", 3, False)]), "b1", mode="mor")

    sink = Sink()
    q = _stream(spark, root, str(tmp_path / "cp"), sink)
    try:
        q.processAllAvailable()
        # initial load = every live file's rows (the feed-reset contract:
        # raw change stream, MOR deltas included — LWW is the consumer's job)
        assert _key_set(sink.rows) == {("c1", 0, 1), ("c2", 0, 2), ("c1", 0, 3)}

        before = len(sink.rows)
        table.merge(_delta(spark, [("c3", 0, "c", 4, False)]), "b2", mode="mor")
        q.processAllAvailable()
        assert _key_set(sink.rows[before:]) == {("c3", 0, 4)}
    finally:
        q.stop()


def test_checkpoint_restart_resumes_without_redelivery(spark, tmp_path):
    root = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    table = LakeTable(spark, root, num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "a", 1, False)]), "b0")

    s1 = Sink()
    q = _stream(spark, root, cp, s1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _key_set(s1.rows) == {("c1", 0, 1)}

    # commits land while no query is running
    table.merge(_delta(spark, [("c2", 0, "b", 2, False)]), "b1", mode="mor")
    table.merge(_delta(spark, [("c2", 1, None, 3, True)]), "b2", mode="mor")

    s2 = Sink()
    q = _stream(spark, root, cp, s2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # only the two new commits; the tombstone row is visible (change feed)
    assert _key_set(s2.rows) == {("c2", 0, 2), ("c2", 1, 3)}
    deleted = {r["change_lsn"]: r["_deleted"] for r in s2.rows}
    assert deleted[3] is True


def test_maintenance_fold_is_invisible_to_the_stream(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=2)
    table.merge(_delta(spark, [("c1", 0, "a", 1, False)]), "b0")
    table.merge(_delta(spark, [("c1", 1, "b", 2, False)]), "b1", mode="mor")

    sink = Sink()
    q = _stream(spark, root, str(tmp_path / "cp"), sink)
    try:
        q.processAllAvailable()
        n = len(sink.rows)
        maintenance.compact(table)  # folds the MOR delta: a rewrite commit
        q.processAllAvailable()
        assert len(sink.rows) == n, "a fold must not re-deliver the table"
        # but a real commit after the fold still flows
        table.merge(_delta(spark, [("c9", 0, "z", 9, False)]), "b2", mode="mor")
        q.processAllAvailable()
        assert _key_set(sink.rows[n:]) == {("c9", 0, 9)}
    finally:
        q.stop()


def test_rename_era_projection_reads_old_files_by_field_id(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=2)
    table.merge(_delta(spark, [("c1", 0, "old-bytes", 1, False)]), "b0")
    table.rename_column("text", "body")
    renamed = spark.createDataFrame(
        [("c2", 0, TS, 2, "user", "new-bytes", None, False)],
        SCHEMA.replace(" text ", " body "),
    )
    table.merge(renamed, "b1", mode="mor")

    sink = Sink()
    q = _stream(spark, root, str(tmp_path / "cp"), sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["conv_id"]: r["body"] for r in sink.rows}
    # the pre-rename file's physical column `text` resolves to `body` by id
    assert got == {"c1": "old-bytes", "c2": "new-bytes"}


def test_batch_face_matches_read_changes(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "a", 1, False), ("c2", 0, "b", 2, False)]), "b0")
    v1 = table.current_snapshot()["snapshot_id"]
    table.merge(_delta(spark, [("c3", 0, "c", 3, False), ("c1", 0, "a2", 4, False)]), "b1", mode="mor")

    register(spark)
    via_source = (
        spark.read.format("lake_cdc").option("path", root).option("fromVersion", v1).load()
    )
    via_table = table.read_changes(v1)
    assert via_source.schema == via_table.schema
    assert _key_set(via_source.collect()) == _key_set(via_table.collect())
    # time travel: toVersion pins the endpoint
    at_v1 = (
        spark.read.format("lake_cdc").option("path", root).option("toVersion", v1).load()
    )
    assert _key_set(at_v1.collect()) == {("c1", 0, 1), ("c2", 0, 2)}


def test_stream_agrees_with_poll_commit_feed(spark, tmp_path):
    """The two CDC consumers (native source vs ChangeFeedReader) deliver
    the same spans for the same commit history."""
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "a", 1, False)]), "b0")

    feed = ChangeFeedReader(table, str(tmp_path / "cursor"))
    polled = feed.poll().collect()
    feed.commit()

    sink = Sink()
    q = _stream(spark, root, str(tmp_path / "cp"), sink)
    try:
        q.processAllAvailable()
        assert _key_set(sink.rows) == _key_set(polled)
        before = len(sink.rows)
        table.merge(_delta(spark, [("c2", 0, "b", 2, False)]), "b1", mode="mor")
        q.processAllAvailable()
        polled2 = feed.poll().collect()
        feed.commit()
        assert _key_set(sink.rows[before:]) == _key_set(polled2)
    finally:
        q.stop()


def test_max_versions_per_batch_splits_microbatches(spark, tmp_path):
    """Admission control: a burst of commits drains in capped spans, not
    one giant microbatch — at scale this bounds per-trigger state."""
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=2)
    table.merge(_delta(spark, [("c1", 0, "a", 1, False)]), "b0")
    sink = Sink()
    q = _stream(spark, root, str(tmp_path / "cp"), sink, maxVersionsPerBatch="1")
    try:
        q.processAllAvailable()
        for i in range(3):  # burst while the stream is live
            table.merge(_delta(spark, [(f"x{i}", 0, "v", 10 + i, False)]), f"burst{i}", mode="mor")
        q.processAllAvailable()
    finally:
        q.stop()
    nonempty = [rows for _, rows in sink.batches if rows]
    # 1 initial + 3 capped single-commit batches
    assert len(nonempty) == 4
    assert all(len(rows) == 1 for rows in nonempty)
    assert _key_set(sink.rows) == {("c1", 0, 1), ("x0", 0, 10), ("x1", 0, 11), ("x2", 0, 12)}


def test_composes_with_downstream_aggregation(spark, tmp_path):
    """The source is a first-class streaming DataFrame: downstream
    groupBy/agg in update mode works like on any built-in source."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=2)
    table.merge(
        _delta(spark, [("c1", 0, "a", 1, False), ("c1", 1, "b", 2, False), ("c2", 0, "c", 3, False)]),
        "b0",
    )
    register(spark)
    counts = {}

    def upsert(df, _bid):
        for r in df.collect():
            counts[r["conv_id"]] = r["n"]

    q = (
        spark.readStream.format("lake_cdc")
        .option("path", root)
        .load()
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert counts == {"c1": 2, "c2": 1}
        table.merge(_delta(spark, [("c2", 1, "d", 4, False)]), "b1", mode="mor")
        q.processAllAvailable()
        assert counts == {"c1": 2, "c2": 2}
    finally:
        q.stop()


def test_empty_table_schema_inference_raises(spark, tmp_path):
    register(spark)
    root = str(tmp_path / "empty")
    LakeTable(spark, root, num_buckets=2)
    with pytest.raises(Exception, match="no published snapshot"):
        spark.read.format("lake_cdc").option("path", root).load().collect()
