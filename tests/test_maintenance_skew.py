"""Compaction / tombstone-GC and skew-handling tests."""

import datetime as dt

from pyspark.sql import functions as F

from dibbs_ecr_refiner_spark.lake.maintenance import compact, min_safe_gc_lsn
from dibbs_ecr_refiner_spark.lake.table import LakeTable
from dibbs_ecr_refiner_spark.operators import cdc
from dibbs_ecr_refiner_spark.operators.skew import hot_key_report, salted_lww

TS = dt.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, change_lsn long, "
    "role string, text string, tool string, _deleted boolean"
)


def _delta(spark, rows):
    return spark.createDataFrame(
        [(c, i, TS, lsn, "user", x, None, d) for (c, i, x, lsn, d) in rows], SCHEMA
    )


def test_compact_drops_old_tombstones(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "live", 1, False), ("c1", 1, None, 2, True),
                               ("c2", 0, None, 3, True)]), "b0")
    assert table.read(include_tombstones=True).count() == 3
    safe = min_safe_gc_lsn(table)
    assert safe == 3
    res = compact(table, drop_tombstones_below=safe)
    assert not res.get("skipped")
    assert table.read(include_tombstones=True).count() == 1
    assert [r["text"] for r in table.read().collect()] == ["live"]
    # GC'd tombstone must not resurrect on stale redelivery: the stale event
    # is below every committed watermark, so its batch is already applied —
    # replay skips it at the batch level (exactly-once registry).
    assert table.is_applied("b0")


def test_compact_noop_when_already_compact(spark, tmp_path):
    # COW merge rewrites each touched bucket wholly → steady state is one
    # file per bucket, so a plain compact() is a no-op.
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    for i, lsn in enumerate(range(4)):
        table.merge(_delta(spark, [(f"c{lsn}", 0, f"t{lsn}", lsn, False)]), f"b{i}")
    assert compact(table)["skipped"] is True


def test_compact_explicit_buckets_preserves_state(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    for i, lsn in enumerate(range(4)):
        table.merge(_delta(spark, [(f"c{lsn}", 0, f"t{lsn}", lsn, False)]), f"b{i}")
    before = {(r["conv_id"], r["text"]) for r in table.read().collect()}
    res = compact(table, buckets=[0, 1])
    after = {(r["conv_id"], r["text"]) for r in table.read().collect()}
    assert before == after
    by_bucket = {}
    for f in table.current_snapshot()["files"]:
        by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
    assert all(n == 1 for n in by_bucket.values())
    assert res["compacted_buckets"] == 2


def test_salted_lww_equals_plain_lww(spark):
    rows = []
    for i in range(500):  # one pathologically hot key + cold keys
        rows.append(("hot", 0, "insert", "user", f"v{i}", None, TS + dt.timedelta(seconds=i), i))
    rows += [(f"cold{i}", 0, "insert", "user", "x", None, TS, 1000 + i) for i in range(20)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, op string, role string, text string, "
        "tool string, ts timestamp, change_lsn long",
    )
    a = sorted(map(tuple, cdc.lww_resolve(df).collect()))
    b = sorted(map(tuple, salted_lww(df).collect()))
    assert a == b
    hot = {r["text"] for r in salted_lww(df).where("conv_id='hot'").collect()}
    assert hot == {"v499"}


def test_hot_key_report(spark):
    rows = [("hot", i) for i in range(90)] + [("cold", 0)] * 10
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    top = hot_key_report(df, top=1).collect()[0]
    assert top["conv_id"] == "hot" and abs(top["share"] - 0.9) < 1e-9
