"""Named snapshot refs (≙ Iceberg tags): pin a dataset version by name,
read/export it reproducibly, and survive expire/GC until deleted."""

import datetime as dt
import os

import pytest

from dibbs_ecr_refiner_spark.lake import maintenance
from dibbs_ecr_refiner_spark.lake.table import LakeTable

TS = dt.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, change_lsn long, "
    "role string, text string, tool string, _deleted boolean"
)


def _delta(spark, rows):
    return spark.createDataFrame(
        [(c, i, TS, lsn, "user", x, None, False) for (c, i, x, lsn) in rows], SCHEMA
    )


def test_tag_pins_a_version_and_reads_by_name(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "v1", 1)]), "b0")
    res = table.tag("corpus-2026-08", note="train run 17")
    assert res == {"tag": "corpus-2026-08", "version": 1}
    table.merge(_delta(spark, [("c1", 0, "v2", 5)]), "b1")

    assert [r["text"] for r in table.read(tag="corpus-2026-08").collect()] == ["v1"]
    assert [r["text"] for r in table.read().collect()] == ["v2"]
    assert [r["text"] for r in table.read_transcripts(tag="corpus-2026-08").collect()] == ["v1"]
    assert table.tags()["corpus-2026-08"]["note"] == "train run 17"


def test_tags_are_immutable_and_validated(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    table.merge(_delta(spark, [("c1", 0, "v1", 1)]), "b0")
    table.tag("gold")
    with pytest.raises(ValueError, match="already pins"):
        table.tag("gold")
    with pytest.raises(FileNotFoundError):
        table.tag("bad", version=99)
    with pytest.raises(ValueError, match="unknown tag"):
        table.read(tag="nope")
    with pytest.raises(ValueError, match="not both"):
        table.read(tag="gold", version=1)


def test_tagged_snapshot_survives_expire_and_gc_until_deleted(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    table.merge(_delta(spark, [("c1", 0, "pinned", 1)]), "b0")
    table.tag("gold", version=1)
    for k in range(6):
        table.merge(_delta(spark, [("c1", 0, f"v{k + 2}", k + 2)]), f"b{k + 1}")

    res = maintenance.expire_snapshots(table, keep_last=2)
    assert 1 in res["pinned"]
    assert os.path.exists(os.path.join(table._manifest_dir, "v00000001.json"))
    maintenance.gc_orphans(table, min_age_sec=0.0)
    # the pinned version still fully reads after expire+GC
    assert [r["text"] for r in table.read(tag="gold").collect()] == ["pinned"]

    # delete the tag: the next expire+GC reclaims it
    table.delete_tag("gold")
    maintenance.expire_snapshots(table, keep_last=2)
    assert not os.path.exists(os.path.join(table._manifest_dir, "v00000001.json"))
    maintenance.gc_orphans(table, min_age_sec=0.0)
    with pytest.raises(FileNotFoundError):
        table.read(version=1).collect()
    # current is untouched
    assert [r["text"] for r in table.read().collect()] == ["v7"]


def test_cli_tag_and_reproducible_export(spark, tmp_path, capsys):
    import json

    from dibbs_ecr_refiner_spark import cli

    def run(*argv):
        assert cli.main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    root = str(tmp_path / "t")
    table = LakeTable(spark, root, num_buckets=2)
    table.merge(_delta(spark, [("c1", 0, "old", 1)]), "b0")
    assert run("tag", "--table", root, "--name", "gold") == {
        "cmd": "tag",
        "tag": "gold",
        "version": 1,
    }
    table.merge(_delta(spark, [("c1", 0, "new", 5)]), "b1")

    listed = run("tag", "--table", root)
    assert listed["tags"]["gold"]["version"] == 1

    out = str(tmp_path / "export")
    exp = run("export", "--table", root, "--out", out, "--format", "json", "--tag", "gold")
    assert exp["rows"] == 1
    assert [r["text"] for r in spark.read.json(out).collect()] == ["old"]

    assert run("tag", "--table", root, "--name", "gold", "--delete")["deleted"] is True
    assert run("tag", "--table", root)["tags"] == {}
