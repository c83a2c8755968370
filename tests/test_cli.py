"""CLI surface: generate → replay (MOR) → show → compact (fold) → changes.

Exercises the spark-submit deployment surface end-to-end in-process
(cli.main with argv), sharing the session fixture so no second JVM spins
up. Each subcommand's JSON contract is what operators script against."""

import json

from dibbs_ecr_refiner_spark import cli


def _run(capsys, *argv):
    assert cli.main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_mor_lifecycle(spark, tmp_path, capsys):
    log = str(tmp_path / "log")
    table = str(tmp_path / "table")

    gen = _run(capsys, "generate", "--changelog", log, "--events", "2000",
               "--conversations", "40", "--batches", "2")
    assert gen["events"] == 2000

    rep = _run(capsys, "replay", "--changelog", log, "--table", table,
               "--buckets", "8", "--mode", "mor")
    assert rep["mode"] == "mor" and rep["batches_applied"] == 2

    shown = _run(capsys, "show", "--table", table, "--buckets", "8")
    assert shown["delta_files"] > 0 and shown["live_rows"] > 0
    live_before = shown["live_rows"]

    # incremental scan: full feed from table creation
    ch = _run(capsys, "changes", "--table", table, "--buckets", "8")
    assert ch["rows"] >= live_before

    comp = _run(capsys, "compact", "--table", table, "--buckets", "8")
    assert not comp.get("skipped")

    shown2 = _run(capsys, "show", "--table", table, "--buckets", "8")
    assert shown2["delta_files"] == 0
    assert shown2["live_rows"] == live_before

    # replay again: exactly-once no-op
    rep2 = _run(capsys, "replay", "--changelog", log, "--table", table,
                "--buckets", "8", "--mode", "mor")
    assert rep2["batches_applied"] == 0 and rep2["batches_skipped"] == 2

    # export the transcripts view for downstream consumers
    out = str(tmp_path / "export")
    exp = _run(capsys, "export", "--table", table, "--out", out, "--format", "csv")
    assert exp["rows"] == live_before
    assert spark.read.option("header", "true").csv(out).count() == live_before
