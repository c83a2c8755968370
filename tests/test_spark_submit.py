"""The documented deployment path, for real: `spark-submit --py-files
dist/dibbs_ecr_refiner_spark.zip cli.py ...` in a fresh JVM — the code that
runs on a cluster is the committed zip, not the source tree on PYTHONPATH.
One subprocess invocation (replay); generate + verify run in-process."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "dibbs_ecr_refiner_spark.zip")


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_replay_through_dist_zip(spark, tmp_path):
    from dibbs_ecr_refiner_spark.fixtures.changelog import ChangeLogParams, write_changes
    from dibbs_ecr_refiner_spark.lake.table import LakeTable

    log = str(tmp_path / "log")
    table_root = str(tmp_path / "t")
    write_changes(spark, log, ChangeLogParams(n_conversations=20, n_events=800, n_batches=2))

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", ZIP,
            os.path.join(REPO, "dibbs_ecr_refiner_spark", "cli.py"),
            "replay", "--changelog", log, "--table", table_root,
            "--buckets", "4", "--mode", "mor",
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert res["batches_applied"] == 2 and res["mode"] == "mor"

    # verify the committed table from THIS process
    table = LakeTable(spark, table_root)
    assert table.num_buckets == 4
    assert table.read().count() > 0
    assert len(table.current_snapshot()["applied_batches"]) == 2
