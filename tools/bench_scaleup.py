"""Scale-up evidence run: a 100M-event merge-on-read replay (RAM-backed,
fresh solo JVM) with an oracle equality check — one order of magnitude above
the 20M run recorded in BENCH.md, probing whether the per-event cost holds
as table and batch sizes grow 5x.

Usage (solo on the box — any concurrent Spark invalidates the numbers):

    python tools/bench_scaleup.py [events] [mode]

Prints one JSON line. Defaults: 100_000_000 events, mode=mor (the
steady-ingest configuration; the fold is timed separately, as in bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "mor"

    from dibbs_ecr_refiner_spark.engine import ReplayEngine, batch_oracle, final_state_matches
    from dibbs_ecr_refiner_spark.fixtures.changelog import ChangeLogParams, write_changes
    from dibbs_ecr_refiner_spark.lake.table import LakeTable
    from dibbs_ecr_refiner_spark.plans.config import default_plan
    from dibbs_ecr_refiner_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"scaleup-{events}", cores=cores)
    work = tempfile.mkdtemp(
        prefix="scaleup-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    out: dict = {"metric": "scaleup_replay", "events": events, "mode": mode, "cores": cores}
    try:
        params = ChangeLogParams(
            n_conversations=events // 100,   # same conv:event ratio as bench
            turns_per_conv=24,
            n_events=events,
            n_batches=8,
        )
        t0 = time.time()
        write_changes(spark, os.path.join(work, "log"), params)
        out["gen_sec"] = round(time.time() - t0, 1)

        table = LakeTable(spark, os.path.join(work, "lake"), num_buckets=64)
        eng = ReplayEngine(spark, table, default_plan())
        t0 = time.time()
        stats = eng.replay_path(os.path.join(work, "log"), mode=mode)
        ingest_sec = time.time() - t0
        out["ingest_sec"] = round(ingest_sec, 1)
        out["events_per_sec"] = round(stats.events / ingest_sec, 1)
        out["batches"] = stats.batches
        out["actual_events"] = stats.events  # incl. duplicate deliveries

        if mode == "mor":
            t0 = time.time()
            eng.fold_deltas()
            out["fold_sec"] = round(time.time() - t0, 1)
            out["events_per_sec_incl_fold"] = round(
                stats.events / (ingest_sec + out["fold_sec"]), 1
            )

        # Oracle: full-table equality against the single-shot recompute —
        # per-turn text under stable (conv_id, turn_idx), the BASELINE.json
        # invariant, over every one of the ~events/4 live rows.
        t0 = time.time()
        changes = spark.read.parquet(os.path.join(work, "log"))
        out["oracle_match"] = bool(
            final_state_matches(table.read(), batch_oracle(changes, eng.plan))
        )
        out["oracle_check_sec"] = round(time.time() - t0, 1)
        out["live_rows"] = table.read().count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
