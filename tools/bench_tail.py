"""A/B the manifest file-stats data skipping on a steady-state tail read.

Models the north-star regime: a bulk backfill compacted long ago (cold,
stats-stamped base files) plus a recent follow-up applied merge-on-read
(fresh delta files). Then times the same "rows updated since T" query two
ways:

  pruned:   table.read_since(T)            — cold files skipped at the manifest
  unpruned: table.read().where(ts >= T)    — every file scanned (parquet
            row-group pushdown still applies; the delta is manifest skipping)

Usage: python tools/bench_tail.py [events] [tail_events]
Prints one JSON line. Solo on the box — concurrent Spark invalidates times.
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
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    tail_events = int(sys.argv[2]) if len(sys.argv) > 2 else max(events // 50, 20_000)

    from pyspark.sql import functions as F

    from dibbs_ecr_refiner_spark.engine import ReplayEngine
    from dibbs_ecr_refiner_spark.fixtures.changelog import ChangeLogParams, write_changes
    from dibbs_ecr_refiner_spark.lake.maintenance import compact
    from dibbs_ecr_refiner_spark.lake.table import LakeTable, _stats_keep, _ts_us
    from dibbs_ecr_refiner_spark.plans.config import default_plan
    from dibbs_ecr_refiner_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-tail", cores=cores)
    work = tempfile.mkdtemp(
        prefix="benchtail-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    out: dict = {
        "metric": "tail_read_data_skipping",
        "events": events,
        "tail_events": tail_events,
        "cores": cores,
    }
    try:
        conv = events // 100
        write_changes(
            spark,
            os.path.join(work, "log"),
            ChangeLogParams(n_conversations=conv, turns_per_conv=24, n_events=events, n_batches=4),
        )
        table = LakeTable(spark, os.path.join(work, "lake"), num_buckets=64)
        eng = ReplayEngine(spark, table, default_plan())
        eng.replay_path(os.path.join(work, "log"))
        # the long-ago maintenance pass: compaction stamps file stats
        compact(table, buckets=list(range(table.num_buckets)))

        # the recent follow-up, applied merge-on-read (fresh un-stamped deltas)
        write_changes(
            spark,
            os.path.join(work, "log2"),
            ChangeLogParams(
                n_conversations=conv,
                turns_per_conv=24,
                n_events=tail_events,
                n_batches=1,
                base_lsn=events + 1_000_000,
                batch_prefix="tail",  # distinct batch ids — exactly-once would skip a re-used id
            ),
        )
        eng.replay_path(os.path.join(work, "log2"), mode="mor")

        cut = spark.read.parquet(os.path.join(work, "log2")).agg(F.min("ts")).first()[0]
        snap = table.current_snapshot()
        kept = sum(1 for f in snap["files"] if _stats_keep(f, "ts", lo=_ts_us(cut)))
        out["files_total"] = len(snap["files"])
        out["files_scanned_pruned"] = kept

        def timed(df):
            t0 = time.time()
            n = df.count()
            return round(time.time() - t0, 3), n

        table.read().limit(1).count()  # JVM/codegen warmup on an unrelated plan

        runs = {"pruned_sec": [], "unpruned_sec": []}
        for _ in range(3):
            s, n_pruned = timed(table.read_since(cut))
            runs["pruned_sec"].append(s)
            s, n_unpruned = timed(table.read().where(F.col("ts") >= F.lit(cut)))
            runs["unpruned_sec"].append(s)
        assert n_pruned == n_unpruned, (n_pruned, n_unpruned)
        out["tail_rows"] = n_pruned
        out["live_rows"] = table.read().count()
        out["pruned_sec"] = sorted(runs["pruned_sec"])[1]
        out["unpruned_sec"] = sorted(runs["unpruned_sec"])[1]
        out["speedup"] = round(out["unpruned_sec"] / max(out["pruned_sec"], 1e-9), 2)
        out["all_runs"] = runs
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
