"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus one end-to-end CDC
replay (generate change log → dedup → LWW → refine → MERGE), and print ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "cdc": {...}}

Scaling mode (the BASELINE.json north-rule evidence, no real cluster in
this sandbox): ``python bench.py --scaling`` runs the identical replay job
at two parallelism levels (local[8] vs local[32]) in fresh JVMs on the same
input and reports events/sec at both + efficiency = (thr_4N / thr_N) / 4.

Query plans are forced end-to-end with the noop sink (count() would let
Catalyst skip column evaluation).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "lww_agg",
    "prune_entries",
    "top1_per_group",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "token_count",
    "rollup_lineage",
]

# CDC replay workload (same generator params in every mode)
REPLAY_EVENTS = int(os.environ.get("SPARK_GRAFT_REPLAY_EVENTS", "2000000"))
# commit mode for the scaling/worker paths (auto | cow | mor): default is
# the ENGINE default (auto = COW for bulk backfill batches, MOR at steady
# state, final fold), so the scaling evidence measures the configuration a
# user actually gets; cow/mor remain selectable to evidence each mode
REPLAY_MODE = os.environ.get("SPARK_GRAFT_REPLAY_MODE", "auto")
REPLAY_PARAMS = dict(
    n_conversations=20_000,
    turns_per_conv=24,
    n_events=REPLAY_EVENTS,
    n_batches=8,
)


def _du(path: str) -> int:
    """Total bytes under ``path``. COW never deletes superseded commit dirs
    during a replay, so data-dir size == total bytes physically written —
    the write-amplification evidence for the COW-vs-MOR comparison."""
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def _sf_label(path: str) -> float:
    try:
        return float(path.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return -1.0


def _run_queries(spark) -> dict[str, float]:
    from dibbs_ecr_refiner_spark.queries import all_queries

    qs = all_queries()
    times = {}
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        # warm-state measurement: first execution pays one-time JIT/codegen
        # (identical at any scale/cluster size, so it isn't the signal);
        # then median-of-3 — the sub-second queries are pure noise
        # otherwise on a shared box (r4's driver run measured code-unchanged
        # TPC-H rows 1.9x apart purely from co-tenant bursts)
        df.write.format("noop").mode("overwrite").save()
        trials = []
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            trials.append(time.time() - t0)
        times[name] = round(sorted(trials)[1], 3)
    return times


def _make_changelog(spark, path: str) -> int:
    from dibbs_ecr_refiner_spark.fixtures.changelog import ChangeLogParams, write_changes

    params = ChangeLogParams(**REPLAY_PARAMS)
    write_changes(spark, path, params)
    return REPLAY_EVENTS


def _replay(spark, log_path: str, table_root: str, buckets: int = 64, mode: str = "cow"):
    from dibbs_ecr_refiner_spark.engine import ReplayEngine
    from dibbs_ecr_refiner_spark.lake.table import LakeTable
    from dibbs_ecr_refiner_spark.plans.config import default_plan

    table = LakeTable(spark, table_root, num_buckets=buckets)
    eng = ReplayEngine(spark, table, default_plan())
    return eng.replay_path(log_path, mode=mode), eng


def replay_worker(cores: int, log_path: str, out_path: str) -> None:
    from dibbs_ecr_refiner_spark.session import get_spark

    spark = get_spark(app_name=f"bench-replay-{cores}", cores=cores)
    table_root = tempfile.mkdtemp(prefix=f"bench-lake-{cores}-")
    try:
        stats, _ = _replay(spark, log_path, table_root, mode=REPLAY_MODE)
        with open(out_path, "w") as f:
            json.dump(
                {
                    "cores": cores,
                    "mode": REPLAY_MODE,
                    "events": stats.events,
                    "seconds": round(stats.seconds, 3),
                    "events_per_sec": round(stats.events_per_sec, 1),
                },
                f,
            )
    finally:
        shutil.rmtree(table_root, ignore_errors=True)


def _spawn_replay(cores: int, log_path: str, pin: bool = True) -> dict:
    out = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, PYTHONPATH=REPO)
    # scaling evidence isolates CPU scaling from the single shared local
    # disk (a real cluster has per-executor disks): table + shuffle on
    # RAM-backed storage when available
    if os.path.isdir("/dev/shm"):
        env.setdefault("TMPDIR", "/dev/shm")
        env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")
    cmd = [sys.executable, os.path.abspath(__file__), "--replay-worker", str(cores), log_path, out]
    # Pin the whole process tree to exactly `cores` CPUs. local[N] bounds
    # only TASK threads — the JVM still runs ~20 parallel GC threads, netty
    # IO, codegen, and python workers across every visible core, which
    # hands the low-N run far more than N cores' worth of silicon and
    # corrupts the N→4N ratio. A real N→4N executor test holds per-core
    # resources constant (scaling adds machines); taskset is that proxy.
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    subprocess.run(
        cmd,
        check=True,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(out) as f:
        return json.load(f)


def main_bench() -> None:
    from dibbs_ecr_refiner_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS)
    t_all = time.time()
    times = _run_queries(spark)

    # RAM-backed staging when available — consistent with the scaling
    # methodology (BENCH.md): the single shared local disk is a sandbox
    # artifact, not part of the engine under test
    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-cdc-", dir=tmp_base)
    try:
        log_path = os.path.join(work, "changelog")
        n_events = _make_changelog(spark, log_path)
        # Headline replay runs the ENGINE DEFAULT (auto: COW while batch ≈
        # table, MOR at steady state, final fold) — the number a user gets
        # out of the box; the explicit cow/mor runs below decompose it.
        t0 = time.time()
        stats, _ = _replay(spark, log_path, os.path.join(work, "lake"), mode="auto")
        replay_sec = time.time() - t0
        times["cdc_replay"] = round(replay_sec, 3)
        cdc = {
            "mode": "auto",
            "events": n_events,
            "seconds": round(replay_sec, 3),
            "events_per_sec": round(n_events / replay_sec, 1),
            # auto's completion fold, split out (same decomposition as the
            # explicit MOR row): ingest = the apply path alone
            "fold_seconds": round(stats.fold_seconds, 3),
            "events_per_sec_ingest": round(stats.events_per_sec_ingest, 1),
            # cold/warm split: batch 1 pays the session's one-time
            # JIT/codegen/python-worker warmup (10-16s measured); the warm
            # median is the steady-state signal to compare across rounds
            "cold_first_batch_s": round(stats.cold_first_batch_seconds, 3),
            "median_warm_ev_s": round(stats.warm_median_events_per_sec, 1),
            "batches": stats.batches,
            "bytes_written": _du(os.path.join(work, "lake", "data")),
        }

        # Same log in merge-on-read mode: each batch commits only its own
        # winners (write cost O(batch), not O(touched buckets)); the fold
        # (compaction back to base files + display convergence) is timed
        # separately — at the 10^10 target it amortizes over many batches.
        t0 = time.time()
        mor_stats, mor_eng = _replay(spark, log_path, os.path.join(work, "lake_mor"), mode="mor")
        mor_sec = time.time() - t0
        mor_ingest_bytes = _du(os.path.join(work, "lake_mor", "data"))
        t0 = time.time()
        mor_eng.fold_deltas()
        fold_sec = time.time() - t0
        # reported inside "cdc" (not "queries") so the headline total stays
        # comparable round-over-round
        cdc["mor"] = {
            "events": n_events,
            "seconds": round(mor_sec, 3),
            "events_per_sec": round(n_events / mor_sec, 1),
            "fold_seconds": round(fold_sec, 3),
            "events_per_sec_incl_fold": round(n_events / (mor_sec + fold_sec), 1),
            "batches": mor_stats.batches,
            "bytes_written_ingest": mor_ingest_bytes,
            "bytes_written_incl_fold": _du(os.path.join(work, "lake_mor", "data")),
        }

        # Steady-state CDC apply — the north-star regime (table ≫ batch):
        # a follow-up log 1/10th the size, in 8 small batches, applied to
        # the tables both modes just built (identical content post-fold).
        # COW rewrites every touched bucket per batch regardless of batch
        # size; MOR writes O(batch). This ratio, not the fresh-table
        # replay, is what 10^10-events-into-an-existing-table looks like.
        from dibbs_ecr_refiner_spark.fixtures.changelog import (
            ChangeLogParams,
            write_changes,
        )

        ss_events = REPLAY_EVENTS // 10
        log2 = os.path.join(work, "changelog_ss")
        write_changes(
            spark,
            log2,
            ChangeLogParams(
                **dict(
                    REPLAY_PARAMS,
                    n_events=ss_events,
                    base_lsn=REPLAY_EVENTS + 1_000_000,
                    batch_prefix="ss",
                )
            ),
        )
        cow_b0 = _du(os.path.join(work, "lake", "data"))
        t0 = time.time()
        ss_cow_stats, _ = _replay(spark, log2, os.path.join(work, "lake"))
        ss_cow_sec = time.time() - t0
        cow_bytes = _du(os.path.join(work, "lake", "data")) - cow_b0
        mor_b0 = _du(os.path.join(work, "lake_mor", "data"))
        t0 = time.time()
        ss_mor_stats, _ = _replay(spark, log2, os.path.join(work, "lake_mor"), mode="mor")
        ss_mor_sec = time.time() - t0
        mor_bytes = _du(os.path.join(work, "lake_mor", "data")) - mor_b0
        # DEFAULT mode at steady state: auto resolves every batch to MOR
        # (table ≫ batch) and folds once at the end — the out-of-the-box
        # steady-state number, expected ≈ MOR + one amortized fold.
        log3 = os.path.join(work, "changelog_ss2")
        write_changes(
            spark,
            log3,
            ChangeLogParams(
                **dict(
                    REPLAY_PARAMS,
                    n_events=ss_events,
                    base_lsn=REPLAY_EVENTS + 2_000_000,
                    batch_prefix="ss2",
                )
            ),
        )
        auto_b0 = _du(os.path.join(work, "lake", "data"))
        t0 = time.time()
        ss_auto_stats, _ = _replay(spark, log3, os.path.join(work, "lake"), mode="auto")
        ss_auto_sec = time.time() - t0
        auto_bytes = _du(os.path.join(work, "lake", "data")) - auto_b0
        cdc["steady_state"] = {
            "events": ss_events,
            "cow": {
                "seconds": round(ss_cow_sec, 3),
                "events_per_sec": round(ss_events / ss_cow_sec, 1),
                # the round-over-round comparable: this row's single-shot
                # total carried ±30% error bars driven by a 10-16s cold
                # first batch + short-stage noise (r4's A/B adjudication);
                # the warm-median splits that term out
                "cold_first_batch_s": round(ss_cow_stats.cold_first_batch_seconds, 3),
                "median_warm_ev_s": round(ss_cow_stats.warm_median_events_per_sec, 1),
                "bytes_written": cow_bytes,
            },
            "mor": {
                "seconds": round(ss_mor_sec, 3),
                "events_per_sec": round(ss_events / ss_mor_sec, 1),
                "cold_first_batch_s": round(ss_mor_stats.cold_first_batch_seconds, 3),
                "median_warm_ev_s": round(ss_mor_stats.warm_median_events_per_sec, 1),
                "bytes_written": mor_bytes,
            },
            "auto_default": {
                "seconds": round(ss_auto_sec, 3),
                "events_per_sec": round(ss_events / ss_auto_sec, 1),
                # the ingest/fold decomposition MOR already gets: auto's
                # per-batch cost at steady state IS the MOR cost; the
                # completion fold is the separately-amortizable
                # convergence sweep (continuous pipelines skip it with
                # final_fold="threshold" and read via read_refined())
                "fold_seconds": round(ss_auto_stats.fold_seconds, 3),
                "events_per_sec_ingest": round(ss_auto_stats.events_per_sec_ingest, 1),
                "cold_first_batch_s": round(ss_auto_stats.cold_first_batch_seconds, 3),
                "median_warm_ev_s": round(ss_auto_stats.warm_median_events_per_sec, 1),
                "bytes_written": auto_bytes,
            },
            "write_amplification_cow_over_mor": round(cow_bytes / max(mor_bytes, 1), 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_cdc_replay_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": _sf_label(SF_DIR),
                "cdc": cdc,
                "cores": CPUS,
                "wall_sec": total,
            }
        )
    )


N_LO = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))


def main_scaling() -> None:
    """North-rule evidence: the identical job on the same input at N and 4N
    cores (default 2 vs 8 — the least noise-prone pairing on this shared
    box; see BENCH.md for the full 2/4/8/16/32 sweep and methodology).
    Each level runs SCALE_TRIALS times; best-of is reported (the box has
    ±40% run-to-run variance from competing tenants)."""
    global REPLAY_EVENTS, REPLAY_PARAMS
    from dibbs_ecr_refiner_spark.session import get_spark

    # scaling workload: larger, fewer batches than the throughput bench so
    # per-batch fixed driver costs (~1.5-2s of job scheduling + plan
    # analysis + commit per batch, identical at any core count) don't
    # masquerade as a serial fraction — at the 10^10-event target scale a
    # batch is orders of magnitude larger than these constants
    REPLAY_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "16000000"))
    REPLAY_PARAMS = dict(
        n_conversations=160_000,
        turns_per_conv=24,
        n_events=REPLAY_EVENTS,
        n_batches=int(os.environ.get("SPARK_GRAFT_SCALE_BATCHES", "2")),
    )
    spark = get_spark(app_name="bench-gen", cores=CPUS)
    # the shared input log ALSO lives on RAM-backed storage: with tables +
    # shuffle already in /dev/shm, a disk-resident log made every run's
    # scan speed a function of page-cache residency (measured: identical
    # 8-core trials 70% apart) — not a property of the engine under test
    work = tempfile.mkdtemp(
        prefix="bench-scaling-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        log_path = os.path.join(work, "changelog")
        _make_changelog(spark, log_path)
        spark.stop()

        def level(cores: int) -> tuple[dict, list]:
            """Median trial per level. Co-tenant noise on this box is
            bidirectional (±40%); best-of-N is the WRONG estimator for a
            RATIO — one lucky low-N trial (or one lucky high-N trial)
            biases it arbitrarily. The median is the standard robust
            location estimator; every trial is logged in all_runs."""
            runs = [_spawn_replay(cores, log_path) for _ in range(SCALE_TRIALS)]
            ordered = sorted(runs, key=lambda r: r["events_per_sec"])
            return ordered[(len(ordered) - 1) // 2], runs

        interleave = os.environ.get("SPARK_GRAFT_SCALE_INTERLEAVE") == "1"
        paired = None
        if interleave:
            # Alternate lo,hi,lo,hi… and ALSO report the median of the
            # per-pair ratios: co-tenant load on this shared box comes in
            # multi-minute bursts, so an adjacent (lo,hi) pair sees similar
            # conditions and the PAIRED ratio cancels the burst, where
            # sequential all-lo-then-all-hi medians alias it into the
            # efficiency estimate (measured: 4-core trials 2x apart while
            # 1-core trials sat within ±4%).
            lo_runs, hi_runs = [], []
            for _ in range(SCALE_TRIALS):
                lo_runs.append(_spawn_replay(N_LO, log_path))
                hi_runs.append(_spawn_replay(N_LO * 4, log_path))
            med = lambda rs: sorted(rs, key=lambda r: r["events_per_sec"])[(len(rs) - 1) // 2]  # noqa: E731
            lo, hi = med(lo_runs), med(hi_runs)
            ratios = sorted(
                (h["events_per_sec"] / l["events_per_sec"]) / 4.0
                for l, h in zip(lo_runs, hi_runs)
            )
            paired = round(ratios[(len(ratios) - 1) // 2], 3)
        else:
            lo, lo_runs = level(N_LO)
            hi, hi_runs = level(N_LO * 4)
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4.0
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency_{N_LO}_to_{N_LO * 4}_cores",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "mode": REPLAY_MODE,
                    "low": lo,
                    "high": hi,
                    "all_runs": {
                        str(N_LO): [r["events_per_sec"] for r in lo_runs],
                        str(N_LO * 4): [r["events_per_sec"] for r in hi_runs],
                    },
                    **({"paired_median_efficiency": paired} if paired is not None else {}),
                    "pinned": bool(shutil.which("taskset")),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--replay-worker":
        replay_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    else:
        main_bench()
