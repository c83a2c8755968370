"""Extra benchmarks (guide §1.4): noop-sink isolation of the replay merge
pipeline's stages, per-variant timings, and plan dumps. NOT the driver
bench — bench.py stays frozen; numbers here are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [probe|queries]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, fn, n=3):
    spark.sparkContext.setJobDescription(label)
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"{label:55s} median={sorted(ts)[len(ts)//2]:7.3f}  all={ts}")
    return sorted(ts)[len(ts) // 2]


def probe_replay():
    """Stage-by-stage cost of one warm MOR batch merge at bench scale."""
    from pyspark.sql import functions as F

    from dibbs_ecr_refiner_spark.engine import normalize_changes
    from dibbs_ecr_refiner_spark.fixtures.changelog import ChangeLogParams, write_changes
    from dibbs_ecr_refiner_spark.lake.table import bucket_expr
    from dibbs_ecr_refiner_spark.operators.cdc import lww_resolve
    from dibbs_ecr_refiner_spark.operators.enrich import enrich_displays, narrative_index
    from dibbs_ecr_refiner_spark.operators.refine import compile_refinement
    from dibbs_ecr_refiner_spark.plans.config import default_plan
    from dibbs_ecr_refiner_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-probe")
    work = tempfile.mkdtemp(prefix="bx-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    log_path = os.path.join(work, "changelog")
    write_changes(
        spark,
        log_path,
        ChangeLogParams(n_conversations=20_000, turns_per_conv=24, n_events=2_000_000, n_batches=8),
    )
    changes = spark.read.parquet(log_path)
    batch = changes.where(F.col("ingest_file") == sorted(
        r[0] for r in changes.select("ingest_file").distinct().collect())[3])
    plan = default_plan()
    refine = compile_refinement(plan, guarded=True)
    NB = 64

    delta = normalize_changes(batch)

    _timed(spark, "batch scan only", lambda: _noop(batch))
    _timed(spark, "normalize (projection)", lambda: _noop(delta))
    lww = lww_resolve(delta)
    _timed(spark, "lww_resolve (agg exchange)", lambda: _noop(lww))
    refined = refine(lww)
    _timed(spark, "lww+refine", lambda: _noop(refined))
    idx = narrative_index(refined, plan)
    _timed(spark, "narrative_index alone", lambda: _noop(idx))
    enriched = enrich_displays(refined, plan)
    _timed(spark, "lww+refine+enrich (join)", lambda: _noop(enriched))
    final = enriched.withColumn("_bucket", bucket_expr(NB))
    rep = final.repartition(64, F.col("_bucket"), F.lit(0)).sortWithinPartitions(
        "_bucket", "conv_id", "turn_idx"
    )
    _timed(spark, "full pipeline + repartition+sort (noop)", lambda: _noop(rep))

    def _write():
        out = os.path.join(work, f"out-{time.time_ns()}")
        rep.write.option("maxRecordsPerFile", 5_000_000).partitionBy("_bucket").parquet(out)

    _timed(spark, "full pipeline + parquet write", _write)

    # ---- variant B: repartition raw delta first, agg without exchange ----
    d2 = delta.withColumn("_bucket", bucket_expr(NB))
    rep2 = d2.repartition(64, F.col("_bucket"))
    lww2 = lww_resolve(rep2, key=("_bucket", "conv_id", "turn_idx"))
    refined2 = refine(lww2)
    enriched2 = enrich_displays(refined2, plan)
    sorted2 = enriched2.sortWithinPartitions("_bucket", "conv_id", "turn_idx")
    _timed(spark, "B: repart-first lww (noop)", lambda: _noop(lww2))
    _timed(spark, "B: repart-first lww+refine+enrich (noop)", lambda: _noop(sorted2))

    def _write_b():
        out = os.path.join(work, f"outb-{time.time_ns()}")
        sorted2.write.option("maxRecordsPerFile", 5_000_000).partitionBy("_bucket").parquet(out)

    _timed(spark, "B: full + parquet write", _write_b)

    # broadcast-index variant on top of B
    from pyspark.sql import DataFrame

    def enrich_bcast(df: DataFrame, plan_) -> DataFrame:
        cfg_idx = narrative_index(df, plan_)
        if cfg_idx is None:
            return df
        from dibbs_ecr_refiner_spark.operators.enrich import config_display_expr

        cols = df.columns
        joined = df.alias("L").join(
            F.broadcast(cfg_idx.alias("R")),
            (F.col("L.conv_id") == F.col("R.conv_id"))
            & (F.col("L._matched_code") == F.col("R._narr_code")),
            "left",
        )
        return joined.select(
            *[F.col(f"L.{c}") for c in cols if c != "_matched_display"],
            F.coalesce(config_display_expr(plan_), F.col("R._narr_display")).alias(
                "_matched_display"
            ),
        ).select(*cols)

    enriched3 = enrich_bcast(refined2, plan)
    sorted3 = enriched3.sortWithinPartitions("_bucket", "conv_id", "turn_idx")

    def _write_b3():
        out = os.path.join(work, f"outb3-{time.time_ns()}")
        sorted3.write.option("maxRecordsPerFile", 5_000_000).partitionBy("_bucket").parquet(out)

    _timed(spark, "B+bcast-index: full + parquet write", _write_b3)

    import shutil

    shutil.rmtree(work, ignore_errors=True)


def sweep_queries():
    """noop-sink median-of-3 for EVERY registered query at $SPARK_GRAFT_SF_DIR
    — the per-operator checklist evidence (bench.py times only the headline
    ten + replay)."""
    from dibbs_ecr_refiner_spark.queries import all_queries
    from dibbs_ecr_refiner_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-sweep")
    out = {}
    for name, fn in all_queries().items():
        df = fn(spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        df.write.format("noop").mode("overwrite").save()
        trials = []
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            trials.append(round(time.time() - t0, 3))
        out[name] = sorted(trials)[1]
        print(f"{name:30s} {out[name]:7.3f}  {trials}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "sweep": out}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if mode == "probe":
        probe_replay()
    elif mode == "sweep":
        sweep_queries()
