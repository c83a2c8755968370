"""Table maintenance: bucket compaction + tombstone GC.

Copy-on-write MERGE leaves one file per touched bucket per batch; over many
batches a bucket accumulates... actually each merge rewrites the touched
bucket wholly, so steady-state is ~1 file/bucket — but crash reruns and
schema-evolution snapshots can strand small files, and tombstones accumulate
forever without GC (one per deleted key).

``compact`` rewrites chosen buckets into fresh files, optionally dropping
tombstones whose change_lsn is below every bucket's high-watermark minus a
safety horizon. Dropping a tombstone is safe once no replayable event below
its LSN can still arrive — with batch replay that is any LSN at or below the
lowest committed high-watermark (events are delivered in LSN-ranged batches;
a batch is either fully committed or fully re-run). This mirrors snapshot
expiry in Iceberg and the reference's run-scoped manifest lifecycle
(RefinerComplete supersedes per-run state, lambda_function.py:276-295).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from .table import LakeTable


def compact(
    table: LakeTable,
    buckets: list[int] | None = None,
    drop_tombstones_below: int | None = None,
) -> dict:
    """Rewrite ``buckets`` (default: all with >1 file or any file when
    GC'ing) as one file each; optionally drop tombstones with
    change_lsn <= drop_tombstones_below."""
    snap = table.current_snapshot()
    if snap is None:
        return {"skipped": True, "reason": "no snapshot"}

    by_bucket: dict[int, int] = {}
    for f in snap["files"]:
        by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
    if buckets is None:
        if drop_tombstones_below is not None:
            buckets = sorted(by_bucket)
        else:
            buckets = sorted(b for b, n in by_bucket.items() if n > 1)
    if not buckets:
        return {"skipped": True, "reason": "nothing to compact"}

    df = table.read(buckets=buckets, include_tombstones=True)
    if drop_tombstones_below is not None:
        df = df.where(
            ~(F.col("_deleted") & (F.col("change_lsn") <= drop_tombstones_below))
        )

    batch_id = f"compact-{snap['snapshot_id']}-{int(time.time() * 1000)}"
    # replace_buckets: the filtered read IS the new bucket content (rows are
    # already LWW winners); merge handles file layout + snapshot commit.
    res = table.merge(df, batch_id, touched_buckets=buckets, replace_buckets=True)
    res["compacted_buckets"] = len(buckets)
    return res


def min_safe_gc_lsn(table: LakeTable) -> int | None:
    """Highest LSN safely GC-able: the minimum committed per-bucket
    high-watermark (no replay can deliver an uncommitted event at or below
    it)."""
    snap = table.current_snapshot()
    if not snap or not snap["watermarks"]:
        return None
    return min(int(v) for v in snap["watermarks"].values())
