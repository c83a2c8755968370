"""Table maintenance: bucket compaction + tombstone GC.

Copy-on-write MERGE rewrites the touched bucket wholly, so steady-state is
~1 file/bucket — but crash reruns and schema-evolution snapshots can strand
small files, tombstones accumulate forever without GC (one per deleted key),
and merge-on-read commits accumulate one delta file per touched bucket per
batch by design (read cost grows with deltas until a fold).

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
    post=None,
    max_buckets_per_commit: int | None = None,
) -> dict:
    """Rewrite ``buckets`` (default: all with >1 file, any merge-on-read
    delta file, or any file when GC'ing) as one base file each; optionally
    drop tombstones with change_lsn <= drop_tombstones_below.

    ``max_buckets_per_commit=k`` bounds the TRANSIENT scratch of a big
    fold: instead of reading + shuffling + staging the entire selection in
    ONE commit — O(table) scratch on the shuffle/staging volume, which is
    exactly how a 10^9-event convergence fold dies with ENOSPC — the
    selection is folded in groups of k buckets, one atomic snapshot commit
    per group. Every intermediate snapshot is a valid table (the groups
    partition the bucket set, and an un-folded bucket still LWW-resolves
    at read time), a crash between groups leaves the completed groups
    committed and the rest still pending (``should_fold`` /
    ``_pending_delta_buckets`` re-derive them), and the final state is
    row-identical to a one-shot fold. Scratch per commit is O(k·bucket).

    Folding MOR deltas happens for free: ``table.read`` LWW-resolves them,
    and the rewrite commits plain base files (``kind`` absent), so the
    read-time merge cost drops back to zero for the folded buckets.
    ``post`` (optional fn(DataFrame) -> DataFrame) runs over the resolved
    rows before the rewrite — the engine passes its display-enrichment
    recompute here so MOR batches' batch-local displays converge to the
    global view at fold time."""
    snap = table.current_snapshot()
    if snap is None:
        return {"skipped": True, "reason": "no snapshot"}

    by_bucket: dict[int, int] = {}
    delta_buckets: set[int] = set()
    for f in snap["files"]:
        by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
        if f.get("kind", "base") == "delta":
            delta_buckets.add(f["bucket"])
    if buckets is None:
        if drop_tombstones_below is not None:
            buckets = sorted(by_bucket)
        else:
            buckets = sorted(b for b, n in by_bucket.items() if n > 1 or b in delta_buckets)
    if not buckets:
        return {"skipped": True, "reason": "nothing to compact"}

    if max_buckets_per_commit is not None and len(buckets) > max_buckets_per_commit:
        k = int(max_buckets_per_commit)
        if k < 1:
            raise ValueError("max_buckets_per_commit must be >= 1")
        results = []
        for i in range(0, len(buckets), k):
            results.append(
                compact(
                    table,
                    buckets=buckets[i : i + k],
                    drop_tombstones_below=drop_tombstones_below,
                    post=post,
                )
            )
        done = [r for r in results if not r.get("skipped")]
        return {
            "grouped": True,
            "commits": len(done),
            "compacted_buckets": sum(r.get("compacted_buckets", 0) for r in done),
            "snapshot_id": done[-1]["snapshot_id"] if done else None,
            "results": results,
        }

    # Fold pipeline shape (measured A/B in OPTIMIZATION_r06.md): the
    # resolved read keeps the LWW's map-side PARTIAL reduce — fold input
    # has high per-key multiplicity (base + one winner per touching delta
    # commit), so combining before the exchange shrinks the shuffle ~3×
    # (a raw-read/complete-agg variant measured 2× slower). The resolved
    # winners are PERSISTed so the display-enrichment pass — whose
    # narrative-index branch is a second consumer of the same subtree —
    # reads them once instead of re-running the scan + reduce, and the
    # rewrite commits with assume_reduced=True so merge skips its own
    # (redundant) re-reduce of already-unique rows.
    df = table.read(buckets=buckets, include_tombstones=True)
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    out = df
    if drop_tombstones_below is not None:
        out = out.where(
            ~(F.col("_deleted") & (F.col("change_lsn") <= drop_tombstones_below))
        )
    if post is not None:
        out = post(out)

    batch_id = f"compact-{snap['snapshot_id']}-{int(time.time() * 1000)}"
    # replace_buckets: the filtered read IS the new bucket content (rows are
    # already LWW winners); merge handles file layout + snapshot commit.
    # advance_watermarks=False: rewriting old content applies no new events,
    # so per-bucket watermarks must not be inflated to the table max.
    try:
        res = table.merge(
            out,
            batch_id,
            touched_buckets=buckets,
            replace_buckets=True,
            advance_watermarks=False,
            assume_reduced=True,
            # Maintenance is the one pass that pays per-file footer reads:
            # stamp min/max stats so reads can skip the rewritten files
            # (point lookups + read_since) — the ingest path never does.
            collect_stats=True,
        )
    finally:
        df.unpersist()
    res["compacted_buckets"] = len(buckets)
    return res


def expire_snapshots(table: LakeTable, keep_last: int = 5) -> dict:
    """Bound the time-travel horizon (≙ Iceberg expire_snapshots): delete
    manifest files older than the newest ``keep_last``, never the current.
    Data files that only expired snapshots referenced become orphans and
    are reclaimed by the next ``gc_orphans`` (which scans every RETAINED
    manifest, so retained history stays readable)."""
    import os
    import re

    cur = table._current_version()
    if cur is None:
        return {"expired": 0}
    # Tagged snapshots are pinned outside the horizon: a tag is a
    # reproducibility promise ("training run X read exactly this"), so it
    # and its data files survive until the tag is deleted.
    pinned = {int(t["version"]) for t in table.tags().values()}
    expired = 0
    for fn in sorted(os.listdir(table._manifest_dir)):
        m = re.fullmatch(r"v(\d{8})\.json", fn)
        if not m:
            continue
        v = int(m.group(1))
        if v != cur and v <= cur - keep_last and v not in pinned:
            os.remove(os.path.join(table._manifest_dir, fn))
            expired += 1
    return {"expired": expired, "keep_last": keep_last, "current": cur, "pinned": sorted(pinned)}


def _retained_references(table: LakeTable) -> tuple[set[str], set[str]]:
    """(data-file paths, manifest-segment paths) referenced by ANY
    retained manifest. GC must honor the full retained history, not just
    the current snapshot — otherwise compaction + GC would tear files out
    from under time travel (``read(version=...)``) and incremental
    scans. Segment paths are collected from the RAW manifests so GC can
    also sweep segments orphaned by expire/abort/conflict."""
    import json
    import os
    import re

    from . import manifests as _mf

    refs: set[str] = set()
    seg_refs: set[str] = set()
    for fn in os.listdir(table._manifest_dir):
        if not re.fullmatch(r"v\d{8}\.json", fn):
            continue
        try:
            with open(os.path.join(table._manifest_dir, fn)) as f:
                raw = json.load(f)
            seg_refs.update(_mf.segment_refs(raw))
            snap = _mf.inflate(table._manifest_dir, raw)
            refs.update(f_["path"] for f_ in snap["files"])
        except (OSError, json.JSONDecodeError):
            continue
    return refs, seg_refs


def gc_orphans(table: LakeTable, min_age_sec: float = 3600.0) -> dict:
    """Remove data files not referenced by any retained snapshot: commit
    dirs orphaned by a crash before commit or by a SnapshotConflict loser,
    stale staging dirs, and data files whose only referencing snapshots
    were expired (``expire_snapshots``). ``min_age_sec`` guards in-flight
    writers (an uncommitted dir younger than the horizon is left alone).
    ≙ Iceberg's remove_orphan_files."""
    import os
    import shutil

    referenced, referenced_segs = _retained_references(table)
    now = time.time()
    removed_dirs, removed_files = 0, 0

    # Manifest segments (lake/manifests.py) orphaned by expire_snapshots,
    # abort_snapshot, or a SnapshotConflict loser: a segment is live while
    # any retained v*.json references it; the age guard protects segments
    # written by an in-flight commit whose snapshot file isn't down yet.
    removed_segs = 0
    import re as _re

    for fn in os.listdir(table._manifest_dir):
        if not _re.fullmatch(r"seg-[0-9a-f]+\.json", fn):
            continue
        p = os.path.join(table._manifest_dir, fn)
        if fn not in referenced_segs and now - os.path.getmtime(p) >= min_age_sec:
            os.remove(p)
            removed_segs += 1

    for token_dir in os.listdir(table._staging_dir):
        p = os.path.join(table._staging_dir, token_dir)
        # Age by the NEWEST mtime under the dir, not the dir's own: an
        # in-flight Spark write keeps creating task files, so a long write
        # (longer than min_age_sec) still reads as active and can't have
        # its staging torn out from under the commit's finalize rename.
        newest = os.path.getmtime(p)
        for dirpath, _dirs, files in os.walk(p):
            for fn in files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(dirpath, fn)))
                except OSError:
                    newest = now  # file churned mid-walk => writer active
        if now - newest >= min_age_sec:
            shutil.rmtree(p, ignore_errors=True)
            removed_dirs += 1

    data_dir = table._data_dir
    for entry in os.listdir(data_dir):
        p = os.path.join(data_dir, entry)
        if not os.path.isdir(p):
            # legacy flat layout: data/bNNN-sNNN-*.parquet
            rel = f"data/{entry}"
            if rel not in referenced and now - os.path.getmtime(p) >= min_age_sec:
                os.remove(p)
                removed_files += 1
            continue
        prefix = f"data/{entry}/"
        if any(r.startswith(prefix) for r in referenced):
            # Partially referenced commit dir (e.g. compaction superseded
            # some of its buckets): remove just the unreferenced files.
            for dirpath, _dirs, files in os.walk(p):
                for fn in files:
                    fp = os.path.join(dirpath, fn)
                    rel = os.path.relpath(fp, table.root)
                    if (
                        fn.endswith(".parquet")
                        and rel not in referenced
                        and now - os.path.getmtime(fp) >= min_age_sec
                    ):
                        os.remove(fp)
                        removed_files += 1
            continue
        if now - os.path.getmtime(p) >= min_age_sec:
            shutil.rmtree(p, ignore_errors=True)
            removed_dirs += 1
    return {
        "removed_dirs": removed_dirs,
        "removed_files": removed_files,
        "removed_segments": removed_segs,
    }


def rebucket(table: LakeTable, new_num_buckets: int, post=None) -> dict:
    """Partition evolution (≙ Iceberg partition-spec evolution): rewrite
    the table under a new ``num_buckets``. A bucket count sized for 1 TB
    strangles a 100 TB table (each MERGE's per-bucket files grow without
    bound, hot buckets stop splitting), so the count must be able to grow
    with the table. One full-table rewrite, like Iceberg's — but a single
    snapshot commit, atomically switching readers and writers to the new
    layout; pending MOR deltas are resolved and folded in on the way.

    Watermarks: old per-bucket watermarks are keyed by dead bucket ids;
    every new bucket inherits the MINIMUM old watermark (each new bucket
    mixes rows from many old buckets, so the only claim that stays true
    per-bucket is the weakest one — conservative, GC-safe: min_safe_gc_lsn
    is unchanged by the rewrite)."""
    snap = table.current_snapshot()
    if snap is None:
        return {"skipped": True, "reason": "no snapshot"}
    if int(new_num_buckets) == table.num_buckets:
        return {"skipped": True, "reason": "same bucket count"}
    old_buckets = sorted({f["bucket"] for f in snap["files"]})
    if not old_buckets:
        return {"skipped": True, "reason": "empty table"}

    # same shape as compact: resolved read (partial reduce before the
    # exchange), post over the winners, assume_reduced rewrite
    df = table.read(include_tombstones=True)
    if post is not None:
        df = post(df)
    wm_vals = [int(v) for v in snap["watermarks"].values()]
    floor_wm = min(wm_vals) if wm_vals else -1
    new_wm = {str(b): floor_wm for b in range(int(new_num_buckets))}

    old_n = table.num_buckets
    table.num_buckets = int(new_num_buckets)
    try:
        res = table.merge(
            df,
            batch_id=f"rebucket-{snap['snapshot_id']}-{old_n}to{new_num_buckets}",
            touched_buckets=old_buckets,
            replace_buckets=True,
            advance_watermarks=False,
            watermarks_override=new_wm,
            assume_reduced=True,
            collect_stats=True,
        )
    except Exception:
        table.num_buckets = old_n
        raise
    res["num_buckets"] = int(new_num_buckets)
    return res


def should_fold(table: LakeTable, max_deltas_per_bucket: int = 8) -> list[int]:
    """Fold-scheduling policy for merge-on-read tables: the buckets whose
    pending delta-file count exceeds the threshold. Read-time merge cost
    grows with deltas per bucket (every read of the bucket re-reduces
    them), so a bounded threshold bounds read amplification; the caller
    compacts exactly these buckets (``compact(table, buckets=...)``)
    instead of sweeping the whole table."""
    snap = table.current_snapshot()
    if snap is None:
        return []
    deltas: dict[int, int] = {}
    for f in snap["files"]:
        if f.get("kind", "base") == "delta":
            deltas[f["bucket"]] = deltas.get(f["bucket"], 0) + 1
    return sorted(b for b, n in deltas.items() if n > max_deltas_per_bucket)


def min_safe_gc_lsn(table: LakeTable) -> int | None:
    """Highest LSN safely GC-able: the minimum committed per-bucket
    high-watermark (no replay can deliver an uncommitted event at or below
    it)."""
    snap = table.current_snapshot()
    if not snap or not snap["watermarks"]:
        return None
    return min(int(v) for v in snap["watermarks"].values())


def verify_table(table: LakeTable) -> dict:
    """Metadata consistency check (≙ an fsck for the lake format, the ops
    tool you run before trusting a restored/migrated table): walks every
    RETAINED manifest driver-side — no Spark jobs, no data reads beyond
    stat() — and reports structural violations instead of letting them
    surface later as wrong query results.

    Checks, per retained snapshot: every referenced manifest segment
    exists and parses; every data-file entry exists on disk with the
    recorded byte size; every file's schema era (``sv``) resolves in the
    snapshot's era map; bucket ids fit the snapshot's ``num_buckets``.
    Chain-level: the parent chain links consistently across retained
    manifests, and per-bucket watermarks never regress child→parent.
    Returns {"ok": bool, "snapshots_checked": n, "files_checked": n,
    "issues": [str...]} — empty issues on a healthy table."""
    import json as _json
    import os
    import re

    from . import manifests as _mf

    issues: list[str] = []
    snaps: dict[int, dict] = {}
    raws: dict[int, dict] = {}
    for fn in sorted(os.listdir(table._manifest_dir)):
        m = re.fullmatch(r"v(\d{8})\.json", fn)
        if not m:
            continue
        v = int(m.group(1))
        try:
            with open(os.path.join(table._manifest_dir, fn)) as f:
                raw = _json.load(f)
        except (OSError, _json.JSONDecodeError) as exc:
            issues.append(f"v{v}: manifest unreadable: {exc}")
            continue
        raws[v] = raw
        for seg in sorted(_mf.segment_refs(raw)):
            p = os.path.join(table._manifest_dir, seg)
            if not os.path.exists(p):
                issues.append(f"v{v}: missing segment {seg}")
        try:
            snaps[v] = _mf.inflate(table._manifest_dir, raw)
        except (OSError, _json.JSONDecodeError) as exc:
            issues.append(f"v{v}: segment unreadable: {exc}")

    files_checked = 0
    for v, snap in snaps.items():
        eras = set(snap.get("schemas", {}))
        nb = int(snap.get("num_buckets", 0))
        for f in snap["files"]:
            files_checked += 1
            p = os.path.join(table.root, f["path"])
            if not os.path.exists(p):
                issues.append(f"v{v}: missing data file {f['path']}")
            elif "bytes" in f and os.path.getsize(p) != int(f["bytes"]):
                issues.append(
                    f"v{v}: size mismatch {f['path']}: manifest {f['bytes']} "
                    f"disk {os.path.getsize(p)}"
                )
            if eras and str(f.get("sv", "")) not in eras and "sv" in f:
                issues.append(f"v{v}: file {f['path']} era sv={f['sv']} not in era map")
            if not (0 <= int(f["bucket"]) < nb):
                issues.append(f"v{v}: file {f['path']} bucket {f['bucket']} out of range {nb}")

    ordered = sorted(snaps)
    for v in ordered:
        parent = snaps[v].get("parent_id")
        if parent is not None and parent in snaps:
            if parent >= v:
                issues.append(f"v{v}: parent_id {parent} not older than child")
            pw = snaps[parent].get("watermarks", {})
            cw = snaps[v].get("watermarks", {})
            # watermarks may only regress across a rebucket (bucket ids renumber)
            if snaps[v].get("num_buckets") == snaps[parent].get("num_buckets"):
                for b, lsn in pw.items():
                    if b in cw and int(cw[b]) < int(lsn):
                        issues.append(f"v{v}: watermark regressed bucket {b}: {pw[b]} -> {cw[b]}")

    cur = table._current_version()
    if cur is not None and cur not in raws:
        issues.append(f"_current points at missing v{cur}")
    for name, t in table.tags().items():
        if int(t["version"]) not in raws:
            issues.append(f"tag {name!r} pins missing v{t['version']}")

    return {
        "ok": not issues,
        "snapshots_checked": len(raws),
        "files_checked": files_checked,
        "issues": issues,
    }
