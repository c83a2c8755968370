"""Segmented snapshot manifests: O(touched) metadata writes per commit.

The problem this solves (the 100 TB metadata bottleneck): a snapshot
manifest that inlines the full live-file list makes EVERY commit write
O(total files) of JSON — at millions of data files and ~10^5 commits the
driver spends more time serializing metadata than Spark spends on data,
and the manifest directory grows as O(commits × files). Iceberg's answer
is the manifest list: a commit writes only the manifest files it changed
and re-points at the rest (≙ Iceberg snapshot → manifest-list →
manifest-file indirection; same idea as Delta's checkpoint + JSON actions).

This module is that indirection for the lake, keyed by the table's own
partitioning unit — the bucket:

- a **file segment** (``_manifests/seg-*.json``) is an immutable JSON list
  of the data-file entries of ONE bucket at one point in time;
- a snapshot stores ``file_segments``: {bucket: {path, n}} instead of an
  inline ``files`` list. A commit rewrites only the segments of buckets it
  touched and carries every other bucket's segment BY PATH — so commit
  metadata cost is O(files in touched buckets), not O(all files);
- ``applied_batches`` (the exactly-once registry, which otherwise grows by
  one entry per batch forever and is re-serialized on every commit) is
  spilled the same way: the snapshot inlines only the most recent entries
  (``applied_recent``); once that exceeds ``APPLIED_SPILL_AT`` they are
  flushed to an immutable **applied segment** and the snapshot carries the
  segment chain (``applied_segments``) by path. Commit cost for the
  registry is O(spill threshold) amortized O(1) per batch.

Loading INFLATES a snapshot back to the historical in-memory shape —
``snap["files"]`` / ``snap["applied_batches"]`` — so every consumer
(reads, change-feed span walks, the streaming source, maintenance, the
metadata tables) is unchanged. Segments are immutable, so they are cached
per process (``_SEG_CACHE``); a span walk over k versions that share most
buckets parses each shared segment once, not k times.

Durability/GC contract: segments are written BEFORE the snapshot file
that references them (a crash or SnapshotConflict in between leaves an
orphaned segment — swept by ``maintenance.gc_orphans`` with its normal
age guard, exactly like orphaned data files). ``expire_snapshots`` only
removes ``v*.json``; a segment lives until NO retained snapshot references
it. Legacy inline manifests load unchanged and are upgraded to segments
on the first commit that follows them.

Pure stdlib on purpose: the streaming source's driver/executor code loads
snapshots through this module without a SparkSession.
"""

from __future__ import annotations

import json
import os
import uuid
from collections import OrderedDict

# Spill the exactly-once batch registry once the inline tail exceeds this.
# 64 entries ≈ a few KB of JSON — big enough that the segment chain grows
# slowly (1 per 64 commits), small enough that re-serializing the tail per
# commit is noise.
APPLIED_SPILL_AT = 64

_SEG_CACHE: OrderedDict[str, object] = OrderedDict()
_SEG_CACHE_MAX = 4096


def _load_segment(manifest_dir: str, rel: str):
    """Parsed content of an immutable segment file, process-cached."""
    path = os.path.join(manifest_dir, rel)
    hit = _SEG_CACHE.get(path)
    if hit is not None:
        _SEG_CACHE.move_to_end(path)
        return hit
    with open(path) as f:
        obj = json.load(f)
    _SEG_CACHE[path] = obj
    if len(_SEG_CACHE) > _SEG_CACHE_MAX:
        _SEG_CACHE.popitem(last=False)
    return obj


def _write_segment(manifest_dir: str, obj) -> str:
    """Write one immutable segment file; returns its manifest-relative
    path. Atomic (tmp + rename) so a reader never sees a torn segment;
    compact separators — segments are the bulk of metadata bytes."""
    rel = f"seg-{uuid.uuid4().hex[:16]}.json"
    final = os.path.join(manifest_dir, rel)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, separators=(",", ":"))
    os.rename(tmp, final)
    _SEG_CACHE[final] = obj
    return rel


def inflate(manifest_dir: str, snap: dict | None) -> dict | None:
    """Resolve a raw on-disk snapshot to the in-memory shape: inline
    ``files`` and ``applied_batches`` reconstructed from segments.
    Idempotent — legacy inline manifests and already-inflated dicts pass
    through unchanged. File-entry dicts are shallow-copied so callers may
    extend them (e.g. stats stamping on fresh entries) without poisoning
    the immutable segment cache."""
    if snap is None or "files" in snap:
        return snap
    snap = dict(snap)
    files: list[dict] = []
    segs = snap.get("file_segments", {})
    for b in sorted(segs, key=int):
        files.extend(dict(f) for f in _load_segment(manifest_dir, segs[b]["path"]))
    snap["files"] = files
    applied: dict = {}
    for rel in snap.get("applied_segments", []):
        applied.update(_load_segment(manifest_dir, rel))
    applied.update(snap.get("applied_recent", {}))
    snap["applied_batches"] = applied
    return snap


def deflate(
    manifest_dir: str,
    manifest: dict,
    parent: dict | None,
    changed_buckets: set[int] | None,
) -> dict:
    """The on-disk form of ``manifest``: ``files`` split into per-bucket
    segments (buckets outside ``changed_buckets`` reuse the parent
    snapshot's segment by path — zero bytes written for them) and
    ``applied_batches`` spilled past the inline tail. ``changed_buckets=
    None`` means every bucket changed (bootstrap / legacy upgrade).
    Parent segments are only reusable when the bucket layout is the same
    (a rebucket renumbers buckets, so nothing carries over)."""
    disk = dict(manifest)

    files = disk.pop("files")
    by_bucket: dict[int, list[dict]] = {}
    for f in files:
        by_bucket.setdefault(int(f["bucket"]), []).append(f)
    parent_segs = dict((parent or {}).get("file_segments") or {})
    if parent is not None and parent.get("num_buckets") != manifest.get("num_buckets"):
        parent_segs = {}
    changed = (
        set(by_bucket)
        if changed_buckets is None or not parent_segs
        else {int(b) for b in changed_buckets}
    )
    segs: dict[str, dict] = {}
    for b, fs in sorted(by_bucket.items()):
        prev = parent_segs.get(str(b))
        if b not in changed and prev is not None:
            segs[str(b)] = prev
        else:
            segs[str(b)] = {"path": _write_segment(manifest_dir, fs), "n": len(fs)}
    disk["file_segments"] = segs

    applied = disk.pop("applied_batches")
    applied_segs = list((parent or {}).get("applied_segments") or [])
    if parent is not None and "applied_recent" in parent and "applied_batches" in parent:
        # O(1) tail derivation: an INFLATED parent carries both the full
        # registry and its inline tail — the new tail is the parent's tail
        # plus this commit's new batch ids. Never touches the segment
        # chain, so commit cost stays flat at 10^6 applied batches.
        recent = dict(parent["applied_recent"])
        recent.update({k: v for k, v in applied.items() if k not in parent["applied_batches"]})
    else:
        spilled: set[str] = set()
        for rel in applied_segs:
            spilled.update(_load_segment(manifest_dir, rel))
        recent = {k: v for k, v in applied.items() if k not in spilled}
    if len(recent) > APPLIED_SPILL_AT:
        applied_segs.append(_write_segment(manifest_dir, recent))
        recent = {}
    disk["applied_segments"] = applied_segs
    disk["applied_recent"] = recent
    return disk


def segment_refs(raw_snap: dict) -> set[str]:
    """Every segment path a RAW (on-disk) snapshot references — for GC:
    a segment is live while any retained snapshot lists it here."""
    refs = {s["path"] for s in raw_snap.get("file_segments", {}).values()}
    refs.update(raw_snap.get("applied_segments", []))
    return refs


def load_snapshot(manifest_dir: str, version: int) -> dict:
    """Load + inflate one snapshot by version. Raises FileNotFoundError
    for an expired version — span walks rely on that to fall back."""
    with open(os.path.join(manifest_dir, f"v{version:08d}.json")) as f:
        return inflate(manifest_dir, json.load(f))
