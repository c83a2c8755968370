"""Iceberg-shaped table format: parquet data files + atomic JSON snapshot
manifests, with bucket-level file pruning and an exactly-once MERGE.

No Iceberg/Delta jar exists in this sandbox, so the engine owns the commit
protocol (in-scope per the north rule: "exactly-once sink … from scratch").
The design mirrors, at lake scale, the reference's two commit artifacts:

- the ``RefinerComplete`` manifest written only after all outputs succeed
  (reference refiner/app/lambda/lambda_function.py:276-295) → our snapshot
  JSON, committed by atomic rename only after all data files are in place;
- deterministic output identity making retries idempotent
  (reference refiner/app/services/ecr/augment.py:119-224) → our
  ``applied_batches`` registry + per-bucket high-watermark LSNs, making a
  re-delivered batch a no-op.

Layout::

    <root>/
      data/c<token>/_bucket=<b>/part-*.parquet   # immutable per-commit dirs
      _manifests/v<NNNNNNNN>.json                # immutable snapshots
      _manifests/_current                        # pointer, atomic rename
      _staging/<token>/...                       # uncommitted writes

Commit-dir names carry a uuid token, not the snapshot version, so two
concurrent writers racing for the same snapshot_id write disjoint paths —
the loser's SnapshotConflict leaves an orphan dir (swept by
maintenance.gc_orphans), never a clobbered committed file. Finalize is a
single directory rename: cost independent of file count.

Scale properties:
- **Copy-on-write at bucket granularity.** ``conv_id`` hash-buckets the
  table; a MERGE reads and rewrites only the buckets its delta touches
  (file list comes from the manifest — no directory listing, no full scan).
  At 100 TB with enough buckets, a batch touching k buckets costs O(k),
  not O(table).
- **Merge-on-read mode** (``merge(mode="mor")``): the batch's refined
  winners are committed as *delta* files (``kind: "delta"`` in the
  manifest) without rewriting the touched buckets — write cost O(batch),
  not O(touched buckets). ``read()`` detects delta files and resolves LWW
  at read time (the same hash-agg as the write path); ``maintenance.
  compact`` folds deltas back into base files. This is the Iceberg
  COW-vs-MOR trade: MOR for write-heavy ingest phases (10^10-event
  backfill), fold + COW for read-heavy steady state. Physical storage
  holds ≤1 row per key per *commit* rather than per table; bounded by
  compaction cadence.
- **Time travel + incremental scan.** Snapshots are immutable; ``read(
  version=v)`` reads any retained snapshot, and ``read_changes(v1, v2)``
  emits the rows of files added between two snapshots (under MOR commits
  that is exactly the refined per-batch change feed — the table can
  re-emit its own CDC stream; under COW it is bucket-granular).
- **Tombstones, not physical deletes.** A delete (or a refinement that
  drops a turn) becomes a ``_deleted=true`` row retaining its
  (ts, change_lsn), so late/out-of-order re-deliveries of older events
  lose LWW against the tombstone instead of resurrecting the row. State is
  bounded: ≤1 row per (conv_id, turn_idx) ever.
- **Schema evolution on write.** New delta columns widen the snapshot
  schema (additive merge); old files are read through the new schema
  (missing columns → NULL). Incompatible type changes fail the commit
  (≙ the reference's schema_version gate, lambda_function.py:604-627).
- The commit primitive is POSIX atomic rename; on HDFS/S3-with-manifest
  stores the same protocol holds with the FS shim swapped.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Manifest file-level min/max stats (≙ Iceberg data-file column stats).
# EXACT stats are stamped only on maintenance rewrites (compact/fold/
# rebucket pass collect_stats=True); the ingest hot path stamps a
# CONSERVATIVE per-bucket ts range on MOR delta entries, computed by the
# caller's pre-pass aggregation (bucket_ts_range) — either way the MERGE
# finalize stays a single os.replace with zero per-file footer reads
# (pinned by test_no_driver_side_footer_reads, which bans the
# footer-reading library from THIS module — the reader lives in
# lake/stats.py).
from . import manifests as _mf
from .stats import STATS_COLS, _stats_keep, _ts_us, file_column_stats  # noqa: F401

FORMAT_VERSION = 1
KEY = ("conv_id", "turn_idx")
ORDER = ("ts", "change_lsn")
# Sort rows by key inside each data file (within-partition sort, no
# shuffle): parquet row-group min/max stats on conv_id then let point
# lookups skip row groups, and like-keyed rows compress better. Costs a
# per-batch sort in the write path — measured A/B in BENCH.md.
SORT_WITHIN_FILES = True
# Splitting threshold for staged data files. At 100 TB a compacted bucket is
# MANY files; because files are key-sorted, the split points give each file a
# disjoint conv_id range — which manifest-level stats (below) turn into a
# point-lookup index.
MAX_RECORDS_PER_FILE = 5_000_000


class SnapshotConflict(Exception):
    """Concurrent commit detected (snapshot file already exists)."""


def merge_with_retry(table: "LakeTable", delta: DataFrame, batch_id: str, retries: int = 3, **kw) -> dict:
    """Optimistic-concurrency retry loop for multi-writer deployments
    (≙ Iceberg's commit retry): on SnapshotConflict the merge re-reads the
    now-current snapshot and re-runs — correct because ``merge`` derives
    everything (old files, schema, watermarks, applied registry) from the
    snapshot it reads at entry, and the loser's data files live in a
    uuid-token commit dir that can never collide with the winner's. If the
    winning commit was this very batch_id (a retried duplicate delivery
    racing itself), the re-run returns skipped. Retries are cheap in MOR
    mode (no bucket rewrite to redo)."""
    last: Exception | None = None
    for _ in range(retries + 1):
        try:
            return table.merge(delta, batch_id, **kw)
        except SnapshotConflict as e:
            last = e
    raise last  # type: ignore[misc]


class IncompatibleSchemaChange(Exception):
    """A delta changed an existing column's type — hard fail on commit."""


def bucket_expr(num_buckets: int, col: str | None = "conv_id", lit: str | None = None):
    src = F.lit(lit) if col is None else F.col(col)
    return F.pmod(F.xxhash64(src), F.lit(num_buckets)).cast("int")


_XXP1, _XXP2, _XXP3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_XXP4, _XXP5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Driver-side XXH64 (spec implementation), seed 42 = Spark's
    ``F.xxhash64`` default — so point lookups can compute a key's bucket
    without launching a Spark job. Parity with the write-path expression is
    pinned by ``tests/test_lake.py::test_driver_side_xxhash64_parity``."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = _rotl((v + lane * _XXP2) & _M64, 31) * _XXP1 & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _XXP2) & _M64, 31) * _XXP1 & _M64)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = ((_rotl(h ^ (_rotl((lane * _XXP2) & _M64, 31) * _XXP1 & _M64), 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((lane * _XXP1) & _M64), 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _XXP5) & _M64), 11)) * _XXP1) & _M64
        i += 1
    h = ((h ^ (h >> 33)) * _XXP2) & _M64
    h = ((h ^ (h >> 29)) * _XXP3) & _M64
    return h ^ (h >> 32)


def _widen_nullability(old: T.DataType, new: T.DataType) -> T.DataType | None:
    """The nullability-widened union of two types that are equal up to
    nullability, or None when they differ structurally (a REAL type
    change). Nullability is metadata, not physical layout: a parquet
    round-trip normalizes nested required fields to optional, so a
    maintenance rewrite feeding read-back rows into ``merge`` must not
    trip the incompatible-type gate on required→optional (the same
    promotion Iceberg allows). Widening is monotone — a field once
    optional stays optional."""
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        if [f.name for f in old.fields] != [f.name for f in new.fields]:
            return None
        fields = []
        for of, nf in zip(old.fields, new.fields):
            dt = _widen_nullability(of.dataType, nf.dataType)
            if dt is None:
                return None
            fields.append(T.StructField(of.name, dt, of.nullable or nf.nullable))
        return T.StructType(fields)
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        dt = _widen_nullability(old.elementType, new.elementType)
        if dt is None:
            return None
        return T.ArrayType(dt, old.containsNull or new.containsNull)
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        kt = _widen_nullability(old.keyType, new.keyType)
        vt = _widen_nullability(old.valueType, new.valueType)
        if kt is None or vt is None:
            return None
        return T.MapType(kt, vt, old.valueContainsNull or new.valueContainsNull)
    return old if old == new else None


def _merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Additive schema merge: old column order preserved, new columns
    appended nullable. Type changes are incompatible (nullability-only
    differences widen, see ``_widen_nullability``)."""
    by_name = {f.name: f for f in new.fields}
    fields: list[T.StructField] = []
    for f in old.fields:
        nf = by_name.get(f.name)
        if nf is None:
            fields.append(f)
            continue
        dt = _widen_nullability(f.dataType, nf.dataType)
        if dt is None:
            raise IncompatibleSchemaChange(
                f"column {f.name!r}: {f.dataType.simpleString()} -> {nf.dataType.simpleString()}"
            )
        fields.append(T.StructField(f.name, dt, f.nullable or nf.nullable))
    old_names = {f.name for f in old.fields}
    for f in new.fields:
        if f.name not in old_names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


# ---------------- field ids (≙ Iceberg's schema-evolution mechanism) ----
#
# Every logical column has a stable integer id (manifest key ``columns``:
# ``[{id, name, type}]``, plus ``next_column_id``). Data files record the
# schema era (manifest ``schema_version``) they were written under as an
# ``"sv"`` tag on their manifest entry, and the era map (manifest key
# ``schemas``: ``{sv: columns}``) translates id → that era's physical
# column name. Reads resolve columns BY ID per era, so:
#
# - a RENAMED column keeps reading its old physical name from old files
#   (``rename_column`` is a metadata-only commit);
# - a DROPPED-then-re-added name gets a FRESH id, so the old bytes still
#   sitting under that name in un-rewritten files stay invisible (the
#   dropped id is in no live column set, and the fresh id is absent from
#   the old eras → NULL).
#
# Manifests written before this feature carry no ``columns``; on the next
# commit they are upgraded in place: ids are assigned in schema order and
# every file entry is stamped with the then-current schema_version — sound
# because physical names were never renamed before ids existed, so each
# such file's physical names are a by-name subset of that era's columns.


def _cols_to_schema(cols: list[dict]) -> T.StructType:
    return T.StructType(
        [T.StructField(c["name"], T._parse_datatype_json_value(c["type"]), True) for c in cols]
    )


def _schema_to_cols(schema: T.StructType, start_id: int = 1) -> list[dict]:
    return [
        {"id": start_id + i, "name": f.name, "type": f.dataType.jsonValue()}
        for i, f in enumerate(schema.fields)
    ]


def _merge_columns(
    cols: list[dict], next_id: int, delta: T.StructType
) -> tuple[list[dict], int]:
    """Id-aware additive merge: existing names keep their id (type change
    is incompatible); unknown names — including a previously dropped name —
    are appended with a FRESH id."""
    by_name = {c["name"]: c for c in cols}
    out = [dict(c) for c in cols]
    by_name_out = {c["name"]: c for c in out}
    for f in delta.fields:
        c = by_name.get(f.name)
        if c is None:
            out.append({"id": next_id, "name": f.name, "type": f.dataType.jsonValue()})
            next_id += 1
            continue
        registered = T._parse_datatype_json_value(c["type"])
        if registered == f.dataType:
            continue
        widened = _widen_nullability(registered, f.dataType)
        if widened is None:
            raise IncompatibleSchemaChange(
                f"column {f.name!r}: {c['type']} -> {f.dataType.simpleString()}"
            )
        # nullability-only difference: keep the id, widen the registered
        # type (required→optional promotion — a maintenance rewrite's
        # parquet read-back normalizes nested required fields to optional)
        if widened != registered:
            by_name_out[f.name]["type"] = widened.jsonValue()
    return out, next_id


class LakeTable:
    def __init__(self, spark: SparkSession, root: str, num_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.num_buckets = num_buckets
        self._manifest_dir = os.path.join(root, "_manifests")
        self._data_dir = os.path.join(root, "data")
        self._staging_dir = os.path.join(root, "_staging")
        for d in (self._manifest_dir, self._data_dir, self._staging_dir):
            os.makedirs(d, exist_ok=True)
        # An existing table's bucketing is authoritative: opening with a
        # different num_buckets would silently mis-assign buckets and break
        # the LWW union of a key's existing rows.
        snap = self.current_snapshot()
        if snap is not None:
            self.num_buckets = int(snap.get("num_buckets", num_buckets))

    # ---------------- snapshot plumbing ----------------

    def _current_version(self) -> int | None:
        p = os.path.join(self._manifest_dir, "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def current_snapshot(self) -> dict | None:
        v = self._current_version()
        if v is None:
            return None
        return _mf.load_snapshot(self._manifest_dir, v)

    def snapshot(self, version: int | None = None) -> dict | None:
        """A specific retained snapshot (time travel), or the current one.
        Segmented manifests are inflated back to the inline ``files`` /
        ``applied_batches`` shape here, so every consumer sees one format
        (see ``lake/manifests.py`` for the commit-cost rationale)."""
        if version is None:
            return self.current_snapshot()
        return _mf.load_snapshot(self._manifest_dir, version)

    def _commit(self, manifest: dict, publish: bool = True) -> None:
        """Two-step atomic commit: immutable snapshot file (fails if a
        concurrent writer claimed the version), then pointer flip. With
        ``publish=False`` the pointer is left alone — the snapshot is
        staged (write-audit-publish): readers keep seeing the old current,
        an auditor reads ``read(version=...)``, and ``publish_snapshot``
        flips or ``abort_snapshot`` discards."""
        v = manifest["snapshot_id"]
        final = os.path.join(self._manifest_dir, f"v{v:08d}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        if os.path.exists(final):
            os.remove(tmp)
            raise SnapshotConflict(f"snapshot v{v} already committed")
        os.rename(tmp, final)
        if publish:
            self._flip_pointer(v)

    def _flip_pointer(self, v: int) -> None:
        ptr_tmp = os.path.join(self._manifest_dir, f"_current.tmp-{uuid.uuid4().hex}")
        with open(ptr_tmp, "w") as f:
            f.write(str(v))
        os.rename(ptr_tmp, os.path.join(self._manifest_dir, "_current"))

    def publish_snapshot(self, version: int) -> None:
        """WAP publish: make a staged snapshot the current one. The staged
        chain must descend from the current pointer (it does when staged
        by ``merge(publish=False)`` — staging claims the version, so no
        competing writer can have landed in between)."""
        cur = self._current_version()
        snap = self.snapshot(version)
        if cur is not None and snap.get("parent_id") != cur:
            raise SnapshotConflict(
                f"staged v{version} has parent {snap.get('parent_id')}, current is {cur}"
            )
        self._flip_pointer(version)

    def abort_snapshot(self, version: int) -> None:
        """WAP abort: discard a staged (never-published) snapshot. Its data
        files become orphans for gc_orphans; the claimed version is freed
        for the next writer. Only versions ABOVE the current pointer can be
        staged, so anything at or below it is published history — deleting
        that is expire_snapshots' job, not abort's."""
        cur = self._current_version()
        if cur is not None and version <= cur:
            raise ValueError(f"v{version} is published history — cannot abort")
        os.remove(os.path.join(self._manifest_dir, f"v{version:08d}.json"))

    def schema(self) -> T.StructType | None:
        snap = self.current_snapshot()
        return T.StructType.fromJson(snap["schema"]) if snap else None

    # ---------------- refs (named snapshots) ----------------
    #
    # ≙ Iceberg tags: an immutable name → snapshot_id pin. The use case
    # this engine cares about is dataset reproducibility — "train run X
    # read exactly tag `corpus-2026-08`" — so a tagged snapshot is
    # excluded from expire_snapshots' horizon and its data files stay
    # GC-protected (gc honors every retained manifest) until the tag is
    # deleted. Each tag is its OWN file under ``_manifests/_refs/``,
    # created atomically (full-content temp file hard-linked into place,
    # which fails if the name exists): two concurrent taggers with
    # different names each land their file — nobody's pin is lost to a
    # read-modify-write of a shared refs blob — and same-name taggers
    # race to exactly one winner. A pre-round-4 single-file ``_refs.json``
    # is read transparently and burst into per-tag files on first write.

    _TAG_NAME = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]*")

    @property
    def _refs_path(self) -> str:
        return os.path.join(self._manifest_dir, "_refs.json")

    @property
    def _refs_dir(self) -> str:
        return os.path.join(self._manifest_dir, "_refs")

    def _legacy_tags(self) -> dict[str, dict]:
        if not os.path.exists(self._refs_path):
            return {}
        with open(self._refs_path) as f:
            return json.load(f).get("tags", {})

    def tags(self) -> dict[str, dict]:
        tags = self._legacy_tags()
        try:
            entries = os.listdir(self._refs_dir)
        except FileNotFoundError:
            entries = []
        for fn in entries:
            if fn.endswith(".json") and not fn.startswith("."):
                try:
                    with open(os.path.join(self._refs_dir, fn)) as f:
                        tags[fn[:-5]] = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue  # racing delete / half-linked temp
        return tags

    def _write_tag_file(self, name: str, meta: dict) -> None:
        """Atomic create-if-absent: the temp file carries the FULL content
        before the hard link publishes the name, so a reader can never see
        a partial tag; ``os.link`` raises FileExistsError on a name race."""
        os.makedirs(self._refs_dir, exist_ok=True)
        final = os.path.join(self._refs_dir, f"{name}.json")
        tmp = os.path.join(self._refs_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        try:
            os.link(tmp, final)
        finally:
            os.remove(tmp)

    def _migrate_refs(self) -> None:
        """Burst a legacy single-file ``_refs.json`` into per-tag files.
        Safe under concurrency: per-tag creation is create-if-absent, and
        a second migrator's ``remove`` simply finds the file gone."""
        legacy = self._legacy_tags()
        if not legacy:
            return
        for name, meta in legacy.items():
            try:
                self._write_tag_file(name, meta)
            except FileExistsError:
                pass
        try:
            os.remove(self._refs_path)
        except FileNotFoundError:
            pass

    def tag(self, name: str, version: int | None = None, note: str | None = None) -> dict:
        """Pin ``name`` to a retained snapshot (default: current)."""
        if not self._TAG_NAME.fullmatch(name):
            raise ValueError(
                f"invalid tag name {name!r}: use letters, digits, '.', '_', '-' "
                "(must not start with '.')"
            )
        v = int(version) if version is not None else self._current_version()
        if v is None:
            raise ValueError("table has no snapshot to tag")
        self.snapshot(v)  # raises FileNotFoundError for an expired/unknown version
        self._migrate_refs()
        meta = {"version": v, "created_at": time.time(), **({"note": note} if note else {})}
        try:
            self._write_tag_file(name, meta)
        except FileExistsError:
            # The racing winner's tag may itself be gone by the time we
            # re-read (deleted between our failed create and this lookup) —
            # fall back to a generic message rather than a KeyError.
            winner = self.tags().get(name, {}).get("version")
            detail = f"already pins v{winner}" if winner is not None else "already exists"
            raise ValueError(f"tag {name!r} {detail}") from None
        return {"tag": name, "version": v}

    def delete_tag(self, name: str) -> dict:
        if not self._TAG_NAME.fullmatch(name):
            # same gate as tag(): an unvalidated name would be joined into
            # the refs path, letting '../v00000001' escape _refs/ and remove
            # a snapshot manifest.
            raise ValueError(
                f"invalid tag name {name!r}: use letters, digits, '.', '_', '-' "
                "(must not start with '.')"
            )
        self._migrate_refs()
        path = os.path.join(self._refs_dir, f"{name}.json")
        try:
            with open(path) as f:
                gone = json.load(f)
            os.remove(path)
        except FileNotFoundError:
            raise ValueError(f"unknown tag {name!r}") from None
        return {"tag": name, "version": gone["version"], "deleted": True}

    def resolve_tag(self, name: str) -> int:
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"unknown tag {name!r}")
        return int(tags[name]["version"])

    # ---------------- field-id plumbing ----------------

    @staticmethod
    def _upgraded(snap: dict) -> tuple[list[dict], int, list[dict], dict[str, list[dict]]]:
        """(columns, next_column_id, files-with-sv, era map) for a snapshot,
        upgrading a pre-field-id manifest in place (see the field-id note
        above ``_merge_columns``)."""
        sv = snap["schema_version"]
        cols = snap.get("columns")
        if cols is None:
            cols = _schema_to_cols(T.StructType.fromJson(snap["schema"]))
        next_id = int(snap.get("next_column_id", len(cols) + 1))
        files = [dict(f) for f in snap["files"]]
        for f in files:
            f.setdefault("sv", sv)
        schemas = {str(k): v for k, v in snap.get("schemas", {}).items()}
        schemas.setdefault(str(sv), cols)
        return cols, next_id, files, schemas

    def _read_files(self, files: list[dict], snap: dict) -> DataFrame:
        """Read a set of this table's data files through a snapshot's
        logical schema, resolving columns BY FIELD ID per era.

        Files are grouped by the *projection* their era implies (not by raw
        era tag): eras with no rename between them share one parquet scan,
        so the common single-era / never-renamed table stays one multi-path
        scan with full pushdown, exactly as a by-name read. Only files whose
        era physically names a column differently (a rename happened since
        they were written) get a separate scan + rename-projection, unioned
        by name. Manifests predating field ids fall back to by-name."""
        schema = T.StructType.fromJson(snap["schema"])
        paths_of = lambda fs: [os.path.join(self.root, f["path"]) for f in fs]  # noqa: E731
        cols = snap.get("columns")
        if cols is None:
            return self.spark.read.schema(schema).parquet(*paths_of(files))
        schemas = snap.get("schemas", {})
        cur_sv = str(snap["schema_version"])
        # projection key per era: tuple of the era's physical name for each
        # current id (None -> column didn't exist yet -> NULL)
        proj_cache: dict[str, tuple] = {}

        def projection(sv: str) -> tuple:
            if sv not in proj_cache:
                era = {c["id"]: c["name"] for c in schemas.get(sv, cols)}
                proj_cache[sv] = tuple(era.get(c["id"]) for c in cols)
            return proj_cache[sv]

        groups: dict[tuple, list[dict]] = {}
        for f in files:
            groups.setdefault(projection(str(f.get("sv", cur_sv))), []).append(f)

        parts = []
        for proj, fs in groups.items():
            read_fields = [
                T.StructField(phys, T._parse_datatype_json_value(c["type"]), True)
                for phys, c in zip(proj, cols)
                if phys is not None
            ]
            df = self.spark.read.schema(T.StructType(read_fields)).parquet(*paths_of(fs))
            if proj != tuple(c["name"] for c in cols):
                df = df.select(
                    *[
                        F.col(phys).alias(c["name"])
                        if phys is not None
                        else F.lit(None)
                        .cast(T._parse_datatype_json_value(c["type"]))
                        .alias(c["name"])
                        for phys, c in zip(proj, cols)
                    ]
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---------------- read paths ----------------

    def read(
        self,
        buckets: list[int] | None = None,
        include_tombstones: bool = False,
        version: int | None = None,
        conv_id_eq: str | None = None,
        min_ts=None,
        tag: str | None = None,
        resolve_deltas: bool = True,
    ) -> DataFrame:
        """Read a snapshot (current, or ``version`` for time travel),
        pruning to ``buckets`` via the manifest file list (no directory
        listing, no data-file scan for untouched buckets).

        If the selected files include merge-on-read delta files, LWW is
        resolved here (same hash-agg with map-side partial combine as the
        write path — operators/cdc.lww_resolve), so readers always see
        ≤1 row per key regardless of the commit mode used.

        Manifest-level data skipping (file stats stamped by compaction):

        ``conv_id_eq``: keep only files whose conv_id [min,max] can contain
        the key, and filter to it. Safe under LWW because bucketing puts ALL
        rows of a conversation in one bucket, and pruning by conv_id range
        keeps every file that can hold any of its rows; other keys may be
        mis-resolved against the partial file set but are filtered away.

        ``min_ts``: keep only files whose ts max >= min_ts, and filter
        ``ts >= min_ts`` AFTER LWW. Safe because ``ts`` is the LEADING LWW
        order column: a winner's ts is the max ts of its key, so any row in
        a pruned file (all ts < min_ts) that would have won its key has
        ts < min_ts — and so does any lower-ordered row a prune could
        falsely promote — and both fail the post-filter identically.
        (Pruning on ``change_lsn`` — the tiebreak column — would NOT be
        safe: 10% of events carry ts out of lsn order by construction.)

        ``tag``: read the snapshot a named ref pins (``table.tag(...)``) —
        time travel by name, expiry-protected.

        ``resolve_deltas=False`` returns the selected files' rows RAW —
        merge-on-read delta files are not LWW-reduced, so a key may appear
        once per commit that touched it. For callers that immediately run
        their own per-key reduce (maintenance.compact / rebucket feed the
        rows straight into ``merge``, whose bucket-layout LWW subsumes the
        read-side one) — resolving here too would pay a second full
        aggregation + exchange for identical winners. Not valid with
        ``min_ts`` / tombstone filtering (both are winner-level predicates)."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass version or tag, not both")
            version = self.resolve_tag(tag)
        snap = self.snapshot(version)
        schema = T.StructType.fromJson(snap["schema"]) if snap else None
        has_delta = False
        if conv_id_eq is not None and buckets is None:
            buckets = [self.bucket_of(conv_id_eq)]
        if snap is None or not snap["files"]:
            if schema is None:
                raise ValueError("table has no snapshot yet")
            df = self.spark.createDataFrame([], schema)
        else:
            files = snap["files"]
            if buckets is not None:
                want = set(buckets)
                files = [f for f in files if f["bucket"] in want]
            if conv_id_eq is not None:
                files = [f for f in files if _stats_keep(f, "conv_id", conv_id_eq, conv_id_eq)]
            if min_ts is not None:
                files = [f for f in files if _stats_keep(f, "ts", lo=_ts_us(min_ts))]
            has_delta = any(f.get("kind", "base") == "delta" for f in files)
            if not files:
                df = self.spark.createDataFrame([], schema)
            else:
                # Era-aware read (field ids): old files are read through the
                # evolved schema (absent columns -> NULL, renamed columns
                # resolved by id); column pruning and predicate pushdown
                # still reach the parquet scan.
                df = self._read_files(files, snap)
        if conv_id_eq is not None:
            df = df.where(F.col("conv_id") == F.lit(conv_id_eq))
        if not resolve_deltas:
            if min_ts is not None or not include_tombstones:
                raise ValueError(
                    "resolve_deltas=False requires include_tombstones=True "
                    "and no min_ts (winner-level predicates need the reduce)"
                )
            return df
        if has_delta:
            from ..operators.cdc import lww_resolve

            df = lww_resolve(df, key=KEY, order=ORDER)
        if min_ts is not None:
            df = df.where(F.col("ts") >= F.lit(min_ts))
        if not include_tombstones:
            df = df.where(~F.col("_deleted"))
        return df

    def read_changes(
        self,
        from_version: int | None,
        to_version: int | None = None,
        skip_rewrites: bool = True,
        from_tag: str | None = None,
        to_tag: str | None = None,
    ) -> DataFrame:
        """Incremental scan (CDC-out, ≙ Iceberg incremental append scan):
        the rows of data files added between two snapshots, tombstones
        included (it is a change feed, so deletes must be visible).

        Under merge-on-read commits the added files are exactly the
        refined per-batch upserts + tombstones — the table re-emits its
        own change stream for downstream consumers. Under copy-on-write
        commits a rewritten bucket's file carries the whole bucket, so
        the feed is bucket-granular (a superset of the true changes).
        Maintenance rewrites (compaction fold, rebucket) are tagged in
        the manifest and skipped by default — same logical content, so a
        fold between polls yields an empty feed; pass
        ``skip_rewrites=False`` to see physical file churn too.

        ``from_tag``/``to_tag``: resolve endpoints through named refs —
        "what changed between corpus-2026-07 and corpus-2026-08" without
        anyone remembering snapshot ids; tags pin their manifests against
        expiry, so a tag-to-tag diff can't hit an expired endpoint."""
        if from_tag is not None:
            if from_version is not None:
                raise ValueError("pass from_version or from_tag, not both")
            from_version = self.resolve_tag(from_tag)
        if to_tag is not None:
            if to_version is not None:
                raise ValueError("pass to_version or to_tag, not both")
            to_version = self.resolve_tag(to_tag)
        old = self.snapshot(from_version) if from_version else None
        new = self.snapshot(to_version)
        if new is None:
            raise ValueError("table has no snapshot yet")
        old_paths = {f["path"] for f in old["files"]} if old else set()
        added = [f for f in new["files"] if f["path"] not in old_paths]
        if skip_rewrites and from_version is not None:
            # Walk the span's manifests collecting every NON-rewrite file
            # added anywhere in it — the endpoint diff alone is wrong here:
            # a fold inside the span supersedes unconsumed delta files, and
            # skipping the rewrite files that absorbed them would lose
            # their changes. Superseded files stay readable while their
            # manifests are retained (gc honors retained history). If an
            # intermediate manifest was expired, fall back to the endpoint
            # diff INCLUDING rewrites — a full redelivery the idempotent
            # downstream absorbs, never silent loss.
            try:
                span: dict[str, dict] = {}
                prev_paths = set(old_paths)
                for v in range(from_version + 1, new["snapshot_id"] + 1):
                    s = self.snapshot(v)
                    for f_ in s["files"]:
                        if (
                            f_["path"] not in prev_paths
                            and not f_.get("rewrite")
                            and f_["path"] not in span
                        ):
                            span[f_["path"]] = f_
                    prev_paths = {f_["path"] for f_ in s["files"]}
                added = list(span.values())
            except FileNotFoundError:
                pass
        schema = T.StructType.fromJson(new["schema"])
        if not added:
            return self.spark.createDataFrame([], schema)
        return self._read_files(added, new)

    def _metadata_evolution(
        self, snap: dict, new_cols: list[dict], next_id: int, extra: dict | None = None
    ) -> dict:
        """Commit a metadata-only schema change (drop/rename): no data
        files touched, schema_version bumped, era map retains every era a
        live file still reads through."""
        _, _, files, schemas = self._upgraded(snap)
        new_sv = snap["schema_version"] + 1
        live_svs = {str(f["sv"]) for f in files}
        manifest = {
            **snap,
            "snapshot_id": snap["snapshot_id"] + 1,
            "parent_id": snap["snapshot_id"],
            "committed_at": time.time(),
            "schema": json.loads(_cols_to_schema(new_cols).json()),
            "schema_version": new_sv,
            "columns": new_cols,
            "next_column_id": next_id,
            "files": files,
            "schemas": {
                **{sv: c for sv, c in schemas.items() if sv in live_svs},
                str(new_sv): new_cols,
            },
            **(extra or {}),
        }
        # Metadata-only commit: zero data files changed, so every file
        # segment is carried by path — the commit writes ONE small
        # snapshot JSON regardless of table size (unless the parent was a
        # legacy inline manifest, whose first touch writes the segments).
        self._commit(_mf.deflate(self._manifest_dir, manifest, snap, set()))
        return manifest

    def drop_column(self, name: str) -> dict:
        """Schema evolution beyond additive: drop a payload column with a
        metadata-only commit (≙ Iceberg drop column — no data rewrite).
        The narrowed snapshot schema makes every read prune the column;
        the bytes in existing files go dead and fall out at the next
        compaction rewrite.

        Field ids make the drop safe against re-adds: a later column with
        the same NAME gets a fresh id, and reads resolve by id per era, so
        the dead bytes in un-rewritten files can never resurrect.
        KEY/ORDER/engine columns are protected."""
        protected = {*KEY, *ORDER, "_deleted"}
        if name in protected:
            raise ValueError(f"column {name!r} is engine-required")
        snap = self.current_snapshot()
        if snap is None:
            raise ValueError("table has no snapshot yet")
        cols, next_id, _, _ = self._upgraded(snap)
        if name not in {c["name"] for c in cols}:
            raise ValueError(f"no such column {name!r}")
        new_cols = [c for c in cols if c["name"] != name]
        # dropped_columns is recorded for operator visibility only —
        # re-adding the name is allowed (it gets a fresh field id)
        manifest = self._metadata_evolution(
            snap,
            new_cols,
            next_id,
            extra={"dropped_columns": sorted({*snap.get("dropped_columns", []), name})},
        )
        return {"dropped": name, "snapshot_id": manifest["snapshot_id"]}

    def rename_column(self, old: str, new: str) -> dict:
        """Rename a payload column — metadata-only commit (≙ Iceberg
        rename). The column keeps its field id; old data files keep their
        old physical name and reads resolve it by id through the era map,
        so no data is rewritten and nothing is lost."""
        protected = {*KEY, *ORDER, "_deleted"}
        if old in protected:
            raise ValueError(f"column {old!r} is engine-required")
        snap = self.current_snapshot()
        if snap is None:
            raise ValueError("table has no snapshot yet")
        cols, next_id, _, _ = self._upgraded(snap)
        names = {c["name"] for c in cols}
        if old not in names:
            raise ValueError(f"no such column {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        new_cols = [{**c, "name": new} if c["name"] == old else c for c in cols]
        manifest = self._metadata_evolution(snap, new_cols, next_id)
        return {"renamed": [old, new], "snapshot_id": manifest["snapshot_id"]}

    def bucket_of(self, conv_id: str) -> int:
        """The bucket a conversation lives in — driver-side XXH64 (same
        algorithm + seed as the write path's ``F.xxhash64``; parity pinned
        by a test), so a point lookup costs exactly ONE Spark job (the
        pruned read), not a scheduling round-trip to hash the key."""
        h = xxhash64(conv_id.encode("utf-8"))
        signed = h - (1 << 64) if h >= (1 << 63) else h
        return signed % self.num_buckets

    def read_conversation(self, conv_id: str, include_tombstones: bool = False) -> DataFrame:
        """Point lookup: manifest bucket pruning (hash the key, read only
        that bucket's files), then manifest FILE pruning (compaction writes
        key-sorted files split at MAX_RECORDS_PER_FILE, so a big bucket's
        files carry disjoint conv_id ranges — the lookup opens the one file
        that can hold the key), then a pushed-down conv_id filter —
        O(one file), not O(table). The common operational query ('show me
        this conversation') at 100 TB."""
        return self.read(conv_id_eq=conv_id, include_tombstones=include_tombstones)

    def read_since(self, min_ts, include_tombstones: bool = False) -> DataFrame:
        """Tail read: LWW-resolved rows with ``ts >= min_ts`` — 'what
        changed since T' over a huge table. Files whose stamped ts-max is
        below ``min_ts`` (the compacted old base data — at steady state,
        almost everything) are skipped at the manifest, so cost tracks the
        tail size, not the table size; see ``read`` for the safety
        argument. Un-stamped files (fresh ingest) are always scanned."""
        return self.read(min_ts=min_ts, include_tombstones=include_tombstones)

    def read_transcripts(self, version: int | None = None, tag: str | None = None) -> DataFrame:
        """User-facing view: the clean transcripts table of FIXTURES.md §1.
        ``tag``/``version`` time-travel the view (reproducible exports)."""
        return self.read(version=version, tag=tag).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        )

    def read_remainder(self) -> DataFrame:
        """The remainder view (≙ remainder RRs, reference
        services/pipeline.py:397-484): turns that were reportable (arrived
        in the change log) but NOT refined into the live table — i.e.
        refinement-dropped tombstones, with their recorded outcome. The
        anti-join is free: tombstones carry provenance."""
        return (
            self.read(include_tombstones=True)
            .where(F.col("_deleted") & F.col("_outcome").isin("removed_wholesale", "removed_no_match"))
            .select("conv_id", "turn_idx", "role", "_outcome", "ts", "change_lsn")
        )

    def history(self) -> DataFrame:
        """Snapshot-chain metadata table (≙ Iceberg ``history``/
        ``snapshots``): one row per retained snapshot, from the immutable
        manifest files — driver-side metadata only, no data-file reads."""
        import re

        rows = []
        for fn in sorted(os.listdir(self._manifest_dir)):
            if not re.fullmatch(r"v\d{8}\.json", fn):
                continue
            s = _mf.load_snapshot(self._manifest_dir, int(fn[1:-5]))
            n_delta = sum(1 for x in s["files"] if x.get("kind", "base") == "delta")
            rows.append(
                (
                    s["snapshot_id"],
                    s["parent_id"],
                    float(s["committed_at"]),
                    s["schema_version"],
                    s["num_buckets"],
                    len(s["files"]),
                    n_delta,
                    len(s["applied_batches"]),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "snapshot_id int, parent_id int, committed_at double, schema_version int, "
            "num_buckets int, n_files int, n_delta_files int, n_batches_applied int",
        )

    def files(self, version: int | None = None) -> DataFrame:
        """Data-file metadata table for a snapshot (≙ Iceberg ``files``),
        including the stamped min/max stats where present."""
        snap = self.snapshot(version)
        rows = []
        for f in snap["files"] if snap else []:
            s = f.get("stats") or {}
            cid, ts = s.get("conv_id"), s.get("ts")
            rows.append(
                (
                    f["path"],
                    f["bucket"],
                    f.get("kind", "base"),
                    cid[0] if cid else None,
                    cid[1] if cid else None,
                    ts[0] if ts else None,
                    ts[1] if ts else None,
                    s.get("rows"),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "path string, bucket int, kind string, conv_id_min string, "
            "conv_id_max string, ts_min_us long, ts_max_us long, stats_rows long",
        )

    def lineage(self) -> DataFrame:
        """Per-batch lineage records from the manifest chain (≙ the
        _lineage table of SURVEY.md §7 item 7)."""
        snap = self.current_snapshot()
        rows = []
        if snap:
            for batch_id, rec in sorted(snap["applied_batches"].items()):
                rows.append(
                    (
                        batch_id,
                        rec["snapshot_id"],
                        rec["lsn_min"],
                        rec["lsn_max"],
                        rec["rows_upserted"],
                        rec["rows_deleted"],
                        rec["files_written"],
                        rec["buckets_touched"],
                    )
                )
        schema = (
            "batch_id string, snapshot_id int, lsn_min long, lsn_max long, "
            "rows_upserted long, rows_deleted long, files_written int, buckets_touched int"
        )
        return self.spark.createDataFrame(rows, schema)

    # ---------------- MERGE ----------------

    def is_applied(self, batch_id: str) -> bool:
        snap = self.current_snapshot()
        return bool(snap and batch_id in snap["applied_batches"])

    def merge(
        self,
        delta: DataFrame,
        batch_id: str,
        touched_buckets: list[int] | None = None,
        replace_buckets: bool = False,
        post_reduce=None,
        hot_buckets: list[int] | None = None,
        bucket_lsn_max: dict[int, int] | None = None,
        bucket_ts_range: dict[int, list[int]] | None = None,
        advance_watermarks: bool = True,
        mode: str = "cow",
        watermarks_override: dict[str, int] | None = None,
        publish: bool = True,
        collect_stats: bool = False,
        assume_reduced: bool = False,
    ) -> dict:
        """Exactly-once LWW MERGE of a prepared delta.

        ``delta`` must carry KEY + ORDER columns and ``_deleted``; any other
        columns are payload. Re-invoking with an already-applied batch_id is
        a no-op (idempotent replay). A crash before the snapshot commit
        leaves only unreferenced staging files — the rerun produces an
        identical result (deterministic content, fresh file names).

        ``mode="cow"`` (default): the touched buckets' existing rows join
        the LWW reduce and the buckets are rewritten wholly — read-optimal,
        write cost O(touched buckets).
        ``mode="mor"``: only the batch's own winners are written, as delta
        files resolved at read time — write cost O(batch). Exactly-once,
        watermark, and lineage semantics are identical in both modes.
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge mode {mode!r}")
        # Defensive inflate: current_snapshot() already inflates, but a
        # caller racing through merge_with_retry may hand us a raw on-disk
        # snapshot dict; inflation is idempotent either way.
        snap = _mf.inflate(self._manifest_dir, self.current_snapshot())
        if snap and batch_id in snap["applied_batches"]:
            return {"skipped": True, "batch_id": batch_id}

        t0 = time.time()

        # Touched buckets: either supplied by the caller (computed from a
        # cheap conv_id-only column scan of the raw batch — see
        # ReplayEngine.apply_batch), or derived here from the delta.
        if touched_buckets is None:
            touched_buckets = [
                r[0]
                for r in delta.select(bucket_expr(self.num_buckets).alias("b"))
                .distinct()
                .collect()
            ]
        touched = sorted(int(b) for b in touched_buckets)
        if not touched:
            return {"skipped": True, "batch_id": batch_id, "empty": True}

        # Delta stats are collected DURING the write action via an
        # Observation (one pass over the expensive dedup→LWW→refine plan —
        # no second job, no persist).
        obs = Observation(f"delta-{batch_id}")
        delta = delta.withColumn("_bucket", bucket_expr(self.num_buckets)).observe(
            obs,
            F.min("change_lsn").alias("lsn_min"),
            F.max("change_lsn").alias("lsn_max"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_deleted").cast("long")).alias("n_del"),
        )

        delta_schema = T.StructType([f for f in delta.schema.fields if f.name != "_bucket"])
        if snap:
            # Field-id schema merge: known names keep their id, new names
            # (incl. a re-added dropped name) get fresh ids — old bytes in
            # un-rewritten files stay invisible because reads resolve by id.
            cols, next_id, snap_files, schemas = self._upgraded(snap)
            new_cols, next_id = _merge_columns(cols, next_id, delta_schema)
            new_schema = _cols_to_schema(new_cols)
            new_sv = snap["schema_version"] + (1 if new_cols != cols else 0)
            if mode == "mor" and not replace_buckets:
                # merge-on-read: existing files are untouched (all carried);
                # the batch's winners land beside them as delta files.
                old_files, carried = [], snap_files
            else:
                # replace_buckets: the delta IS the new content of the touched
                # buckets (compaction/GC path) — don't union the old files.
                old_files = (
                    []
                    if replace_buckets
                    else [f for f in snap_files if f["bucket"] in set(touched)]
                )
                carried = [f for f in snap_files if f["bucket"] not in set(touched)]
        else:
            new_cols = _schema_to_cols(delta_schema)
            next_id = len(new_cols) + 1
            new_schema = _cols_to_schema(new_cols)
            new_sv, old_files, carried, schemas = 1, [], [], {}

        cols = [f.name for f in new_schema.fields]

        def _conform(df: DataFrame) -> DataFrame:
            have = set(df.columns)
            return df.select(
                *[
                    F.col(c) if c in have else F.lit(None).cast(dict_types[c]).alias(c)
                    for c in cols
                ]
            )

        dict_types = {f.name: f.dataType for f in new_schema.fields}
        sides = [_conform(delta)]
        if old_files:
            # era-aware: a renamed column's old physical name is resolved
            # by field id, then _conform pads columns the delta introduced
            sides.append(_conform(self._read_files(old_files, snap)))
        unioned = sides[0] if len(sides) == 1 else sides[0].unionByName(sides[1])

        # ONE exchange for the whole merge (guide §2.4 — two operations
        # keyed the same way share one exchange): the union is hash-
        # repartitioned into the target (_bucket, _salt) file layout FIRST,
        # and the LWW reduce then groups by (_bucket, _salt, conv_id,
        # turn_idx) — a grouping the repartition's HashPartitioning already
        # satisfies (partitioning exprs ⊆ grouping exprs), so Catalyst
        # plans a complete SortAggregate with NO second exchange. Both
        # extra grouping columns are functions of the key (bucket of
        # conv_id; salt of (conv_id, turn_idx)), so the winners are
        # identical to a plain per-key reduce. The previous shape —
        # aggregate-then-repartition — shuffled every batch twice (LWW
        # exchange + layout exchange); measured A/B in OPTIMIZATION_r06.md.
        # Skew note: this trades the map-side partial combine for one fewer
        # full-batch shuffle; a hot (conv_id, turn_idx) key's duplicates
        # now meet in one task, where the salt already spreads hot buckets
        # across 4 writers (the explicit hot-key splitting below).
        #
        # Hot buckets — detected by the caller from per-bucket delta
        # counts — get a turn-level salt so one hot bucket is reduced and
        # written by several tasks in parallel; cold buckets stay
        # one-file-per-bucket so later target reads don't pay a per-file
        # open cost 4× over. Explicit partition count (a bare
        # repartition(col) is AQE-rebalanced down to ~one partition at
        # small sizes, serializing the write).
        from ..operators.cdc import lww_resolve

        if hot_buckets:
            salt = F.when(
                F.col("_bucket").isin([int(b) for b in hot_buckets]),
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(4)),
            ).otherwise(F.lit(0))
        else:
            salt = F.lit(0)
        work = unioned.withColumn("_bucket", bucket_expr(self.num_buckets)).withColumn(
            "_salt", salt.cast("int")
        )
        n_out = max(self.spark.sparkContext.defaultParallelism, len(touched))
        work = work.repartition(n_out, F.col("_bucket"), F.col("_salt"))
        # assume_reduced: the caller guarantees ≤1 row per (conv_id,
        # turn_idx) — maintenance rewrites feed already-LWW-resolved
        # content, so re-reducing here would sort+aggregate the full
        # rewrite for identical winners (the old shape paid exactly that).
        # Grouping-key ORDER is chosen so the SortAggregate's output
        # ordering (_bucket, conv_id, turn_idx, _salt) has the file-layout
        # sort (_bucket, conv_id, turn_idx) as a prefix — the staged
        # write's sortWithinPartitions is then satisfied by the aggregate's
        # ordering and Catalyst elides the second full-batch SortExec
        # (guide §2.4: operations keyed the same way share work). Grouping
        # is a set, so winners are unchanged.
        merged = (
            work
            if assume_reduced
            else lww_resolve(work, key=("_bucket", *KEY, "_salt"), order=ORDER)
        )
        if post_reduce is not None:
            # the caller's post-reduce transform (guarded refinement +
            # display enrichment) over the winners — broadcast-joined
            # lookups preserve the established partitioning
            merged = post_reduce(merged)
        merged = merged.select(*cols, "_bucket")

        # Write staged data files.
        t_write = time.time()
        # File identity is claimed by a per-commit uuid token, never by the
        # snapshot version: two concurrent writers racing for snapshot_id+1
        # write into disjoint directories, so the loser (whose _commit raises
        # SnapshotConflict) can never clobber the winner's committed files —
        # its orphaned directory is swept by gc_orphans().
        token = uuid.uuid4().hex[:12]
        staging = os.path.join(self._staging_dir, token)
        staged_df = merged
        if SORT_WITHIN_FILES:
            # key-clustered files: a within-partition sort (no shuffle)
            # gives parquet row-group min/max stats on conv_id, so point
            # lookups skip row groups, and like-keyed rows compress better.
            # MUST lead with _bucket: the dynamic-partition writer requires
            # ordering by the partition column and would re-sort (unstably,
            # destroying the key order) if the child's ordering lacks it.
            staged_df = staged_df.sortWithinPartitions("_bucket", "conv_id", "turn_idx")
        (
            staged_df.write.option("maxRecordsPerFile", MAX_RECORDS_PER_FILE)
            .partitionBy("_bucket")
            .parquet(staging)
        )
        t_write = time.time() - t_write

        # Finalize: ONE directory rename publishes the whole commit's data
        # (cost independent of file count — no per-file move, no parquet
        # footer reads; row counts come from the in-flight Observation).
        # The manifest then references files at their nested final paths.
        t_files = time.time()
        new_version = (snap["snapshot_id"] + 1) if snap else 1
        commit_rel = f"data/c{token}"
        commit_dir = os.path.join(self.root, commit_rel)
        os.replace(staging, commit_dir)
        new_files = []
        for bdir in sorted(os.listdir(commit_dir)):
            if not bdir.startswith("_bucket="):
                continue
            b = int(bdir.split("=", 1)[1])
            # scandir: the size comes with the directory listing (one stat
            # the OS already did) — still zero per-file footer reads
            for ent in sorted(os.scandir(os.path.join(commit_dir, bdir)), key=lambda e: e.name):
                fn = ent.name
                if fn.endswith(".parquet"):
                    entry = {
                        "path": f"{commit_rel}/{bdir}/{fn}",
                        "bucket": b,
                        "sv": new_sv,
                        "bytes": ent.stat().st_size,
                    }
                    if mode == "mor" and not replace_buckets:
                        entry["kind"] = "delta"
                        # Ingest-path ts skipping with ZERO footer reads:
                        # the caller's pre-pass aggregation already knows
                        # each bucket's min/max event ts for this batch,
                        # a conservative superset of the LWW winners the
                        # delta file actually holds (refine/enrich never
                        # rewrite ts). Stamping it makes FRESH delta files
                        # read_since/sinceTs-prunable before any fold; the
                        # fold later replaces this with exact footer stats.
                        # conv_id is deliberately absent (missing per-column
                        # range ⇒ must-scan) — point lookups already prune
                        # by bucket hash.
                        if bucket_ts_range and b in bucket_ts_range:
                            entry["stats"] = {"ts": list(bucket_ts_range[b])}
                    if replace_buckets:
                        # maintenance rewrite (compaction / rebucket): same
                        # logical content in new files — change-feed readers
                        # skip these so a fold doesn't re-deliver the table
                        entry["rewrite"] = True
                    new_files.append(entry)
        if collect_stats:
            # Maintenance rewrites only (compact/fold): stamp per-file
            # min/max so reads can skip files. Deliberately NOT done on the
            # ingest hot path — see the STATS_COLS note at the top.
            # Footer reads are independent driver-side I/O — a small thread
            # pool overlaps them instead of paying one serial open+parse
            # per file (a big fold rewrites hundreds of files).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                stats_by_entry = list(
                    pool.map(
                        lambda e: file_column_stats(os.path.join(self.root, e["path"])),
                        new_files,
                    )
                )
            for entry, s in zip(new_files, stats_by_entry):
                if s is not None:
                    entry["stats"] = s
        t_files = time.time() - t_files

        stats = obs.get
        if stats["n"] == 0:
            # Nothing in the batch: no data files were produced; still
            # commit so the batch is recorded as applied (exactly-once).
            stats = {"lsn_min": -1, "lsn_max": -1, "n": 0, "n_del": 0}

        # Per-bucket high-watermarks: prefer the caller's true per-bucket
        # max(change_lsn) (the replay pre-pass computes it in the same agg
        # as the bucket counts); without it fall back to the batch-global
        # lsn_max, which overstates cold buckets but stays GC-safe because
        # batches commit in contiguous LSN order. Maintenance rewrites
        # (compaction) pass advance_watermarks=False: rewriting old content
        # applies no new events.
        # watermarks_override: the caller rewrites the whole mapping — used
        # by maintenance.rebucket, where old bucket ids stop meaning
        # anything and every new bucket inherits a conservative watermark.
        watermarks = (
            dict(watermarks_override)
            if watermarks_override is not None
            else (dict(snap["watermarks"]) if snap else {})
        )
        if stats["n"] and advance_watermarks and watermarks_override is None:
            for b in touched:
                applied_lsn = (
                    bucket_lsn_max.get(b, int(stats["lsn_max"]))
                    if bucket_lsn_max is not None
                    else int(stats["lsn_max"])
                )
                watermarks[str(b)] = max(int(watermarks.get(str(b), -1)), int(applied_lsn))

        applied = dict(snap["applied_batches"]) if snap else {}
        n_del = int(stats["n_del"] or 0)
        applied[batch_id] = {
            "snapshot_id": new_version,
            "lsn_min": int(stats["lsn_min"] if stats["lsn_min"] is not None else -1),
            "lsn_max": int(stats["lsn_max"] if stats["lsn_max"] is not None else -1),
            "rows_upserted": int(stats["n"]) - n_del,
            "rows_deleted": int(n_del),
            "files_written": len(new_files),
            "buckets_touched": len(touched),
            # rewrites re-count existing rows; live-row estimators skip them
            **({"rewrite": True} if replace_buckets else {}),
        }

        files_out = carried + new_files
        live_svs = {str(f["sv"]) for f in files_out if "sv" in f}
        manifest = {
            "format_version": FORMAT_VERSION,
            "snapshot_id": new_version,
            "parent_id": snap["snapshot_id"] if snap else None,
            "committed_at": time.time(),
            "schema": json.loads(new_schema.json()),
            "schema_version": new_sv,
            "columns": new_cols,
            "next_column_id": next_id,
            # era map bounded: only eras a live file still reads through
            "schemas": {
                **{sv: c for sv, c in schemas.items() if sv in live_svs},
                str(new_sv): new_cols,
            },
            "num_buckets": self.num_buckets,
            "files": files_out,
            "watermarks": watermarks,
            "applied_batches": applied,
            "dropped_columns": snap.get("dropped_columns", []) if snap else [],
        }
        # Segmented commit: only the buckets this commit touched get their
        # file segment rewritten; every other bucket's segment is carried
        # by path — metadata write cost O(touched), not O(all files). A
        # COW/replace commit changes exactly `touched`; MOR delta files
        # land inside `touched` too; a rebucket changes num_buckets, which
        # deflate detects and rewrites everything.
        changed = set(touched) | {int(f["bucket"]) for f in new_files}
        disk = _mf.deflate(self._manifest_dir, manifest, snap, changed)
        self._commit(disk, publish=publish)
        return {
            "skipped": False,
            "batch_id": batch_id,
            "staged": not publish,
            "snapshot_id": new_version,
            "seconds": time.time() - t0,
            "write_sec": round(t_write, 3),
            "finalize_sec": round(t_files, 3),
            **applied[batch_id],
        }
