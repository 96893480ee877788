"""Manifest-versioned snapshot table: Iceberg-v1-style time travel on
plain parquet, zero table-format dependency.

The reference has no table-format story at all (its sinks are
JSON-through-pipes, ``index.js:30-41``); this module is the natural
completion of the repo's manifest-last family: token shards
(``tokenshards.py``) made single exports atomic, ``upsert.py`` made
batches last-write-wins — the snapshot table adds HISTORY. Layout:

    table/
      data/part-<uuid>.parquet      immutable, content-addressed-ish
      manifest-v1.json              file list + op + parent, committed
      manifest-v2.json              LAST via atomic rename
      ...

Semantics (the useful subset of Iceberg v1):

* **append** — new files, manifest = parent files + new files;
* **overwrite** — manifest = new files only (old files stay on disk,
  still referenced by older manifests: that IS time travel);
* **delete(predicate)** — COPY-ON-WRITE at file granularity: only
  files that actually contain matching rows are rewritten (read back
  filtered), untouched files carry over by reference. At 100 TB this
  is the whole point — deleting one customer's rows rewrites the few
  files that contain them, not the table;
* **read(version=None)** — latest (or AS-OF) manifest's file list fed
  to one ``spark.read.parquet(*files)``: plain columnar scan, full
  pushdown/pruning, no format shim in the read path.

Writer contract is the same as ``write_token_shards``: data files are
written first under uuid names (task retries/speculation leave
orphans that no manifest references — harmless), the manifest is
staged to a temp name and published with ``os.rename``, so readers
see either the old version or the new one, never a partial commit.
Rename-atomicity requires a local/NFS-like filesystem; on object
stores use the documented token-shard variant (write-temp +
manifest-only commit through a conditional PUT).

Readers resolve versions from the manifest chain alone — no lock
service, no listing of ``data/`` (so eventual-consistency on file
listing cannot corrupt a read).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"manifest-v{version}.json")


class SnapshotTable:
    """A versioned parquet table rooted at ``path``. Cheap handle:
    all state lives in the manifest files."""

    def __init__(self, path: str):
        self.path = path

    # -- version chain ------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            if name.startswith("manifest-v") and name.endswith(".json"):
                try:
                    out.append(int(name[len("manifest-v") : -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def manifest(self, version: int | None = None) -> dict:
        vs = self.versions()
        if not vs:
            raise ValueError(f"snapshot table {self.path} has no commits")
        v = max(vs) if version is None else int(version)
        if v not in vs:
            raise ValueError(
                f"snapshot version {v} does not exist (have {vs})"
            )
        with open(_manifest_path(self.path, v)) as f:
            m = json.load(f)
        if m.get("version") != v or "files" not in m:
            raise ValueError(f"corrupt manifest for version {v}")
        return m

    # -- commits ------------------------------------------------------

    def _file_stats(self, rel: str, cols: list[str]) -> dict:
        """Per-file [min, max] zonemap for ``cols``, folded across row
        groups from the parquet FOOTER (metadata-only: no data pages
        read). Values are JSON-serialized — numbers as-is, everything
        else (dates, timestamps, strings) via str(), which preserves
        ordering for the uniform formats parquet stats carry."""
        import pyarrow.parquet as _pq

        def ser(v):
            return v if isinstance(v, (int, float)) else str(v)

        md = _pq.ParquetFile(os.path.join(self.path, rel)).metadata
        out: dict = {}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                name = c.path_in_schema
                if name not in cols or c.statistics is None:
                    continue
                s = c.statistics
                if not s.has_min_max:
                    continue
                lo, hi = ser(s.min), ser(s.max)
                if name in out:
                    out[name] = [min(out[name][0], lo), max(out[name][1], hi)]
                else:
                    out[name] = [lo, hi]
        return out

    def _write_files(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> tuple[list[str], dict]:
        """Write df as immutable parquet files under data/, return
        their table-relative names plus per-file zonemaps for
        ``stats_cols``. Spark writes to a scratch subdir; files are
        then renamed under uuid names so a failed job never shadows
        committed data."""
        staging = os.path.join(self.path, f".stage-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        names = []
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            final = f"data/part-{uuid.uuid4().hex}.parquet"
            os.rename(
                os.path.join(staging, name),
                os.path.join(self.path, final),
            )
            names.append(final)
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)
        stats = (
            {rel: self._file_stats(rel, stats_cols) for rel in names}
            if stats_cols
            else {}
        )
        return names, stats

    def _publish(
        self,
        files: list[str],
        op: str,
        parent: int | None,
        stats: dict | None = None,
        schema_json: dict | None = None,
        deletes: list | None = None,
    ) -> int:
        version = (max(self.versions()) if self.versions() else 0) + 1
        # zonemaps travel with the file reference: carried-over files
        # keep their parent-manifest stats, rewritten files get fresh
        # ones, files never profiled simply have no entry (= no prune)
        merged = {}
        if parent:
            old = self.manifest(parent).get("stats", {})
            merged.update({f: old[f] for f in files if f in old})
        if stats:
            merged.update(stats)
        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "files": sorted(files),
            "stats": merged,
            # SCHEMA EVOLUTION: the commit's schema is table metadata
            # (Iceberg-style). Readers scan with THIS schema, so files
            # written before a column existed null-fill it at read
            # time — no mergeSchema footer sweep, no rewrite. Additive
            # evolution only (new nullable columns); type changes need
            # a rewrite commit.
            "schema": schema_json,
            # merge-on-read delete-vector sidecars (deletes/*.json);
            # readers anti-join them, compact() materializes them
            "deletes": list(deletes or []),
        }
        tmp = os.path.join(
            self.path, f".manifest-{uuid.uuid4().hex[:12]}.tmp"
        )
        with open(tmp, "w") as f:
            f.write(json.dumps(manifest, indent=1))
        os.rename(tmp, _manifest_path(self.path, version))
        return version

    def append(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> int:
        os.makedirs(self.path, exist_ok=True)
        vs = self.versions()
        parent = max(vs) if vs else None
        pm = self.manifest(parent) if parent else {}
        old = pm.get("files", [])
        new, stats = self._write_files(df, stats_cols)
        return self._publish(
            old + new, "append", parent, stats, df.schema.jsonValue(),
            pm.get("deletes"),
        )

    def overwrite(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> int:
        os.makedirs(self.path, exist_ok=True)
        vs = self.versions()
        parent = max(vs) if vs else None
        new, stats = self._write_files(df, stats_cols)
        return self._publish(
            new, "overwrite", parent, stats, df.schema.jsonValue()
        )

    def delete(
        self, spark: SparkSession, predicate: str, mode: str = "cow"
    ) -> int:
        """Delete rows matching ``predicate``.

        ``mode="cow"`` (copy-on-write): rewrite ONLY the files that
        contain matching rows; untouched files carry over by
        reference. One file = one membership probe (a pushed-down
        count), so the rewrite cost scales with affected data, not
        table size. Best when deletes are rare and reads are hot.

        ``mode="mor"`` (merge-on-read, Iceberg-v2-style positional
        deletes): write NO data files — matching row positions are
        captured per file (parquet ``_metadata.row_index``, stable
        for immutable files) into a delete-vector sidecar under
        ``deletes/``, and the manifest references it. The commit cost
        is one scan + a sidecar write; readers anti-join the delete
        vector (broadcast — vectors are match-sized). Best for
        frequent small deletes; ``compact()`` materializes pending
        vectors back into clean files. At 100 TB the sidecar becomes
        a roaring bitmap per file — the JSON form here keeps the
        same contract."""
        if mode == "mor":
            return self._delete_mor(spark, predicate)
        if mode != "cow":
            raise ValueError(f"delete mode {mode!r}")
        parent = max(self.versions())
        if self.manifest(parent).get("deletes"):
            # pending delete vectors: rewriting raw files would
            # RESURRECT mor-deleted rows — materialize via read()
            survivors = self.read(spark, parent).where(
                f"NOT ({predicate})"
            )
            new, stats = self._write_files(
                survivors, self._stats_cols(parent)
            )
            return self._publish(
                new, "delete", parent, stats,
                self.manifest(parent).get("schema"), [],
            )
        files = self.manifest(parent)["files"]
        keep, rewrite = [], []
        for rel in files:
            full = os.path.join(self.path, rel)
            hit = spark.read.parquet(full).where(predicate).limit(1).count()
            (rewrite if hit else keep).append(rel)
        new, stats = [], {}
        if rewrite:
            survivors = spark.read.parquet(
                *[os.path.join(self.path, r) for r in rewrite]
            ).where(f"NOT ({predicate})")
            if survivors.limit(1).count():
                new, stats = self._write_files(
                    survivors, self._stats_cols(parent)
                )
        return self._publish(
            keep + new, "delete", parent, stats,
            self.manifest(parent).get("schema"),
        )

    def _delete_mor(self, spark: SparkSession, predicate: str) -> int:
        from pyspark.sql import functions as F

        parent = max(self.versions())
        m = self.manifest(parent)
        # one scan over the CURRENT view (parent deletes applied, so
        # stacked vectors never double-capture a row) collecting
        # (file, position) pairs for matches
        hits = (
            self.read(spark, parent)
            .where(predicate)
            .select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("f"),
                F.col("_metadata.row_index").alias("i"),
            )
            .collect()
        )
        vec: dict = {}
        for r in hits:
            vec.setdefault(f"data/{r['f']}", []).append(int(r["i"]))
        for k in vec:
            vec[k].sort()
        os.makedirs(os.path.join(self.path, "deletes"), exist_ok=True)
        rel = f"deletes/del-{uuid.uuid4().hex}.json"
        with open(os.path.join(self.path, rel), "w") as f:
            f.write(json.dumps(vec))
        return self._publish(
            m["files"],
            "delete-mor",
            parent,
            None,
            m.get("schema"),
            list(m.get("deletes", [])) + [rel],
        )

    def compact(
        self, spark: SparkSession, target_files: int = 1
    ) -> int:
        """Maintenance commit: rewrite the CURRENT snapshot's file set
        into ``target_files`` larger files, content-identical. The
        small-file problem is the operational tax of frequent appends
        (every commit adds files; scans pay per-file open cost and
        tiny row groups defeat column-chunk compression) — compaction
        pays it back without touching history: older manifests still
        reference the original files. At 100 TB you compact per
        partition-bucket with a size target instead of a count."""
        parent = max(self.versions())
        cur = self.read(spark, parent)
        new, stats = self._write_files(
            cur.coalesce(max(1, int(target_files))),
            self._stats_cols(parent),
        )
        return self._publish(
            new, "compact", parent, stats,
            self.manifest(parent).get("schema"), [],
        )

    def _stats_cols(self, version: int) -> list[str]:
        """Columns the given version keeps zonemaps for — rewrites
        (delete/compact) re-profile the same columns so pruning
        survives maintenance."""
        stats = self.manifest(version).get("stats", {})
        return sorted({c for fstats in stats.values() for c in fstats})

    def vacuum(self, retain_last: int = 1) -> dict:
        """Expire history: keep the newest ``retain_last`` manifests,
        delete older ones, then remove every file under ``data/`` not
        referenced by a surviving manifest — including orphans from
        failed/speculative writer tasks that no manifest ever
        referenced (this is the ONE operation that lists ``data/``;
        reads never do). Irreversible by design: time travel beyond
        the retained window raises afterwards. The storage-cost
        counterpart of time travel — without it, every overwrite and
        compaction leaks its inputs forever."""
        if retain_last < 1:
            raise ValueError("vacuum must retain at least one version")
        vs = self.versions()
        keep = vs[-retain_last:]
        referenced = set()
        for v in keep:
            referenced.update(self.manifest(v)["files"])
        files_removed = 0
        data_dir = os.path.join(self.path, "data")
        if os.path.isdir(data_dir):
            for name in sorted(os.listdir(data_dir)):
                rel = f"data/{name}"
                if rel not in referenced:
                    os.remove(os.path.join(data_dir, name))
                    files_removed += 1
        referenced_dels = set()
        for v in keep:
            referenced_dels.update(self.manifest(v).get("deletes") or [])
        del_dir = os.path.join(self.path, "deletes")
        if os.path.isdir(del_dir):
            for name in sorted(os.listdir(del_dir)):
                rel = f"deletes/{name}"
                if rel not in referenced_dels:
                    os.remove(os.path.join(del_dir, name))
                    files_removed += 1
        manifests_removed = 0
        for v in vs:
            if v not in keep:
                os.remove(_manifest_path(self.path, v))
                manifests_removed += 1
        return {
            "files_removed": files_removed,
            "manifests_removed": manifests_removed,
            "retained_versions": keep,
        }

    # -- reads ---------------------------------------------------------

    def changes(
        self, spark: SparkSession, from_version: int, to_version: int
    ) -> DataFrame:
        """Incremental consumption: the rows APPENDED between two
        versions, read from only the files that joined the manifest —
        an incremental consumer (downstream sync, index refresh,
        training-data delta) never rescans the table. Cost scales
        with the delta, not table size: version resolution is a
        manifest diff, the scan touches new files only.

        Append-only contract: if any file was REMOVED across the span
        (a delete/overwrite/compact rewrote data), appended-file diff
        no longer equals the row delta and this raises — the consumer
        must fall back to a snapshot diff (functions/dq.snapshot_diff)
        for that span. Commit ``op`` fields make the check cheap."""
        if from_version >= to_version:
            raise ValueError("changes() needs from_version < to_version")
        old = set(self.manifest(from_version)["files"])
        new_m = self.manifest(to_version)["files"]
        removed = old - set(new_m)
        if removed:
            raise ValueError(
                f"non-append history between v{from_version} and "
                f"v{to_version}: {len(removed)} file(s) rewritten or "
                "removed; use a snapshot diff for this span"
            )
        added = [f for f in new_m if f not in old]
        if not added:
            return self.read(spark, to_version).limit(0)
        return spark.read.parquet(
            *[os.path.join(self.path, rel) for rel in added]
        )

    def scan_files(
        self,
        version: int | None = None,
        where: tuple | list | None = None,
    ) -> list[str]:
        """The file list a read would scan: manifest files minus those
        whose zonemap PROVES no row matches ``where`` (one or more
        (col, lo, hi) closed ranges; ``lo``/``hi`` may be None for
        half-open). Files without a zonemap for a referenced column
        are always kept — missing stats degrade to a full scan, never
        to a wrong answer. At 100 TB this is the point of carrying
        stats in the manifest: pruning is a driver-side pass over
        file metadata already in hand, not a listing + footer fetch
        per file."""
        m = self.manifest(version)
        conds = []
        if where:
            conds = [where] if isinstance(where, tuple) else list(where)
        stats = m.get("stats", {})

        def may_match(rel) -> bool:
            fstats = stats.get(rel, {})
            for col, lo, hi in conds:
                if col not in fstats:
                    continue
                fmin, fmax = fstats[col]
                # coerce bounds into the serialized domain (numbers
                # stay numbers; dates/timestamps compare as strings)
                if isinstance(fmin, str):
                    lo = None if lo is None else str(lo)
                    hi = None if hi is None else str(hi)
                if lo is not None and fmax < lo:
                    return False
                if hi is not None and fmin > hi:
                    return False
            return True

        return [rel for rel in m["files"] if may_match(rel)]

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: tuple | list | None = None,
    ) -> DataFrame:
        m = self.manifest(version)
        if not m["files"]:
            raise ValueError(f"version {m['version']} is empty")
        files = self.scan_files(version, where)
        reader = spark.read
        if m.get("schema"):
            from pyspark.sql.types import StructType

            # scan with the COMMIT's schema: files written before a
            # column existed null-fill it (additive schema evolution)
            reader = reader.schema(StructType.fromJson(m["schema"]))
        if not files:  # every file pruned: empty frame, right schema
            return reader.parquet(
                os.path.join(self.path, m["files"][0])
            ).limit(0)
        df = reader.parquet(
            *[os.path.join(self.path, rel) for rel in files]
        )
        # zonemaps prune FILES; the exact predicate still applies (and
        # pushes down into the surviving scans)
        conds = []
        if where:
            conds = [where] if isinstance(where, tuple) else list(where)
        from pyspark.sql import functions as F

        for col, lo, hi in conds:
            if lo is not None:
                df = df.where(F.col(col) >= lo)
            if hi is not None:
                df = df.where(F.col(col) <= hi)
        pairs = []
        for rel in m.get("deletes") or []:
            with open(os.path.join(self.path, rel)) as fh:
                vec = json.load(fh)
            for fname, idxs in vec.items():
                base = fname.rsplit("/", 1)[-1]
                pairs.extend((base, int(i)) for i in idxs)
        if pairs:
            # merge-on-read: anti-join the delete vectors on (file,
            # position). Vectors are match-sized and broadcast; at
            # 100 TB the JSON becomes a roaring bitmap per file with
            # the same join shape
            deldf = spark.createDataFrame(pairs, "f string, i bigint")
            df = (
                df.withColumn(
                    "__snap_f",
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ),
                )
                .withColumn("__snap_i", F.col("_metadata.row_index"))
                .join(
                    F.broadcast(deldf),
                    (F.col("__snap_f") == F.col("f"))
                    & (F.col("__snap_i") == F.col("i")),
                    "left_anti",
                )
                .drop("__snap_f", "__snap_i")
            )
        return df


# -- spec-surface adapters: the snapshot table as a pipeline node ----

from .base_source import PathSource  # noqa: E402
from ..operators.base import Sink  # noqa: E402


class SnapshotSource(PathSource):
    """Spec op ``{"op": "snapshot", "path": ..., "version": K,
    "where": [col, lo, hi]}`` — an AS-OF (or latest) read, optionally
    zonemap-pruned. ``where`` bounds use JSON scalars; null means
    half-open."""

    def __init__(self, path, version=None, where=None, **kwargs):
        super().__init__(path, **kwargs)
        self.version = version
        self.where = tuple(where) if where else None

    def _read(self, spark: SparkSession, path: str) -> DataFrame:
        return SnapshotTable(path).read(
            spark, version=self.version, where=self.where
        )


class SnapshotSink(Sink):
    """Spec op ``{"op": "snapshot_sink", "path": ..., "mode":
    "append"|"overwrite", "stats_cols": [...]}`` — a manifest commit.
    Every pipeline run is one atomic version; consumers time-travel
    or tail ``changes()`` between runs."""

    def __init__(self, path, mode="append", stats_cols=None, name=None):
        super().__init__(name)
        if mode not in ("append", "overwrite"):
            raise ValueError(f"snapshot_sink mode {mode!r}")
        self.path = path
        self.mode = mode
        self.stats_cols = list(stats_cols or []) or None

    def write(self, df: DataFrame, ctx) -> None:
        t = SnapshotTable(ctx.resolve_url(self.path))
        if self.mode == "append":
            t.append(df, stats_cols=self.stats_cols)
        else:
            t.overwrite(df, stats_cols=self.stats_cols)
