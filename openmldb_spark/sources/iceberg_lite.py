"""Iceberg-layout tables without the JVM runtime ("iceberg-lite").

The north star stores transcripts in Iceberg tables. The real
``iceberg-spark-runtime`` jar is a JVM artifact this sandbox cannot
obtain (no network — see ICEBERG.md for the probe log), so this module
implements the *table format contract* the engine relies on, in pure
Python over the same Spark reader/writer surfaces:

- **hadoop-catalog directory layout** (reference:
  docs/en/integration/offline_data_sources/iceberg.md):
  ``<table>/metadata/v<N>.metadata.json`` + ``version-hint.text`` +
  manifests, ``<table>/data/<commit>/part-*.parquet``.
- **snapshot isolation**: every append/overwrite commits a new
  snapshot whose manifest list points at immutable prior manifests
  (O(new files) metadata written per commit, like real Iceberg's
  manifest-list reuse — NOT a rewrite of the full file list).
- **atomic commits**: metadata is staged then published with a single
  ``os.replace`` of ``version-hint.text`` — a reader always resolves
  either the old or the new snapshot, never a torn one.
- **time travel**: ``read(spark, snapshot_id=...)`` plans any
  historical snapshot from its manifest list.
- **metadata-driven scan planning**: per-file row counts and
  per-column min/max harvested from parquet footers at commit time;
  ``scan_files(predicates=...)`` prunes files before Spark ever lists
  or opens them — on a 100 TB table the driver plans from KBs of
  manifest JSON instead of a filesystem listing.

Documented divergence from the Iceberg spec: manifests are JSON, not
Avro (no Avro library exists in this sandbox), and the catalog is the
path itself (hadoop catalog). The module's API mirrors what the engine
uses from real Iceberg (append / overwrite / snapshot read / pruned
scan); swapping in the real runtime is a conf change
(``iceberg_catalog_conf`` in io.py) — tests/test_iceberg_integration.py
exercises that path whenever a runtime jar is present.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["IcebergLiteTable", "CommitConflict"]

_HINT = "version-hint.text"


class CommitConflict(RuntimeError):
    """Another writer published a newer version between our snapshot
    read and our commit (optimistic concurrency, like Iceberg's)."""


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def _atomic_create(path: str, payload: str) -> None:
    """Exclusive-create publish (the hadoop catalog's commit protocol):
    stage under a unique name, then ``os.link`` into place — fails with
    FileExistsError if a concurrent writer already claimed the version,
    leaving the winner's file untouched."""
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)


def _file_stats(path: str, fields: list[T.StructField]) -> dict:
    """Per-file record count + per-column min/max from the parquet
    footer (what real Iceberg stores in manifest entries)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    lo: dict[str, object] = {}
    hi: dict[str, object] = {}
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            st = g.column(i).statistics
            if st is None or not st.has_min_max:
                continue
            c = names[i]
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                continue  # binary stats aren't comparable json
            lo[c] = mn if c not in lo or mn < lo[c] else lo[c]
            hi[c] = mx if c not in hi or mx > hi[c] else hi[c]

    def _js(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    return {
        "record_count": md.num_rows,
        "lower_bounds": {k: _js(v) for k, v in lo.items()},
        "upper_bounds": {k: _js(v) for k, v in hi.items()},
        "file_size_bytes": os.path.getsize(path),
    }


class IcebergLiteTable:
    def __init__(self, location: str):
        self.location = location.rstrip("/")
        self.meta_dir = f"{self.location}/metadata"

    # ---------------- catalog ----------------

    @classmethod
    def create(cls, location: str, schema: T.StructType,
               partition_by: list[str] | None = None,
               properties: dict[str, str] | None = None) -> "IcebergLiteTable":
        t = cls(location)
        if os.path.exists(f"{t.meta_dir}/{_HINT}"):
            raise FileExistsError(f"table already exists at {location}")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(f"{t.location}/data", exist_ok=True)
        meta = {
            "format-version": 2,
            "table-uuid": uuid.uuid4().hex,
            "location": t.location,
            "schema": json.loads(schema.json()),
            "partition-spec": list(partition_by or []),
            "properties": dict(properties or {}),
            "current-snapshot-id": None,
            "snapshots": [],
        }
        _atomic_write(f"{t.meta_dir}/v1.metadata.json", json.dumps(meta, indent=1))
        _atomic_write(f"{t.meta_dir}/{_HINT}", "1")
        return t

    @classmethod
    def load(cls, location: str) -> "IcebergLiteTable":
        t = cls(location)
        if not os.path.exists(f"{t.meta_dir}/{_HINT}"):
            raise FileNotFoundError(f"no iceberg-lite table at {location}")
        return t

    @classmethod
    def exists(cls, location: str) -> bool:
        return os.path.exists(f"{location.rstrip('/')}/metadata/{_HINT}")

    # ---------------- metadata ----------------

    def _version(self) -> int:
        # the hint is a fast path; scan forward past it so a writer
        # crash between metadata publish and hint update never hides a
        # committed version (HadoopTableOperations does the same)
        with open(f"{self.meta_dir}/{_HINT}") as f:
            v = int(f.read().strip())
        while os.path.exists(f"{self.meta_dir}/v{v + 1}.metadata.json"):
            v += 1
        return v

    def _meta(self, version: int | None = None) -> dict:
        v = self._version() if version is None else version
        with open(f"{self.meta_dir}/v{v}.metadata.json") as f:
            return json.load(f)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self._meta()["schema"])

    def snapshots(self) -> list[dict]:
        return self._meta()["snapshots"]

    def current_snapshot_id(self):
        return self._meta()["current-snapshot-id"]

    def _snapshot(self, meta: dict, snapshot_id=None) -> dict | None:
        sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        for s in meta["snapshots"]:
            if s["snapshot-id"] == sid:
                return s
        raise KeyError(f"unknown snapshot {snapshot_id}")

    # ---------------- write path ----------------

    def _commit(self, new_manifest_files: list[dict], operation: str) -> int:
        base_version = self._version()
        meta = self._meta(base_version)
        parent = self._snapshot(meta)
        sid = uuid.uuid4().int >> 65  # 63-bit snapshot id
        mf_name = f"manifest-{sid}.json"
        _atomic_write(f"{self.meta_dir}/{mf_name}",
                      json.dumps({"entries": new_manifest_files}, indent=1))
        prior = [] if operation == "overwrite" or parent is None \
            else list(parent["manifest-list"])
        snap = {
            "snapshot-id": sid,
            "parent-snapshot-id": parent["snapshot-id"] if parent else None,
            "timestamp-ms": int(time.time() * 1000),
            "operation": operation,
            "manifest-list": prior + [mf_name],
            "summary": {
                "added-data-files": len(new_manifest_files),
                "added-records": sum(e["record_count"] for e in new_manifest_files),
            },
        }
        meta["snapshots"].append(snap)
        meta["current-snapshot-id"] = sid
        new_version = base_version + 1
        # optimistic-concurrency publish: claiming v<N+1> is an
        # exclusive create, so a racing writer loses cleanly (its data
        # files are orphans, never referenced) and retries on a fresh
        # base — Iceberg's hadoop-catalog commit semantics
        try:
            _atomic_create(f"{self.meta_dir}/v{new_version}.metadata.json",
                           json.dumps(meta, indent=1))
        except FileExistsError as e:
            raise CommitConflict(
                f"version v{new_version} already published") from e
        # the hint is advisory (readers fall back to max vN present);
        # last-writer-wins replace is safe because the max version only
        # ever grows
        _atomic_write(f"{self.meta_dir}/{_HINT}", str(new_version))
        return sid

    def _write_data(self, df: DataFrame) -> list[dict]:
        schema = self.schema()
        names = [f.name for f in schema.fields]
        if [f.name for f in df.schema.fields] != names:
            df = df.select(*names)  # positional-safe: enforce order
        commit_dir = f"data/commit-{uuid.uuid4().hex}"
        out = f"{self.location}/{commit_dir}"
        df.write.mode("errorifexists").parquet(out)
        entries = []
        for fn in sorted(os.listdir(out)):
            if not fn.endswith(".parquet"):
                continue
            full = f"{out}/{fn}"
            entries.append({"path": f"{commit_dir}/{fn}",
                            **_file_stats(full, schema.fields)})
        return entries

    def append(self, df: DataFrame) -> int:
        """Commit ``df`` as a new snapshot on top of the current one."""
        return self._commit(self._write_data(df), "append")

    def overwrite(self, df: DataFrame) -> int:
        """Commit ``df`` as a snapshot replacing all prior data (prior
        snapshots stay readable via time travel)."""
        return self._commit(self._write_data(df), "overwrite")

    # ---------------- read path ----------------

    def scan_files(self, snapshot_id=None,
                   predicates: dict[str, tuple] | None = None) -> list[dict]:
        """Manifest entries for a snapshot, pruned by per-file column
        ranges. ``predicates`` maps column -> (lo, hi) (either side may
        be None); a file is kept unless its footer range proves no row
        can match — exactly Iceberg's scan planning, from metadata
        only."""
        meta = self._meta()
        snap = self._snapshot(meta, snapshot_id)
        if snap is None:
            return []
        entries: list[dict] = []
        for mf in snap["manifest-list"]:
            with open(f"{self.meta_dir}/{mf}") as f:
                entries.extend(json.load(f)["entries"])
        if not predicates:
            return entries
        kept = []
        for e in entries:
            drop = False
            for col, (lo, hi) in predicates.items():
                f_lo = e["lower_bounds"].get(col)
                f_hi = e["upper_bounds"].get(col)
                if f_lo is None or f_hi is None:
                    continue  # no stats → can't prune
                if (hi is not None and f_lo > hi) or (lo is not None and f_hi < lo):
                    drop = True
                    break
            if not drop:
                kept.append(e)
        return kept

    def read(self, spark: SparkSession, snapshot_id=None,
             predicates: dict[str, tuple] | None = None) -> DataFrame:
        """Plan a snapshot as a DataFrame from its (pruned) file list.
        Files are handed to the parquet reader explicitly — no
        directory listing, so concurrent writers never leak uncommitted
        files into a running scan."""
        files = self.scan_files(snapshot_id, predicates)
        schema = self.schema()
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[f"{self.location}/{e['path']}" for e in files])
