"""Versioned parquet snapshot tables — the sandbox stand-in for Iceberg.

The production design (SURVEY.md §1.1) keeps frontier/domains/url_seen in
Iceberg tables partitioned by ``bucket(N, host)`` and mutates them with
MERGE INTO; snapshots give time-travel for resume.  The Iceberg runtime jar
is not available offline, so this module provides the same *semantics* on
plain parquet:

- every logical table lives under ``<root>/<name>/v=<version>/`` (copy-on-
  write snapshots; a round's state change writes a new version)
- a ``manifest.json`` per table records committed versions + row counts, so
  a torn write (crash mid-round) is invisible: readers only see committed
  versions, which is exactly the Iceberg snapshot contract resume relies on
- reads default to the latest committed version; pass ``version=`` for
  time travel

Swap-in note: every call site goes through this module, so replacing it
with ``df.writeTo(name).overwritePartitions()`` / ``MERGE INTO`` is a local
change.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest handling ---------------------------------------------------
    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, name, "manifest.json")

    def _load_manifest(self, name: str) -> dict[str, Any]:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {"versions": []}

    def _store_manifest(self, name: str, manifest: dict[str, Any]) -> None:
        path = self._manifest_path(name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)  # atomic commit

    # -- public API ------------------------------------------------------
    def versions(self, name: str) -> list[int]:
        return [v["version"] for v in self._load_manifest(name)["versions"]]

    def latest_version(self, name: str) -> int | None:
        versions = self.versions(name)
        return max(versions) if versions else None

    def exists(self, name: str) -> bool:
        return bool(self.versions(name))

    def write(
        self,
        name: str,
        df: DataFrame,
        version: int | None = None,
        metrics: dict[str, Any] | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Write a new committed snapshot of `name`; returns the version."""
        latest = self.latest_version(name)
        if version is None:
            version = (latest if latest is not None else -1) + 1
        path = os.path.join(self.root, name, f"v={version}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        manifest = self._load_manifest(name)
        manifest["versions"] = [v for v in manifest["versions"] if v["version"] != version]
        manifest["versions"].append(
            {
                "version": version,
                "metrics": metrics or {},
                # per-partition lineage (north rule): one entry per written
                # data file with its row count, read from parquet footers —
                # metadata-only, no extra Spark job.  Resume/debug can see
                # exactly which partitions a snapshot carries.
                "lineage": self._partition_lineage(path),
            }
        )
        manifest["versions"].sort(key=lambda v: v["version"])
        self._store_manifest(name, manifest)
        return version

    @staticmethod
    def _partition_lineage(path: str) -> list[dict[str, Any]]:
        import pyarrow.parquet as pq

        lineage = []
        for root_dir, _dirs, files in os.walk(path):
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(root_dir, fname)
                try:
                    rows = pq.ParquetFile(fpath).metadata.num_rows
                except Exception:
                    rows = None
                lineage.append(
                    {"file": os.path.relpath(fpath, path), "rows": rows}
                )
        return lineage

    def append(self, name: str, df: DataFrame, metrics: dict[str, Any] | None = None) -> int:
        """Append-only tables (documents, checkpoints): each append is its own
        snapshot directory; reads union all committed versions."""
        return self.write(name, df, metrics=metrics)

    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        if version is None:
            version = self.latest_version(name)
        if version is None:
            raise FileNotFoundError(f"table {name} has no committed versions in {self.root}")
        return spark.read.parquet(os.path.join(self.root, name, f"v={version}"))

    def read_all(self, spark: SparkSession, name: str) -> DataFrame:
        """Union of all committed snapshots (for append-style tables)."""
        paths = [
            os.path.join(self.root, name, f"v={v}") for v in self.versions(name)
        ]
        if not paths:
            raise FileNotFoundError(f"table {name} has no committed versions in {self.root}")
        return spark.read.parquet(*paths)

    def expire_snapshots(
        self, name: str, keep_last: int = 2, protect: int | None = None
    ) -> list[int]:
        """Iceberg-style snapshot expiry (maintenance): drop all but the
        newest ``keep_last`` committed versions of a STATE table — manifest
        entries first (readers atomically stop seeing them), then the
        version directories.  Returns the expired versions.

        Without expiry a 10^5-round crawl accumulates one copy of
        frontier/domains per durable snapshot — at scale that is the
        biggest storage leak in the system.  ``keep_last`` must be ≥2: the
        driver's live DataFrames read from the last durable pin, which may
        be one version behind the commit that triggers expiry — and when
        the pin can be MORE than one commit behind (url_seen is durable-
        pinned only every compact_every rounds while commit() runs every
        checkpoint_every), the caller passes its pin version as
        ``protect``: that exact version survives regardless of keep_last,
        because a live plan still scans its files (Iceberg's ref/branch
        protection); intermediate commit-only snapshots between the pin
        and the newest have no readers and are expired normally.  Output
        tables (the corpus: documents/fetch_log) are append-only history
        and are never expired."""
        import shutil

        if keep_last < 2:
            raise ValueError("keep_last must be >= 2 (live reads may lag one"
                             " version behind the committing round)")
        manifest = self._load_manifest(name)
        versions = sorted(manifest["versions"], key=lambda v: v["version"])
        if len(versions) <= keep_last:
            return []
        cut = versions[:-keep_last]
        if protect is not None:
            cut = [v for v in cut if v["version"] != protect]
        if not cut:
            return []
        expired = [v["version"] for v in cut]
        manifest["versions"] = [
            v for v in versions if v["version"] not in set(expired)
        ]
        self._store_manifest(name, manifest)
        for v in expired:
            shutil.rmtree(
                os.path.join(self.root, name, f"v={v}"), ignore_errors=True
            )
        return expired

    def truncate_after(self, name: str, version: int) -> None:
        """Drop committed versions newer than `version` (resume discards
        appends made by a crashed run past its last snapshot)."""
        manifest = self._load_manifest(name)
        manifest["versions"] = [
            v for v in manifest["versions"] if v["version"] <= version
        ]
        self._store_manifest(name, manifest)

    def metrics(self, name: str) -> list[dict[str, Any]]:
        return self._load_manifest(name)["versions"]
