"""Versioned snapshot tables on plain parquet — table-format-lite.

The missing piece between the shard writer / partition upsert /
compaction tools and a reproducible training-data RELEASE is snapshot
isolation: readers must see a consistent file set while writers land
new data, every historical version must stay readable (time travel),
and a bad release must be revertible without rewriting data. Real
table formats do this with manifest files plus an atomically-swapped
pointer; the same design works on any filesystem with atomic rename —
no table-format dependency, which is the point for an engine that
ships against bare parquet.

Layout:

    root/
      data/v{N}-{token}/part-*.parquet   immutable data directories
      manifests/v{N}.json                file list + lineage per version
      _current                           pointer file: the live version

Invariants:
- data directories are immutable once a manifest references them
  (rollback and time travel are manifest-only operations — verified by
  inode stability in tests/test_versioned.py);
- the pointer flips with os.rename, which POSIX guarantees atomic, so
  a reader resolving ``_current`` sees the old or the new snapshot,
  never a torn state;
- writers are optimistic: ``commit(expected_version=...)`` re-checks
  the pointer immediately before the rename and raises
  ``CommitConflict`` when another writer landed first — retry with a
  fresh read, the losing writer's data directory is garbage, nothing
  is corrupted.

At 100 TB the manifest is KBs per version (file paths, not data), the
pointer is one rename, and every data write is the engine's normal
distributed parquet write — nothing here serializes through the
driver except the file LISTING of the just-written directory.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer published a version after this commit's base."""


class VersionedTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- pointer ------------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.root, "_current")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(os.path.join(self.root, "manifests")):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def _manifest(self, version: int) -> dict:
        path = os.path.join(self.root, "manifests", f"v{version}.json")
        with open(path) as f:
            return json.load(f)

    # -- write --------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        expected_version: int | None = None,
    ) -> int:
        """Publish ``df`` as the next version. ``mode='append'`` keeps
        the current snapshot's files and adds the new ones;
        ``'overwrite'`` starts the file list fresh. Optimistic
        concurrency: pass the version this commit was based on and the
        publish fails with CommitConflict if someone else landed
        first."""
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)
        base = self.current_version()
        if expected_version is not None and base != expected_version:
            raise CommitConflict(f"base moved: {expected_version} -> {base}")
        new_version = 0 if base is None else base + 1
        token = uuid.uuid4().hex[:8]
        rel_dir = os.path.join("data", f"v{new_version}-{token}")
        df.write.parquet(os.path.join(self.root, rel_dir))
        files = sorted(
            os.path.join(rel_dir, n)
            for n in os.listdir(os.path.join(self.root, rel_dir))
            if n.endswith(".parquet")
        )
        if mode == "append" and base is not None:
            files = self._manifest(base)["files"] + files
        manifest = {
            "version": new_version,
            "base": base,
            "mode": mode,
            "files": files,
        }
        mpath = os.path.join(self.root, "manifests", f"v{new_version}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        # last-moment conflict re-check, then the atomic pointer flip
        if self.current_version() != base:
            os.remove(mpath)
            raise CommitConflict("another writer published first")
        tmp = self._pointer() + f".tmp-{token}"
        with open(tmp, "w") as f:
            f.write(str(new_version))
        os.rename(tmp, self._pointer())
        return new_version

    def rollback(self, to_version: int) -> int:
        """Publish a NEW version whose file list is ``to_version``'s —
        history stays intact (a rollback is itself audit-visible), no
        data moves."""
        old = self._manifest(to_version)
        base = self.current_version()
        new_version = (base or 0) + 1
        manifest = {
            "version": new_version,
            "base": base,
            "mode": f"rollback:{to_version}",
            "files": old["files"],
        }
        mpath = os.path.join(self.root, "manifests", f"v{new_version}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = self._pointer() + ".tmp-rb"
        with open(tmp, "w") as f:
            f.write(str(new_version))
        os.rename(tmp, self._pointer())
        return new_version

    # -- read ---------------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Snapshot read: the file list is resolved from one manifest,
        so concurrent commits can't tear the scan. ``version=None``
        reads the live pointer (time travel: pass any older version)."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError("table has no committed version")
        files = [
            os.path.join(self.root, rel) for rel in self._manifest(v)["files"]
        ]
        return spark.read.parquet(*files)


def foreach_batch_committer(table: VersionedTable):
    """Exactly-once streaming sink: commit each micro-batch as a table
    version, idempotent on ``batchId``.

    Structured Streaming re-delivers a micro-batch after a failure with
    the SAME batchId; recording the id in the manifest and skipping
    already-committed ids turns at-least-once delivery into
    exactly-once table state — the standard transactional-sink contract
    (reference's undefined ``foreach_batch_function`` made idempotent,
    the same fix as sinks.py's NDJSON committer but with snapshot
    semantics: every micro-batch is a time-travelable version).
    Retries that lose a commit race re-check and skip, so a retried
    batch can never double-append.
    """

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        for v in reversed(table.versions()):
            m = table._manifest(v)
            bid = m.get("batch_id")
            if bid is not None and bid >= batch_id:
                return  # this batch (or a later one) already landed
        base = table.current_version()
        new_version = 0 if base is None else base + 1
        token = uuid.uuid4().hex[:8]
        rel_dir = os.path.join("data", f"v{new_version}-{token}")
        batch_df.write.parquet(os.path.join(table.root, rel_dir))
        files = sorted(
            os.path.join(rel_dir, n)
            for n in os.listdir(os.path.join(table.root, rel_dir))
            if n.endswith(".parquet")
        )
        if base is not None:
            files = table._manifest(base)["files"] + files
        manifest = {
            "version": new_version,
            "base": base,
            "mode": "append",
            "batch_id": batch_id,
            "files": files,
        }
        mpath = os.path.join(
            table.root, "manifests", f"v{new_version}.json"
        )
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        if table.current_version() != base:
            os.remove(mpath)  # lost a race; the retry will re-check
            return
        tmp = table._pointer() + f".tmp-{token}"
        with open(tmp, "w") as f:
            f.write(str(new_version))
        os.rename(tmp, table._pointer())

    return _commit
