"""Versioned snapshot tables on plain parquet — table-format-lite.

The missing piece between the shard writer / partition upsert /
compaction tools and a reproducible training-data RELEASE is snapshot
isolation: readers must see a consistent file set while writers land
new data, every historical version must stay readable (time travel),
and a bad release must be revertible without rewriting data. Real
table formats do this with manifest files plus an atomically-swapped
pointer; the same design works on any filesystem with atomic rename
plus an advisory lock — no table-format dependency, which is the point
for an engine that ships against bare parquet.

Layout:

    root/
      data/d-{token}/part-*.parquet      immutable data directories
      manifests/v{N}.json                file list + lineage per version
      _current                           pointer file: the live version
      _lock                              flock target for the publish CS

Commit protocol (the data write is distributed and lock-free; only the
KB-sized publish step serializes):

1. write the batch's data directory (normal distributed parquet write);
2. under ``flock(_lock)``: re-read the pointer — if the base moved,
   release and either raise ``CommitConflict`` (plain commits) or
   rebase and retry (the streaming sink); allocate the next version as
   ``max(existing manifest numbers) + 1`` (orphans from crashed
   publishes are skipped, never reused), create the manifest with
   O_EXCL, and atomically rename the pointer.

Crash-safety invariants:

- a manifest without a pointer flip is an ORPHAN: off the committed
  chain (readers follow the pointer; idempotency walks ``base`` links
  from the pointer), so a batch whose publish crashed mid-way is
  re-committed on re-delivery rather than silently skipped;
- the lock is advisory flock, released by the OS if the holder dies;
- data directories are immutable once written (rollback and time
  travel are manifest-only — inode-stability proved in
  tests/test_versioned.py);
- a conflict loser removes only files it created itself.

For object stores without flock, swap ``_publish``'s critical section
for the store's conditional-put (CAS) primitive; everything else is
already rename/read-only.

At 100 TB the manifest is KBs per version (file paths, not data), the
pointer is one rename, and every data write is the engine's normal
distributed parquet write — nothing serializes through the driver
except the file LISTING of the just-written directory and the flocked
pointer flip.
"""

from __future__ import annotations

import fcntl
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

    # -- pointer / manifests -------------------------------------------

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

    def committed_chain(self) -> list[dict]:
        """Manifests on the LIVE chain (pointer → base links), newest
        first. Orphans from crashed publishes are excluded — they were
        never visible and must not suppress a retry."""
        out = []
        v = self.current_version()
        while v is not None:
            m = self._manifest(v)
            out.append(m)
            v = m["base"]
        return out

    def last_batch_id(self, app_id: str | None = None) -> int | None:
        """Highest streaming batch id on the committed chain — O(1):
        every manifest carries the running max. With ``app_id`` the
        lookup is per transactional writer identity (see the committers'
        ``txn_app_id``): batch ids are only monotonic WITHIN one
        streaming query, so two queries sharing a table — or one query
        whose checkpoint was reset (ids restart at 0) — must not share
        an idempotency counter, or commits get silently skipped."""
        v = self.current_version()
        if v is None:
            return None
        m = self._manifest(v)
        if app_id is None:
            return m.get("last_batch_id")
        return m.get("last_batch_ids", {}).get(app_id)

    # -- write ----------------------------------------------------------

    def _write_data_dir(self, df: DataFrame) -> list[str]:
        rel_dir = os.path.join("data", f"d-{uuid.uuid4().hex[:12]}")
        df.write.parquet(os.path.join(self.root, rel_dir))
        return sorted(
            os.path.join(rel_dir, n)
            for n in os.listdir(os.path.join(self.root, rel_dir))
            if n.endswith(".parquet")
        )

    def _publish(
        self,
        new_files: list[str],
        mode: str,
        base: int | None,
        batch_id: int | None = None,
        app_id: str | None = None,
        extra: dict | None = None,
    ) -> int:
        """The flocked critical section: verify the base is still live,
        allocate the next manifest number (O_EXCL create — never
        clobbers), flip the pointer. Raises CommitConflict if the base
        moved; the caller decides whether to rebase-and-retry.

        ``app_id`` scopes the batch-id idempotency counter to one
        transactional writer (manifest key ``last_batch_ids``); without
        it the legacy table-global ``last_batch_id`` is used. Both maps
        propagate through EVERY publish (plain commits, compact,
        rollback included) so a maintenance op can't amnesia the sink.
        ``extra`` keys merge into the manifest (the bucketed-CDC layout
        metadata rides here)."""
        lock_path = os.path.join(self.root, "_lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            live = self.current_version()
            if live != base:
                raise CommitConflict(f"base moved: {base} -> {live}")
            files = list(new_files)
            prev_last_bid = None
            prev_app_bids: dict = {}
            if base is not None:
                bm = self._manifest(base)
                prev_last_bid = bm.get("last_batch_id")
                prev_app_bids = dict(bm.get("last_batch_ids", {}))
                if mode == "append":
                    files = bm["files"] + files
            existing = self.versions()
            new_version = (existing[-1] + 1) if existing else 0
            manifest = {
                "version": new_version,
                "base": base,
                "mode": mode,
                "files": files,
            }
            if extra:
                manifest.update(extra)
            if app_id is not None and batch_id is not None:
                prev_app_bids[app_id] = max(
                    x for x in (batch_id, prev_app_bids.get(app_id))
                    if x is not None
                )
                batch_id_for_global = None
            else:
                batch_id_for_global = batch_id
            if prev_app_bids:
                manifest["last_batch_ids"] = prev_app_bids
            if batch_id_for_global is not None or prev_last_bid is not None:
                manifest["last_batch_id"] = max(
                    x
                    for x in (batch_id_for_global, prev_last_bid)
                    if x is not None
                )
            if batch_id is not None:
                manifest["batch_id"] = batch_id
            mpath = os.path.join(
                self.root, "manifests", f"v{new_version}.json"
            )
            # O_EXCL: a concurrent claim of the same number is impossible
            # under the lock, but never-clobber is cheap insurance
            fd = os.open(mpath, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
            tmp = self._pointer() + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                f.write(str(new_version))
            os.rename(tmp, self._pointer())
            return new_version

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        expected_version: int | None = None,
    ) -> int:
        """Publish ``df`` as the next version. ``mode='append'`` keeps
        the current snapshot's files and adds the new ones;
        ``'overwrite'`` starts the file list fresh. Optimistic
        concurrency: the publish fails with CommitConflict if another
        writer landed after this commit's base (always checked; pass
        ``expected_version`` to pin an even earlier base read)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)
        base = self.current_version()
        if expected_version is not None and base != expected_version:
            raise CommitConflict(f"base moved: {expected_version} -> {base}")
        new_files = self._write_data_dir(df)
        try:
            return self._publish(new_files, mode, base)
        except CommitConflict:
            _remove_data_dir(self, new_files)
            raise

    def rollback(self, to_version: int) -> int:
        """Publish a NEW version whose file list is ``to_version``'s —
        history stays intact (a rollback is itself audit-visible), no
        data moves."""
        old_files = self._manifest(to_version)["files"]
        base = self.current_version()
        return self._publish(old_files, f"rollback:{to_version}", base)

    # -- read -----------------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Snapshot read: the file list is resolved from one manifest,
        so concurrent commits can't tear the scan. ``version=None``
        reads the live pointer (time travel: pass any older version)."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError("table has no committed version")
        m = self._manifest(v)
        files = [os.path.join(self.root, rel) for rel in m["files"]]
        if not files:
            # a CDC batch that deleted every remaining row publishes an
            # empty file list (partitionBy writes no files for an empty
            # frame — SPARK-23271's schema-bearing empty file only
            # covers unpartitioned writes). The snapshot is a valid,
            # EMPTY table; serve it from the schema the committer
            # recorded rather than handing zero paths to the reader.
            sch = m.get("schema")
            if sch is None:
                raise FileNotFoundError(
                    f"version {v} has no files and no recorded schema"
                )
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType.fromJson(sch))
        return spark.read.parquet(*files)


def _remove_data_dir(table: VersionedTable, new_files: list[str]) -> None:
    """Conflict-loser cleanup: remove the data directory behind a file
    list that will never be published (the module invariant: a loser
    removes only files it created itself)."""
    import shutil

    if new_files:
        rel_dir = os.path.dirname(new_files[0])
        shutil.rmtree(os.path.join(table.root, rel_dir), ignore_errors=True)


def _retrying_publish(
    table: VersionedTable,
    batch_id: int,
    build_files,
    mode: str,
    max_retries: int,
    app_id: str | None = None,
) -> None:
    """The ONE definition of the exactly-once sink scaffold shared by
    foreach_batch_committer and streaming_cdc_committer: O(1) chain
    idempotency on the monotonic batch id (scoped to ``app_id`` when
    the caller declared a writer identity — see last_batch_id),
    rebase-and-retry on a lost publish race (``build_files(base)``
    re-runs against the NEW base, so a concurrent writer's rows are
    never clobbered), loser data dirs removed, and the error
    propagated — never swallowed — once retries are exhausted, so the
    engine fails the batch and re-delivers it.

    ``build_files(base)`` returns ``(files, extra_manifest_keys,
    created_rel_dir)``: the file list may CARRY FORWARD committed files
    from the base (the bucketed CDC layout does), so conflict cleanup
    deletes exactly ``created_rel_dir`` — never a directory derived
    from the file list, which could belong to live data."""
    last = table.last_batch_id(app_id)
    if last is not None and last >= batch_id:
        return  # this batch (or a later one) is already on the chain
    for _ in range(max_retries):
        base = table.current_version()
        new_files, extra, created_dir = build_files(base)
        try:
            table._publish(
                new_files, mode, base,
                batch_id=batch_id, app_id=app_id, extra=extra,
            )
            return
        except CommitConflict:
            if created_dir is not None:
                import shutil

                shutil.rmtree(
                    os.path.join(table.root, created_dir),
                    ignore_errors=True,
                )
            # someone else published; if it was a racing retry of this
            # very batch, the chain now covers batch_id
            last = table.last_batch_id(app_id)
            if last is not None and last >= batch_id:
                return
    raise CommitConflict(
        f"batch {batch_id}: lost the publish race {max_retries} times"
    )


def foreach_batch_committer(
    table: VersionedTable,
    max_retries: int = 5,
    txn_app_id: str | None = None,
):
    """Exactly-once streaming sink: commit each micro-batch as a table
    version, idempotent on ``batchId``.

    Structured Streaming re-delivers a micro-batch after a failure with
    the SAME batchId; batch ids are monotonic per query, so the check
    is O(1): skip iff the COMMITTED chain's running ``last_batch_id``
    already covers this id. Orphan manifests from a crash between
    manifest write and pointer flip are off the chain and do NOT
    suppress the retry — the re-delivered batch commits again (the
    reference's undefined ``foreach_batch_function``, made a real
    transactional sink). Scaffold shared with streaming_cdc_committer
    via _retrying_publish (one definition of the retry semantics).

    Batch ids are monotonic only WITHIN one streaming query's
    checkpoint lineage. Pass ``txn_app_id`` (e.g. the checkpoint path
    or a stable query name) when more than one query writes the table,
    or when a checkpoint may be reset — each identity then keeps its
    own idempotency counter in the manifest (the (appId, version) txn
    key real table formats use). Without it, one table supports
    exactly one streaming query with a stable checkpoint.
    """

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        def build(base):
            files = table._write_data_dir(batch_df)
            created = os.path.dirname(files[0]) if files else None
            return files, None, created

        _retrying_publish(
            table, batch_id, build, "append", max_retries,
            app_id=txn_app_id,
        )

    return _commit


def _bucketed_data_dir(table: VersionedTable, df: DataFrame) -> tuple:
    """Write ``df`` (which carries a ``_bucket`` column) partitioned by
    bucket under one immutable data dir; return
    ``({bucket: [rel files]}, rel_dir)``. The bucket value lives in the
    directory name only — the parquet files hold the payload columns,
    so a pruned snapshot read of the leaf files needs no basePath
    gymnastics."""
    rel_dir = os.path.join("data", f"d-{uuid.uuid4().hex[:12]}")
    full = os.path.join(table.root, rel_dir)
    df.write.partitionBy("_bucket").parquet(full)
    out: dict[str, list[str]] = {}
    for sub in sorted(os.listdir(full)):
        if not sub.startswith("_bucket="):
            continue
        b = sub.split("=", 1)[1]
        out[b] = sorted(
            os.path.join(rel_dir, sub, n)
            for n in os.listdir(os.path.join(full, sub))
            if n.endswith(".parquet")
        )
    return out, rel_dir


def streaming_cdc_committer(
    table: VersionedTable,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
    max_retries: int = 5,
    n_buckets: int = 16,
    txn_app_id: str | None = None,
):
    """Transactional streaming MERGE with a BOUNDED rewrite: each
    micro-batch of CDC rows (op ∈ {'U','I','D'}, see
    sources/maintenance.apply_cdc) merges into the table's live
    snapshot and publishes as a new version — exactly-once via the
    same chain-walked ``batchId`` idempotency as
    ``foreach_batch_committer`` (scope it with ``txn_app_id`` when the
    table outlives one checkpoint lineage), conflict-rebased the same
    way (a lost race re-reads the NEW base snapshot and re-merges, so
    a concurrent writer's rows are never clobbered).

    The table's data is laid out in ``n_buckets`` key-hash buckets
    (``pmod(xxhash64(key), n_buckets)`` — deterministic across runs and
    sessions), recorded per-version in the manifest's ``bucket_files``
    map. Each micro-batch:

    1. computes the set of buckets its keys touch (bounded collect,
       ≤ n_buckets values);
    2. reads ONLY those buckets' files from the base manifest —
       untouched buckets are never scanned;
    3. ``apply_cdc``-merges the batch into that pruned slice;
    4. writes the merged slice partitioned by bucket and publishes a
       manifest that CARRIES FORWARD the untouched buckets' file
       entries verbatim (their files keep their inodes — proved in
       tests/test_versioned.py).

    Per-batch cost is therefore O(touched buckets' data + batch), not
    O(table): at 100 TB with 1024 buckets a key-local batch rewrites
    ~0.1 % of the table instead of all of it. Every version is still a
    complete time-travelable snapshot (the manifest's flat ``files``
    list is carried + new). A base version without bucket metadata
    (a plain commit, a compact, or a different ``n_buckets``) is
    handled by one full-table re-bucketing merge, after which pruning
    resumes — so the committer composes with the other lifecycle ops
    instead of corrupting on them.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from anti_ddos_spark.sources.maintenance import apply_cdc

    def _bucket_of(col):
        return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        drop = [op_col] + ([seq_col] if seq_col else [])
        valid = batch_df.filter(F.col(op_col).isin("U", "I", "D"))

        def build_files(base):
            base_buckets: dict[str, list[str]] = {}
            if base is not None:
                bm = table._manifest(base)
                if bm.get("n_buckets") == n_buckets:
                    base_buckets = bm.get("bucket_files", {})
            if base is None:
                snapshot = batch_df.drop(*drop).limit(0)
                carried: dict[str, list[str]] = {}
            elif base_buckets:
                touched = {
                    str(r[0])
                    for r in valid.select(
                        _bucket_of(F.col(key)).alias("b")
                    ).distinct().collect()
                }
                pruned = [
                    os.path.join(table.root, rel)
                    for b in sorted(touched)
                    for rel in base_buckets.get(b, [])
                ]
                snapshot = (
                    spark.read.parquet(*pruned)
                    if pruned
                    else batch_df.drop(*drop).limit(0)
                )
                carried = {
                    b: fs
                    for b, fs in base_buckets.items()
                    if b not in touched
                }
            else:
                # unbucketed base (plain commit / compact / resized):
                # one full merge re-establishes the bucket layout
                snapshot = table.read(spark, version=base)
                carried = {}
            # one hash exchange on the bucket id so every bucket's rows
            # land in one task → ONE file per touched bucket per version
            # (without it each bucket dir gets shuffle_partitions-many
            # tiny files and the table accretes 30x the file count;
            # row→partition routing is a pure function of the bucket
            # value, so a fetch-failure rerun is stable — SPARK-23207)
            merged = (
                apply_cdc(
                    snapshot, batch_df, key, op_col=op_col, seq_col=seq_col
                )
                .withColumn("_bucket", _bucket_of(F.col(key)))
                .repartition(F.col("_bucket"))
            )
            new_buckets, created_dir = _bucketed_data_dir(table, merged)
            bucket_files = {**carried, **new_buckets}
            files = [
                f for b in sorted(bucket_files) for f in bucket_files[b]
            ]
            extra = {
                "bucket_files": bucket_files,
                "n_buckets": n_buckets,
                # recorded so a delete-everything batch (files=[]) stays
                # readable as an empty snapshot — see VersionedTable.read
                "schema": StructType(
                    [f for f in merged.schema.fields if f.name != "_bucket"]
                ).jsonValue(),
            }
            return files, extra, created_dir

        _retrying_publish(
            table, batch_id, build_files, "overwrite", max_retries,
            app_id=txn_app_id,
        )

    return _apply


def compact(
    table: VersionedTable,
    spark: SparkSession,
    n_files: int = 8,
    zorder_cols: list | None = None,
    zorder_bits: int = 16,
) -> int:
    """Small-file compaction as a VERSION: read the live snapshot,
    rewrite it as ``n_files`` files, publish with ``overwrite`` — the
    same flocked protocol as any commit, so readers of older versions
    keep their (untouched) files and a concurrent writer turns this
    into a clean CommitConflict instead of lost data. Streaming appends
    (one small directory per micro-batch) make this the table's
    standing maintenance job.

    ``zorder_cols`` makes this OPTIMIZE-ZORDER as a time-travelable
    lifecycle op: the rewrite range-partitions and locally sorts on the
    Morton code of the given columns (sources/layout.zorder_expr — one
    range exchange, codegen-only row path), so the compacted version's
    parquet footers prune selective filters on EVERY interleaved
    column while older versions' files stay untouched (inode-proved in
    tests/test_zorder.py). Note: either compaction publishes an
    UNBUCKETED manifest — a subsequent streaming CDC batch re-buckets
    with one full merge, then resumes pruned rewrites."""
    base = table.current_version()
    df = table.read(spark, version=base)
    if zorder_cols:
        from anti_ddos_spark.sources.layout import zorder_expr

        df = (
            df.withColumn("_z", zorder_expr(zorder_cols, bits=zorder_bits))
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        mode = "compact:zorder"
    else:
        df = df.coalesce(n_files)
        mode = "compact"
    new_files = table._write_data_dir(df)
    try:
        return table._publish(new_files, mode, base)
    except CommitConflict:
        _remove_data_dir(table, new_files)
        raise


def vacuum(
    table: VersionedTable,
    keep_versions: int = 2,
    min_age_s: float = 3600.0,
) -> dict:
    """Retention GC — the lifecycle op without which versions
    accumulate forever. Keeps the newest ``keep_versions`` manifests of
    the COMMITTED chain (time travel keeps working inside the retention
    window), then deletes (a) expired/orphaned manifests and (b) every
    data directory that no retained manifest references AND whose
    mtime is older than ``min_age_s``.

    The age gate is load-bearing, not politeness: data writes are
    deliberately lock-free (a commit writes its directory BEFORE
    taking the publish lock), so a freshly written unreferenced dir
    may belong to an in-flight commit — deleting it would publish a
    manifest over missing files. ``min_age_s`` must exceed the longest
    plausible write-to-publish window (the same reason real table
    formats gate VACUUM on file age); tests pass 0 deliberately.

    Crash ordering: the oldest retained manifest is re-rooted FIRST
    (tmp + atomic rename, so a torn write can't truncate a live
    manifest) and expired manifests are removed after — a crash at any
    point leaves a walkable chain. A table with no committed version
    is a no-op (a fresh table's first in-flight commit is
    indistinguishable from garbage). Runs under the publish lock so
    the chain can't advance mid-scan; returns deletion counts for the
    caller's audit log."""
    import shutil
    import time

    lock_path = os.path.join(table.root, "_lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if table.current_version() is None:
            return {"dropped_manifests": 0, "dropped_data_dirs": 0}
        chain = table.committed_chain()
        keep = chain[: max(1, keep_versions)]
        keep_numbers = {m["version"] for m in keep}
        keep_dirs = set()
        for m in keep:
            for rel in m["files"]:
                keep_dirs.add(rel.split(os.sep)[1])
        # re-root FIRST (atomically), so the chain stays walkable no
        # matter where a crash lands
        oldest = keep[-1]
        if oldest["base"] is not None and oldest["base"] not in keep_numbers:
            rooted = {**oldest, "base": None}
            mpath = os.path.join(
                table.root, "manifests", f"v{rooted['version']}.json"
            )
            tmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(rooted, f)
            os.rename(tmp, mpath)
        dropped_manifests = 0
        for v in table.versions():
            if v not in keep_numbers:
                os.remove(
                    os.path.join(table.root, "manifests", f"v{v}.json")
                )
                dropped_manifests += 1
        dropped_dirs = 0
        now = time.time()
        data_root = os.path.join(table.root, "data")
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if d in keep_dirs:
                continue
            if now - os.path.getmtime(full) < min_age_s:
                continue  # possibly an in-flight commit's unpublished dir
            shutil.rmtree(full)
            dropped_dirs += 1
        return {
            "dropped_manifests": dropped_manifests,
            "dropped_data_dirs": dropped_dirs,
        }
