"""Table-maintenance operations a long-lived 100 TB corpus needs:
incremental partition refresh (upsert without a full rewrite) and
small-file compaction.

OSS Spark without a lakehouse layer has no MERGE; the scalable
equivalent for partition-aligned updates is DYNAMIC partition overwrite
(`spark.sql.sources.partitionOverwriteMode=dynamic`): writing in
overwrite mode replaces ONLY the partitions present in the incoming
frame and leaves every other partition's files untouched — so a nightly
refresh of one source touches 1/N of the table, not all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def upsert_partitions(
    updates: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Replace exactly the ``partition_col`` partitions present in
    ``updates``; all other partitions keep their existing files (proved
    by inode in tests/test_maintenance.py). The conf is scoped
    save/restore — dynamic overwrite is surprising as a session-wide
    default.

    The conf is set on the session that OWNS ``updates``, not the
    passed handle: inside foreachBatch the micro-batch DataFrame
    belongs to a cloned session, and setting the conf on the outer
    session would leave the write in static mode — wiping every
    partition not present in the batch (caught by
    tests/test_stream_upsert.py)."""
    owner = updates.sparkSession
    prev = owner.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    owner.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        owner.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitions(
    spark: SparkSession,
    path: str,
    dest: str,
    partition_col: str,
    target_rows_per_file: int,
) -> DataFrame:
    """Rewrite the table at ``path`` into ``dest`` with ⌈rows/target⌉
    files per partition — the small-file fix for a table that accreted
    tiny files from streaming or incremental writes. Writes to a new
    location (compact-and-swap): overwriting a path while scanning it is
    undefined in Spark, so the atomic rename/swap is the caller's final
    step. Returns the per-partition manifest (rows, files planned),
    MATERIALIZED before return — a lazy manifest would re-scan ``path``
    at first action, and the docstring's rename/swap may have moved it
    by then (driver-sized: one row per partition).

    Scale shape: ONE count aggregate (driver gets one row per
    partition), then one shuffle keyed by (partition, salt) where the
    salt fans each partition into exactly its file budget — balanced
    writes without a global sort or a fixed repartition(N) guess.
    """
    df = spark.read.parquet(path)
    counts = (
        df.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn(
            "n_files",
            F.ceil(F.col("n_rows") / F.lit(target_rows_per_file)).cast("int"),
        )
    )
    # null-safe join: Spark writes NULL partition values as
    # __HIVE_DEFAULT_PARTITION__ and they must survive compaction — an
    # inner equi-join would silently drop them (NULL != NULL).
    plan = counts.select(
        F.col(partition_col).alias("_pc"), F.col("n_files")
    )
    # salt from row CONTENT, not monotonically_increasing_id: a
    # recomputed map task must route every row to the same reduce
    # partition or a fetch-failure rerun duplicates/loses rows (the
    # SPARK-23207 class of bug). Map-typed columns are unhashable
    # (spark.sql.legacy.allowHashOnMapType) and are skipped.
    hashable = [
        f.name
        for f in df.schema.fields
        if "map<" not in f.dataType.simpleString()
    ]
    salt = (
        F.pmod(F.hash(*[F.col(c) for c in hashable]), F.col("n_files"))
        if hashable
        else F.lit(0)
    )
    salted = (
        df.join(
            F.broadcast(plan),
            F.col(partition_col).eqNullSafe(F.col("_pc")),
        )
        .drop("_pc")
        .withColumn("_salt", salt.cast("int"))
    )
    (
        salted.repartition(F.col(partition_col), F.col("_salt"))
        .drop("_salt", "n_files")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        # backstop for content-identical rows (they share one salt and
        # collapse into one reduce group): the writer still splits the
        # group at the target size, so the file budget degrades
        # gracefully instead of producing one giant file
        .option("maxRecordsPerFile", str(target_rows_per_file))
        .parquet(dest)
    )
    # sever the manifest from the source path before the caller swaps it
    return spark.createDataFrame(counts.collect(), counts.schema)


def apply_cdc(
    snapshot: "DataFrame",
    changes: "DataFrame",
    key: str,
    op_col: str = "op",
    broadcast_changes: bool = True,
    seq_col: str | None = None,
) -> "DataFrame":
    """Row-level MERGE semantics on plain parquet frames: apply a CDC
    change batch (op ∈ {'U','I','D'}) to a snapshot as
    ``(snapshot ANTI-JOIN change-keys) UNION upserts`` — update is
    delete+insert, so one anti-join on the key plus a union is the
    whole plan. With ``broadcast_changes`` (the normal regime: change
    batches are small next to the snapshot) the anti-join broadcasts
    the key set and the snapshot never shuffles — the property that
    makes incremental maintenance viable at 100 TB; flip it off when a
    backfill-sized batch should shuffle both sides instead.

    Column contract: ``changes`` carries the snapshot columns plus
    ``op_col``; 'D' rows only need the key populated. Rows whose op is
    not one of U/I/D (including null) are IGNORED entirely — they
    neither delete nor upsert. Without that guard a malformed op would
    fall through the upsert filter yet still anti-join its key out of
    the snapshot: an accidental delete.

    Multiple change rows per key: pass ``seq_col`` (a per-key-monotone
    change sequence — the shape every CDC log provides) and only the
    highest-sequence row per key is applied, so an ordered U-then-D
    batch deletes instead of resurrecting the update. Without
    ``seq_col`` the caller must pre-resolve to one row per key.

    Tie-break: the CDC contract is unique (key, seq), but a violating
    batch must not produce a DIFFERENT merge on each run (max_by on
    the sequence alone picks an arbitrary row when two rows tie). The
    ordering key is therefore (seq, op, xxhash64(payload)) — any tie
    resolves to the same row on every run and engine; rows identical
    in all three are interchangeable by construction. Map-typed
    payload columns are excluded from the hash (unhashable in Spark).
    """
    from pyspark.sql import functions as F

    ch = changes.filter(F.col(op_col).isin("U", "I", "D"))
    if seq_col is not None:
        payload = [c for c in ch.columns if c not in (key, seq_col)]
        hashable = [
            f.name
            for f in ch.schema.fields
            if f.name in payload
            and "map<" not in f.dataType.simpleString()
        ]
        order = F.struct(
            F.col(seq_col),
            F.col(op_col),
            F.xxhash64(*[F.col(c) for c in hashable])
            if hashable
            else F.lit(0),
        )
        ch = (
            ch.groupBy(key)
            .agg(F.max_by(F.struct(*payload), order).alias("_r"))
            .select(key, "_r.*")
        )
    keys = ch.select(key)
    if broadcast_changes:
        keys = F.broadcast(keys)
    upserts = ch.filter(F.col(op_col) != "D").drop(op_col)
    # additive schema evolution (round 11): a change batch may carry
    # columns the snapshot predates — null-fill the snapshot for them
    # (old rows never had a value) instead of silently dropping the
    # column, and null-fill upserts for snapshot columns the batch no
    # longer carries. Identical schemas reduce to the original select.
    aux = {op_col, seq_col} - {None}
    added = [
        f
        for f in upserts.schema.fields
        if f.name not in snapshot.columns and f.name not in aux
    ]
    snap = snapshot
    for f in added:
        snap = snap.withColumn(f.name, F.lit(None).cast(f.dataType))
    for f in snapshot.schema.fields:
        if f.name not in upserts.columns:
            upserts = upserts.withColumn(f.name, F.lit(None).cast(f.dataType))
    out_cols = list(snapshot.columns) + [f.name for f in added]
    return snap.join(keys, key, "left_anti").unionByName(
        upserts.select(*out_cols)
    )
