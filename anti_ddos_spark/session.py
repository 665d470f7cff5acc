"""SparkSession factory with scale-oriented defaults.

Mirrors (and fixes) the reference's session config
(`spark_app/main.py:994-1010`): AQE + partition coalescing + skew-join
handling, Arrow-backed Python exchange, Kryo, UTC session timezone.

Local test mode runs ``local[N]``; on a real cluster the same config block
applies — AQE re-plans shuffle partition counts at runtime so the static
``spark.sql.shuffle.partitions`` is only a ceiling for the first stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_conf() -> dict[str, str]:
    """State-store conf for production streaming state (>10M open flows).

    The default HDFS-backed provider keeps every live flow's state in
    executor heap; RocksDB moves it off-heap/on-disk with changelog
    checkpointing — bounded memory at any flow cardinality. Also the
    *required* provider for transformWithStateInPandas (streaming/
    stateful_tws.py). Mirrors the reference's HDFS state dir choice
    (spark_app/main.py:1000) upgraded to the scale-safe backend.

    Provider is read per-query at stream start, so this can be applied
    with spark.conf.set(...) on a live session (see use_rocksdb()) or
    passed as extra_conf to get_spark().
    """
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # changelog checkpointing ships per-batch deltas instead of
        # full SST uploads — the production default for large state
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def use_rocksdb(spark: SparkSession) -> None:
    """Switch subsequent streaming queries on this session to RocksDB."""
    for k, v in rocksdb_conf().items():
        spark.conf.set(k, v)


def get_spark(
    app_name: str = "anti_ddos_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults honour the driver environment variables:
    ``SPARK_GRAFT_CPUS`` (local parallelism) — falls back to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # Local mode: ~1 partition per core. On a cluster AQE coalesces
        # anyway, so this is a starting ceiling, not a hand-tuned constant.
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Catalyst constraint propagation is O(n²) semanticEquals over the
        # expression tree; with our 80+ wide higher-order array expressions
        # (features_array) a Filter above the feature projection makes the
        # optimizer spin for minutes (observed: foreachBatch micro-batch
        # planning never completing). Constraints only help infer
        # IsNotNull/join filters we already write explicitly.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # Deterministic numerics for the DuckDB oracle; Spark 4 default is
        # ANSI on — keep it, queries guard div-by-zero explicitly.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if os.environ.get("SPARK_GRAFT_ROCKSDB", "") not in ("", "0"):
        for k, v in rocksdb_conf().items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Register every parquet table under ``sf_dir`` as a temp view.

    Returns name → DataFrame. Table set matches TESTDATA.md.
    """
    import glob as _glob

    out = {}
    for path in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata table lazily (parquet scan, no view side-effect)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
