"""Query registry plumbing shared by all query modules.

Each query is a (Spark callable, DuckDB oracle SQL) pair. The Spark side
is the engine's public surface; the SQL side is the independent oracle the
driver executes at sf=0.01 (row-count + schema + order-insensitive value
hash, columns sorted by name).

Numeric determinism policy (so Spark and DuckDB hash-match):

- prefer integer outputs (counts, int-cast stats — also what the
  reference emits, spark_app/main.py:54-138);
- double aggregates are rounded identically on both sides (2 dp for
  large money sums, 4-6 dp for ratios/stds) — observed cross-engine
  deviation is ≤1 ulp, so rounding is orders of magnitude safer than the
  boundary risk;
- timestamps cross the oracle boundary as epoch microseconds
  (`unix_micros` / `epoch_us`) to dodge ns-vs-µs parquet precision and
  timezone-rendering differences;
- division is always guarded (Spark 4 runs ANSI mode).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def rnd(c, n: int = 2):
    """Cross-engine-deterministic round-half-up.

    Spark's round() decimalizes via BigDecimal.valueOf (shortest decimal
    repr, HALF_UP) while DuckDB rounds the binary double — they disagree
    whenever the true value sits on an exact .5 decimal boundary (common
    for price*discount products). floor(x*10^n + 0.5)/10^n is the same
    IEEE arithmetic in both engines, so bitwise-equal inputs stay equal.
    """
    from pyspark.sql import functions as F

    p = 10**n
    return F.floor(c * p + F.lit(0.5)) / F.lit(float(p))


def sql_rnd(expr: str, n: int = 2) -> str:
    """DuckDB twin of rnd()."""
    p = 10**n
    return f"floor(({expr}) * {p} + 0.5) / {float(p)}"


@dataclass
class Query:
    """One oracle-checked engine query.

    ``sql`` is a static DuckDB oracle text. ``sql_fn`` is the dynamic
    variant for oracles that can only be derived at run time from
    fitted state (q122 compiles the trained RandomForest into nested
    CASE SQL — the text depends on the fitted model, so it cannot be a
    module constant). Queries with only ``sql_fn`` stay out of the
    driver registry (the driver contract ships static strings via
    ``__spark_entry__.oracle_sql``); tests/test_queries_oracle.py
    resolves them locally with the live session."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    sql_fn: Callable[[SparkSession, str], str] | None = None


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (parquet scan).

    `events.ts` has shipped as two different physical types across
    testdata generations: TIMESTAMP(NANOS) (which Spark 4 rejects unless
    read as long via the nanosAsLong legacy conf) and plain
    timestamp[us] (read as TIMESTAMP_NTZ). Branch on the dtype that
    actually loaded and normalize both to a microsecond TimestampType —
    the same value DuckDB produces for either encoding, so oracle
    comparisons line up regardless of which generation is on disk.

    SIDE EFFECT (documented per ADVICE r4): loading ``events`` sets
    ``spark.sql.session.timeZone=UTC`` and
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the *caller's*
    session, and every load disables
    ``spark.sql.constraintPropagation``; these persist after the call.
    All three are required for oracle hash stability on
    harness-supplied sessions (the driver's verify harness constructs
    its own session), so they are deliberately global rather than
    save/restored — a consumer embedding this module in a non-UTC
    session should load events through a dedicated session.
    """
    # The caller may hand us a session we didn't configure (the driver's
    # verify harness does). Constraint propagation must be off before any
    # plan containing the wide feature expressions meets a Filter, or the
    # optimizer spins for minutes (see session.py / PERF.md §2).
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # NTZ→LTZ cast goes through the session timezone; pin UTC here
        # (not only in session.py) so a harness-supplied session can't
        # shift epoch values under the unix_micros-based oracle hashes.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, LongType):
            # TIMESTAMP(NANOS) loaded as epoch-ns long: truncate to µs.
            return raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # timestamp[us] loads as TIMESTAMP or TIMESTAMP_NTZ; with the
        # UTC session the cast is an identity epoch mapping.
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def content_seed(col) -> "object":
    """Derandomization seed: the first 8 md5 hex digits of a column as a
    non-negative long — the ONE definition of the content-hash seed
    idiom (q38/q55/q89/q101/q102 family). Legacy inline copies predate
    this helper and are pinned by their own oracles; migrate them when
    touched."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# DuckDB whitespace-tokenizer fragment shared by the text-query modules
# (textops + its round-6 split modules); the ONE definition of "token" on
# the oracle side of the q31/q47/q52/q103... family.
_W = "string_split_regex(trim(text), '\\s+')"


def sql_seed(expr: str) -> str:
    """DuckDB twin of content_seed()."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"
