"""Testdata contract guard.

Round 3 was lost to silent environment drift: the driver regenerated
`events.ts` from parquet TIMESTAMP(NANOS) to timestamp[us] between
rounds, and the repo's hard-coded ns shim broke 10 driver CORRECTNESS
rows with no local signal. This suite pins what the loader contract
actually is — for each sf and table, `t()` must load the table, and
`events.ts` must come back as a microsecond TimestampType whose epoch
values agree with what pyarrow reads off disk — so the next testdata
regeneration becomes one named local failure instead of a red round.

The pyarrow cross-check is deliberately dtype-agnostic: whether the
parquet is ns-as-long, timestamp[us], or tz-adjusted, both readers must
land on the same UTC epoch microseconds. Removing the dtype branch in
`base.t()` makes these tests fail loudly (DATATYPE_MISMATCH or value
skew), which is exactly the alarm round 3 was missing.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from anti_ddos_spark.queries.base import t

TESTDATA_ROOT = "/root/testdata"
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _sf_dirs():
    return [
        os.path.join(TESTDATA_ROOT, sf)
        for sf in SFS
        if os.path.isdir(os.path.join(TESTDATA_ROOT, sf))
    ]


def test_testdata_dirs_exist():
    assert _sf_dirs(), f"no testdata under {TESTDATA_ROOT}"


@pytest.mark.parametrize("sf_dir", _sf_dirs())
def test_all_tables_load(spark, sf_dir):
    """Every TESTDATA.md table loads through t() with >0 rows.

    Kept cheap: parquet footer metadata for counts, one t() resolution
    per table (catches schema-level breaks like the r3 DATATYPE_MISMATCH
    without a full scan).
    """
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            pytest.fail(f"missing table {path}")
        df = t(spark, sf_dir, name)
        # schema resolution alone surfaces analysis-time breaks; the
        # metadata count confirms the file is non-empty without a scan.
        assert df.schema is not None
        assert pq.ParquetFile(path).metadata.num_rows > 0, path


@pytest.mark.parametrize("sf_dir", _sf_dirs())
def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"t() must normalize events.ts to TimestampType, got "
        f"{ev.schema['ts'].dataType} (on-disk dtype drifted again?)"
    )


def test_events_ts_epoch_values_match_pyarrow(spark):
    """Pin actual values, not just the dtype, on the smallest sf.

    Spark (through t(), UTC session) and pyarrow must agree on epoch
    microseconds for the min/max/count of events.ts. This is the check
    that fails if a future regeneration flips units (ms vs µs vs ns) or
    if the NTZ→LTZ cast picks up a non-UTC session timezone.
    """
    sf_dir = os.path.join(TESTDATA_ROOT, "sf0.001")
    path = os.path.join(sf_dir, "events.parquet")
    col = pq.read_table(path, columns=["ts"]).column("ts")
    arrow_type = str(col.type)
    py_vals = col.to_pylist()
    # normalize the pyarrow side to epoch µs regardless of on-disk dtype
    if arrow_type.startswith("timestamp"):
        import datetime as dt

        def epoch_us(v):
            if v.tzinfo is None:
                v = v.replace(tzinfo=dt.timezone.utc)
            return round(v.timestamp() * 1_000_000)

        py_us = [epoch_us(v) for v in py_vals]
    else:  # ns-as-long generation
        py_us = [v // 1000 for v in py_vals]

    ev = t(spark, sf_dir, "events")
    row = ev.agg(
        F.count("ts").alias("n"),
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    assert row["n"] == len(py_us)
    assert row["lo"] == min(py_us), (
        f"epoch-µs min mismatch (parquet {arrow_type}): "
        f"spark={row['lo']} pyarrow={min(py_us)}"
    )
    assert row["hi"] == max(py_us)
