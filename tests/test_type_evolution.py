"""Schema evolution under a TYPE change (round-12 verdict task #4).

The additive path (new columns) was pinned in round 11; this suite
defines the remaining behavior: a column whose type changes either
widens LOSSLESSLY (byte→short→int→long, float→double,
byte/short/int/float→double — the chain records the WIDER type and
every generation's files stay readable under the pinned recorded
schema, verified against Spark's parquet reader) or the commit fails
BEFORE any file is staged with SchemaEvolutionConflict naming
(column, recorded type, batch type). mergeSchema cannot read a widened
chain (parquet footer merge rejects int vs long), which is exactly why
every direct file read routes through the recorded-schema pin.

Round 13 (verdict tasks #4/#5) closes the lattice for PARAMETRIC
types — array elements, map keys/values and same-shape struct fields
widen recursively through the same probed edges; reshapes and
non-lossless element edges still refuse — and pins the MOR delta
stack's per-version reads to the chain-recorded `delta_schema`."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.sources.cdf import version_changes
from anti_ddos_spark.sources.versioned import (
    SchemaEvolutionConflict,
    VersionedTable,
    streaming_cdc_committer,
)

NARROW = "k long, v int, op string, seq long"
WIDE = "k long, v long, op string, seq long"
BIG = 2**40  # does not fit an int32 — proves the widened read is real


def _seed(spark, root: str, merge_on_read: bool = False):
    t = VersionedTable(root)
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=merge_on_read
    )
    sink(
        spark.createDataFrame(
            [(i, i * 10, "I", i) for i in range(10)], NARROW
        ),
        0,
    )
    return t, sink


def test_lossless_widening_commits_and_reads(spark, tmp_path):
    t, sink = _seed(spark, str(tmp_path / "tbl"))
    assert t.read(spark).schema["v"].dataType.simpleString() == "int"

    # widen: a long batch with a value an int32 cannot hold
    sink(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 1)
    snap = t.read(spark)
    assert snap.schema["v"].dataType.simpleString() == "bigint"
    rows = {r["k"]: r["v"] for r in snap.collect()}
    assert rows[3] == BIG and rows[0] == 0 and len(rows) == 10

    # a narrow (int) batch AFTER the widening must not shrink the type
    sink(spark.createDataFrame([(5, 55, "U", 200)], NARROW), 2)
    snap = t.read(spark)
    assert snap.schema["v"].dataType.simpleString() == "bigint"
    rows = {r["k"]: r["v"] for r in snap.collect()}
    assert rows[3] == BIG and rows[5] == 55

    # point lookup spans pre- and post-widening buckets
    got = {r["k"]: r["v"] for r in t.read_point(spark, [3, 0]).collect()}
    assert got == {3: BIG, 0: 0}

    # time travel: the pre-widening version keeps its own narrow type
    assert (
        t.read(spark, version=0).schema["v"].dataType.simpleString()
        == "int"
    )


def test_conflicting_type_fails_loudly_with_no_version(spark, tmp_path):
    t, sink = _seed(spark, str(tmp_path / "tbl"))
    v_before = t.current_version()
    with pytest.raises(SchemaEvolutionConflict) as ei:
        sink(
            spark.createDataFrame(
                [(3, "oops", "U", 100)],
                "k long, v string, op string, seq long",
            ),
            1,
        )
    msg = str(ei.value)
    assert "'v'" in msg and "int" in msg and "string" in msg
    assert ei.value.column == "v"
    # nothing was published and the table still reads
    assert t.current_version() == v_before
    assert t.read(spark).count() == 10

    # long→int is NARROWING, not widening: also a conflict
    t2, sink2 = _seed(spark, str(tmp_path / "tbl2"))
    sink2(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 1)
    with pytest.raises(SchemaEvolutionConflict):
        # chain now records long for v; a DOUBLE batch would lose
        # integers past 2^53 — refused
        sink2(
            spark.createDataFrame(
                [(5, 1.5, "U", 200)],
                "k long, v double, op string, seq long",
            ),
            2,
        )


def test_cdf_replays_across_a_widening(spark, tmp_path):
    t, sink = _seed(spark, str(tmp_path / "tbl"))
    sink(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 1)
    sink(spark.createDataFrame([(5, 55, "U", 200)], NARROW), 2)
    feed = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    assert (3, BIG, "U", 1) in feed
    assert (5, 55, "U", 2) in feed
    assert (3, 30, "I", 0) in feed  # pre-widening value intact


def test_widening_through_merge_on_read_overlay(spark, tmp_path):
    t, sink = _seed(spark, str(tmp_path / "tbl"), merge_on_read=True)
    sink(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 1)
    sink(spark.createDataFrame([(5, 55, "U", 200)], NARROW), 2)
    res = t._resolved(t.current_version())
    assert any(res["bucket_deltas"].values())  # overlay is live
    snap = t.read(spark)
    assert snap.schema["v"].dataType.simpleString() == "bigint"
    rows = {r["k"]: r["v"] for r in snap.collect()}
    assert rows[3] == BIG and rows[5] == 55 and rows[0] == 0


def test_streaming_cdf_replays_across_a_widening(spark, tmp_path):
    """The REAL streaming CDF path across a type widening: the source's
    output schema comes from the chain's NEWEST recorded schema
    (bigint), while pre-widening delta/base files carry int32 footers —
    the executor's Arrow scan must surface those rows as Python ints
    the bigint row converter accepts, and the feed must value-match the
    relational twin."""
    import os

    from anti_ddos_spark.sources.cdf import register_cdf_source

    root = str(tmp_path / "tbl")
    t, sink = _seed(spark, root)
    sink(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 1)
    sink(spark.createDataFrame([(5, 55, "U", 200)], NARROW), 2)

    want = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    register_cdf_source(spark)
    name = "widen_cdf"
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", -1)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in spark.table(name).collect()
    )
    spark.catalog.dropTempView(name)
    assert got == want
    assert (3, BIG, "U", 1) in got


def test_nullability_flip_is_absorbed_and_off_lattice_refused(
    spark, tmp_path
):
    """Two lattice edges pinned: (a) a nullability flip is NOT a type
    change — reads serve the recorded schema relaxed to nullable
    (parquet-inference parity), so batches may disagree on nullability
    freely; (b) an OFF-LATTICE parametric change (element type with no
    lossless edge, struct reshape) must refuse loudly rather than
    guess."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=4)
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    nn = StructType([
        StructField("k", LongType(), False),
        StructField("v", IntegerType(), False),  # non-nullable
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ])
    sink(spark.createDataFrame([(1, 10, "I", 0), (2, 20, "I", 1)], nn), 0)
    # nullable flavor of the same types: commits fine, values merge
    sink(spark.createDataFrame([(2, 25, "U", 100)], NARROW), 1)
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: 10, 2: 25}

    # array<int> -> array<string> has no lossless edge — refused with
    # the column named, nothing published
    t2 = VersionedTable(str(tmp_path / "tbl2"))
    sink2 = streaming_cdc_committer(t2, "k", seq_col="seq", n_buckets=4)
    arr_i = StructType([
        StructField("k", LongType(), True),
        StructField("v", ArrayType(IntegerType()), True),
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ])
    arr_s = StructType([
        StructField("k", LongType(), True),
        StructField("v", ArrayType(StringType()), True),
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ])
    sink2(spark.createDataFrame([(1, [1, 2], "I", 0)], arr_i), 0)
    with pytest.raises(SchemaEvolutionConflict) as ei:
        sink2(spark.createDataFrame([(1, ["x"], "U", 1)], arr_s), 1)
    assert ei.value.column == "v"
    assert t2.current_version() == 0

    # struct RESHAPE (field added inside the struct) is off the
    # lattice too — only same-shape structs widen field-wise
    t3 = VersionedTable(str(tmp_path / "tbl3"))
    sink3 = streaming_cdc_committer(t3, "k", seq_col="seq", n_buckets=4)
    st_a = StructType([
        StructField("k", LongType(), True),
        StructField("v", StructType([StructField("x", IntegerType())]),
                    True),
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ])
    st_b = StructType([
        StructField("k", LongType(), True),
        StructField("v", StructType([
            StructField("x", IntegerType()),
            StructField("y", IntegerType()),
        ]), True),
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ])
    sink3(spark.createDataFrame([(1, {"x": 1}, "I", 0)], st_a), 0)
    with pytest.raises(SchemaEvolutionConflict):
        sink3(
            spark.createDataFrame([(1, {"x": 1, "y": 2}, "U", 1)], st_b),
            1,
        )
    assert t3.current_version() == 0


def _arr_schema(elem):
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    return StructType([
        StructField("k", LongType(), True),
        StructField("v", ArrayType(elem), True),
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ])


def test_array_element_widening_full_walk(spark, tmp_path):
    """Parametric widening (round-13 verdict task #4): array<int> →
    array<long> is a probed lossless element edge — the chain records
    array<bigint>, every generation's files stay readable under the
    pin, and the walk covers snapshot, a narrow batch AFTER the
    widening, point lookup across generations, time travel, and CDF
    replay (relational twin AND the real streaming source)."""
    from pyspark.sql.types import IntegerType, LongType

    from anti_ddos_spark.sources.cdf import register_cdf_source

    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink(
        spark.createDataFrame(
            [(i, [i, i * 10], "I", i) for i in range(10)],
            _arr_schema(IntegerType()),
        ),
        0,
    )
    assert (
        t.read(spark).schema["v"].dataType.simpleString() == "array<int>"
    )
    sink(
        spark.createDataFrame(
            [(3, [BIG, 1], "U", 100)], _arr_schema(LongType())
        ),
        1,
    )
    sink(
        spark.createDataFrame(
            [(5, [55], "U", 200)], _arr_schema(IntegerType())
        ),
        2,
    )
    snap = t.read(spark)
    assert snap.schema["v"].dataType.simpleString() == "array<bigint>"
    rows = {r["k"]: r["v"] for r in snap.collect()}
    assert rows[3] == [BIG, 1] and rows[5] == [55] and rows[0] == [0, 0]

    got = {r["k"]: r["v"] for r in t.read_point(spark, [3, 0]).collect()}
    assert got == {3: [BIG, 1], 0: [0, 0]}
    assert (
        t.read(spark, version=0).schema["v"].dataType.simpleString()
        == "array<int>"
    )

    want = sorted(
        (r["k"], tuple(r["v"]), r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    assert (3, (BIG, 1), "U", 1) in want
    assert (3, (3, 30), "I", 0) in want  # pre-widening value intact

    register_cdf_source(spark)
    name = "arr_widen_cdf"
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", -1)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got_s = sorted(
        (r["k"], tuple(r["v"]), r["_op"], r["_version"])
        for r in spark.table(name).collect()
    )
    spark.catalog.dropTempView(name)
    assert got_s == want


def test_map_value_widening_commits_and_reads(spark, tmp_path):
    """map<string,int> → map<string,long>: the value side widens
    through the same probed lattice (snapshot-level pin; map payloads
    are excluded from CDC tie-break hashing by contract, so the walk
    stays on commit + snapshot + time travel)."""
    from pyspark.sql.types import (
        IntegerType, LongType, MapType, StringType, StructField,
        StructType,
    )

    def _sch(vt):
        return StructType([
            StructField("k", LongType(), True),
            StructField("v", MapType(StringType(), vt), True),
            StructField("op", StringType(), True),
            StructField("seq", LongType(), True),
        ])

    t = VersionedTable(str(tmp_path / "tbl"))
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=4)
    sink(
        spark.createDataFrame(
            [(i, {"a": i}, "I", i) for i in range(6)],
            _sch(IntegerType()),
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(2, {"a": BIG}, "U", 100)], _sch(LongType())
        ),
        1,
    )
    snap = t.read(spark)
    assert (
        snap.schema["v"].dataType.simpleString() == "map<string,bigint>"
    )
    rows = {r["k"]: dict(r["v"]) for r in snap.collect()}
    assert rows[2] == {"a": BIG} and rows[0] == {"a": 0}
    assert (
        t.read(spark, version=0).schema["v"].dataType.simpleString()
        == "map<string,int>"
    )


def test_mor_mixed_widening_stack_is_pinned(spark, tmp_path):
    """The MOR delta stack across a widening (round-13 verdict task
    #5): pre-widening delta files (int32 footers) and post-widening
    ones (int64) sit in ONE stack, and `_mor_merged` reads every
    per-version frame under the chain-recorded `delta_schema` pin —
    the same discipline as every other direct file read, no reliance
    on unionByName coercion. Walk: snapshot, point lookup, a
    mid-chain ADDED column null-filling backwards through the pin,
    and the inline-compaction path (stack overflow) reading pinned."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, i * 10, "I", i) for i in range(10)], NARROW
        ),
        0,
    )
    sink(spark.createDataFrame([(3, 31, "U", 50)], NARROW), 1)
    sink(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 2)
    # a batch that ADDS a column mid-stack: older delta files predate
    # it — the pinned read must null-fill them, not drop the column
    sink(
        spark.createDataFrame(
            [(7, 77, "x", "U", 300)],
            "k long, v long, w string, op string, seq long",
        ),
        3,
    )
    res = t._resolved(t.current_version())
    assert any(res["bucket_deltas"].values())  # overlay live, pinned path
    assert t._chain_meta(t.current_version(), "delta_schema") is not None
    snap = t.read(spark)
    assert snap.schema["v"].dataType.simpleString() == "bigint"
    rows = {r["k"]: (r["v"], r["w"]) for r in snap.collect()}
    assert rows[3] == (BIG, None)
    assert rows[7] == (77, "x")
    assert rows[0] == (0, None)
    got = {
        r["k"]: (r["v"], r["w"])
        for r in t.read_point(spark, [3, 7, 0]).collect()
    }
    assert got == {3: (BIG, None), 7: (77, "x"), 0: (0, None)}

    # overflow one bucket's stack: the inline compaction reads the
    # mixed-generation stack through the same pin and folds it
    for i in range(4, 4 + 9):
        sink(
            spark.createDataFrame(
                [(3, BIG + i, "x", "U", 1000 + i)],
                "k long, v long, w string, op string, seq long",
            ),
            i,
        )
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows[3] == BIG + 12
    assert rows[0] == 0  # untouched key survives the compactions


def test_widened_type_parametric_lattice():
    """Pure-lattice units for the recursive edges (no Spark)."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, FloatType, IntegerType, LongType,
        MapType, StringType, StructField, StructType,
    )

    from anti_ddos_spark.sources.versioned import _widened_type

    assert _widened_type(
        ArrayType(IntegerType()), ArrayType(LongType())
    ) == ArrayType(LongType(), True)
    # containsNull flip alone: absorbed by OR, not a conflict
    assert _widened_type(
        ArrayType(IntegerType(), False), ArrayType(IntegerType(), True)
    ) == ArrayType(IntegerType(), True)
    assert _widened_type(
        MapType(IntegerType(), FloatType()),
        MapType(LongType(), DoubleType()),
    ) == MapType(LongType(), DoubleType(), True)
    # nested recursion
    assert _widened_type(
        ArrayType(ArrayType(IntegerType())),
        ArrayType(ArrayType(LongType())),
    ) == ArrayType(ArrayType(LongType(), True), True)
    # same-shape struct widens field-wise; reshape refuses
    assert _widened_type(
        StructType([StructField("x", IntegerType())]),
        StructType([StructField("x", LongType())]),
    ) == StructType([StructField("x", LongType())])
    assert _widened_type(
        StructType([StructField("x", IntegerType())]),
        StructType([
            StructField("x", IntegerType()),
            StructField("y", IntegerType()),
        ]),
    ) is None
    # off-lattice element edges refuse
    assert _widened_type(
        ArrayType(IntegerType()), ArrayType(StringType())
    ) is None
    assert _widened_type(
        ArrayType(LongType()), ArrayType(DoubleType())
    ) is None  # long→double loses integers past 2^53, arrays too


def test_chunked_cdf_budget_replays_across_a_widening(spark, tmp_path):
    """The 4 KB-budget CHUNKED diff across a widening: residue classes
    hash the key's canonical STRING form (round-12 ADVICE — per-file
    dtype drift like int32-vs-int64 payload generations must not split
    a key across classes into spurious I/D pairs), and every chunk's
    scan pads/reads the widened column. Feed parity with the unchunked
    relational twin, through a REAL stream."""
    from anti_ddos_spark.sources.cdf import register_cdf_source

    root = str(tmp_path / "tbl")
    t, sink = _seed(spark, root)
    sink(spark.createDataFrame([(3, BIG, "U", 100)], WIDE), 1)
    sink(spark.createDataFrame([(5, 55, "U", 200)], NARROW), 2)
    want = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    register_cdf_source(spark)
    name = "widen_cdf_budget"
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", -1)
        .option("diff_disk_budget_bytes", 4096)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in spark.table(name).collect()
    )
    spark.catalog.dropTempView(name)
    assert got == want
    assert (3, BIG, "U", 1) in got
