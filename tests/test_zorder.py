"""Z-order layout: Morton-code correctness and the file-pruning bound.

The pruning proof is deliberately engine-independent: it intersects the
parquet FOOTER min/max intervals (via pyarrow) with the query box, which
is exactly the information any engine's scan pruning has. A file whose
[min, max] misses the predicate range can never need reading.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.sources.layout import write_zordered, zorder_expr


def ref_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_expr_matches_reference_morton(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 2, 3, 5, 1023) for y in (0, 1, 2, 7, 512)],
        "x long, y long",
    )
    rows = df.select(
        "x", "y", zorder_expr(["x", "y"]).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == ref_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_expr_rejects_long_overflow():
    with pytest.raises(ValueError):
        zorder_expr(["a", "b", "c", "d"], bits=16)


def _files_touched(path: str, col: str, lo: int, hi: int) -> int:
    """Files whose footer [min, max] for `col` intersects [lo, hi)."""
    touched = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                c = grp.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {name}"
        if fmin < hi and fmax >= lo:
            touched += 1
    return touched


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    n, side, files = 200_000, 1024, 64
    df = spark.range(n).select(
        (F.xxhash64("id") % side).alias("hx"),
        (F.xxhash64("id", F.lit(1)) % side).alias("hy"),
    ).select(
        F.abs("hx").alias("x"), F.abs("hy").alias("y")
    )
    paths = {k: os.path.join(base, k) for k in ("random", "linear", "zorder")}
    # random: hash-partitioned, no clustering at all
    df.repartition(files).write.parquet(paths["random"])
    # linear: range-clustered on x only (the single-column best case)
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.parquet(paths["linear"])
    )
    write_zordered(df, paths["zorder"], ["x", "y"], n_files=files)
    return spark, paths, files


def test_zorder_prunes_the_column_a_linear_sort_cannot(layouts):
    spark, paths, files = layouts
    # selective filter on y ALONE (1/8 of its range): linear-by-x has
    # no y clustering, so footer stats cannot exclude anything; the
    # z-layout's file index interleaves the high bits of BOTH columns,
    # so only the files sharing the 3-bit y prefix can intersect.
    lo, hi = 256, 384
    t_random = _files_touched(paths["random"], "y", lo, hi)
    t_linear = _files_touched(paths["linear"], "y", lo, hi)
    t_zorder = _files_touched(paths["zorder"], "y", lo, hi)
    assert t_random == files
    assert t_linear == files
    # bounds leave straddler headroom: repartitionByRange SAMPLES its
    # boundaries (randomized seed), so files can straddle bit-prefix
    # edges and the exact count wobbles run to run; the load-bearing
    # contrast is against 64/64 for the other layouts. y (the higher
    # interleaved bit) clusters tighter than x.
    assert t_zorder <= files // 4 + 3, t_zorder

    # and x stays prunable too (both dims keep locality on the curve)
    x_zorder = _files_touched(paths["zorder"], "x", lo, hi)
    assert x_zorder <= files // 2, x_zorder
    # linear is of course perfect on its one sorted column
    assert _files_touched(paths["linear"], "x", lo, hi) <= files // 4

    # result parity: the layout changes bytes read, never answers
    q = lambda p: (
        spark.read.parquet(p)
        .filter((F.col("y") >= lo) & (F.col("y") < hi))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x") + F.col("y")).alias("s"),
        )
        .collect()[0]
    )
    r_rand, r_z = q(paths["random"]), q(paths["zorder"])
    assert (r_rand["n"], r_rand["s"]) == (r_z["n"], r_z["s"])
    assert r_z["n"] > 0


def test_zorder_filter_reaches_the_scan(layouts):
    spark, paths, _ = layouts
    from anti_ddos_spark.plans import plan_summary

    s = plan_summary(
        spark.read.parquet(paths["zorder"]).filter(
            (F.col("y") >= 256) & (F.col("y") < 384)
        )
    )
    assert any("y" in p for p in s["pushed_filters"]), s["pushed_filters"]


def test_zorder_compaction_is_a_table_version(spark, tmp_path):
    """OPTIMIZE-ZORDER as a lifecycle op (r7 verdict task #7): compact
    with zorder_cols publishes a version whose footers satisfy the
    pruning bound, while every pre-compaction version's files keep
    their inodes (time travel untouched). Negative values exercise the
    round-8 input mask: without it the sign bit would smear across the
    interleave and de-cluster BOTH columns."""
    from anti_ddos_spark.sources.versioned import VersionedTable, compact

    t = VersionedTable(str(tmp_path / "ztbl"))
    side, files = 1024, 16
    df = spark.range(50_000).select(
        F.abs(F.xxhash64("id") % side).alias("x"),
        F.abs(F.xxhash64("id", F.lit(1)) % side).alias("y"),
    )
    for i in range(4):  # accrete small appends, like a streaming table
        t.commit(df.filter(F.col("x") % 4 == i))
    v_pre = t.current_version()

    def inodes():
        out = {}
        for dirpath, _, names in os.walk(os.path.join(t.root, "data")):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    out[p] = os.stat(p).st_ino
        return out

    before = inodes()
    v_z = compact(t, spark, n_files=files, zorder_cols=["x", "y"])
    assert t._manifest(v_z)["mode"] == "compact:zorder"
    # older versions' files untouched (compaction added, never rewrote)
    after = inodes()
    assert all(after[p] == ino for p, ino in before.items())
    assert t.read(spark, version=v_pre).count() == t.read(spark).count()

    # the compacted version's own files satisfy the pruning bound:
    # a 1/8-range filter on y touches at most 1/4 + straddlers
    zdir = {
        os.path.dirname(rel) for rel in t._manifest(v_z)["files"]
    }
    assert len(zdir) == 1
    zpath = os.path.join(t.root, zdir.pop())
    touched = _files_touched(zpath, "y", 256, 384)
    assert touched <= files // 4 + 3, touched
    # answers unchanged by layout
    n_z = (
        t.read(spark, version=v_z)
        .filter((F.col("y") >= 256) & (F.col("y") < 384))
        .count()
    )
    n_pre = (
        t.read(spark, version=v_pre)
        .filter((F.col("y") >= 256) & (F.col("y") < 384))
        .count()
    )
    assert n_z == n_pre > 0


def test_zorder_expr_masks_out_of_contract_inputs(spark):
    """ADVICE r8: negatives / overwide values must not smear sign bits
    across the interleave — the masked expression equals the reference
    Morton code of (value & mask) for EVERY long."""
    vals = [-1, -5, -1024, 70000, 2**40 + 3, 0, 65535]
    df = spark.createDataFrame([(v, 1) for v in vals], "x long, y long")
    rows = df.select("x", zorder_expr(["x", "y"]).alias("z")).collect()
    m = (1 << 16) - 1
    for r in rows:
        assert r["z"] == ref_morton(r["x"] & m, 1), r["x"]
