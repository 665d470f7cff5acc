"""Z-order (Morton) data layout for multi-dimensional scan pruning.

Parquet scans prune files and row groups with column min/max footer
statistics, but statistics only help when the layout CLUSTERS the
filtered columns. A linear sort clusters exactly one column: a filter
on any other column touches every file. Interleaving the bits of k
columns (the Z-/Morton curve — public technique, used by every
lakehouse engine's OPTIMIZE ZORDER) gives every interleaved column
partial locality, so a selective filter on ANY of them intersects only
a fraction of the file min/max ranges. At 100 TB the difference is
reading 1/8th of the files instead of all of them for the second and
third filter column.

Layout math for the file-count claim (proved in tests/test_zorder.py):
with 2 interleaved columns and 64 z-sorted files, the file index is
the top 6 Morton bits = 3 high bits of x interleaved with 3 high bits
of y, so a filter selecting a 1/8 range of y alone touches the 8 files
sharing the 3-bit y prefix — vs all 64 under a linear x sort. The
pruning bound is engine-independent (it is a property of the footer
min/max intervals), which is how the test pins it: by intersecting the
parquet footers directly.

Only the expression construction is driver-side; the z-value is a pure
bitwise Catalyst expression (literal shifts — whole-stage-codegen
friendly, zero Python in the row path) and the write is one range
repartition + local sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_expr(cols: list, bits: int = 16) -> Column:
    """Morton code of ``cols`` (non-negative integral columns, each
    using its low ``bits`` bits): bit i of column j lands at position
    ``i * len(cols) + j``. Built from literal shifts so the whole
    expression stays inside codegen. k * bits must fit in a long
    (k·bits ≤ 63).

    Inputs are masked to the contract (``value & (2^bits - 1)``) before
    interleaving: without the mask, arithmetic shiftright smears a
    negative value's sign bit across EVERY interleaved position,
    silently destroying the clustering for all columns (an
    out-of-contract input then surfaces only as a mysterious pruning
    regression). With it, out-of-range values degrade to defined
    wrap-around on their own column — still out of contract (callers
    should size ``bits`` to the domain), but deterministic and
    contained."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    mask = F.lit((1 << bits) - 1)
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(mask)
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    n_files: int = 64,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of ``cols``: one range exchange on the z-value (range, not
    hash — file boundaries must be curve-contiguous for footer min/max
    to prune), a partition-local sort, one file per partition. The
    z-value itself is dropped from the output — pruning works off the
    ORIGINAL columns' footer stats."""
    zval = zorder_expr(cols, bits=bits).alias("_z")
    (
        df.withColumn("_z", zval)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
