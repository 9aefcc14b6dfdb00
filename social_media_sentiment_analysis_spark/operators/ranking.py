"""Distributed global ranking: exact rank / ntile / percent_rank over an
UNBOUNDED-cardinality input without a single-partition window.

``Window.orderBy(...)`` with no partitionBy plans a partition-less
WindowExec: every row flows through ONE task — the classic scale killer for
per-customer/per-document rollups (fine for bounded inputs like per-day or
per-type aggregates, fatal at tens of millions of rows). This module
replaces it with the classic distributed total-order rank:

1. ``repartitionByRange`` on the sort key (disjoint, ordered key ranges —
   partition i holds strictly earlier keys than partition i+1);
2. ``row_number`` windowed BY PARTITION ID (parallel, no global sort);
3. per-partition counts (one tiny P-row aggregate) turned into cumulative
   offsets and broadcast back;
4. global rank = offset[pid] + local row number.

The result is EXACTLY the rank a global sort would give as long as the
ordering is total (callers must include a unique tiebreak column — the same
requirement that makes single-partition ntile deterministic). ntile and
percent_rank are then closed-form expressions of (rank, n):

  percent_rank = (rank - 1) / (n - 1)                       [0 when n = 1]
  ntile(t):  base = n div t, rem = n mod t; the first ``rem`` tiles take
             base+1 rows:  rank <= rem·(base+1)
                             -> ceil(rank / (base+1))
                             -> rem + ceil((rank - rem·(base+1)) / base)

Cost: one range exchange of the input (the sort any exact rank needs,
but spread over P tasks) + one P-row broadcast. The boundary sampling pass
of repartitionByRange re-reads the input lineage; rank callers that feed an
expensive upstream should localCheckpoint first if that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _LOCAL, _OFF = "__rank_pid", "__rank_local", "__rank_off"
TOTAL_COL = "__rank_n"


def with_global_rank(df: DataFrame, order: list[Column],
                     rank_col: str = "rank",
                     keep_total: bool = False) -> DataFrame:
    """Add an exact 1-based global rank under the total ordering ``order``
    (pass desc()/asc() Columns, INCLUDING a unique tiebreak). With
    ``keep_total`` also adds the row count as ``TOTAL_COL`` (broadcast-
    joined, not a second scan)."""
    part = df.repartitionByRange(*order).withColumn(
        _PID, F.spark_partition_id())
    local = part.withColumn(
        _LOCAL, F.row_number().over(Window.partitionBy(_PID).orderBy(*order)))
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt"))
    # cumulative offsets over the P-row counts table: bounded input (P =
    # number of shuffle partitions), so this tiny global window is fine
    w_off = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias(_OFF),
        F.sum("__cnt").over(w_all).alias(TOTAL_COL),
    )
    out = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, F.col(_OFF) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFF)
    )
    return out if keep_total else out.drop(TOTAL_COL)


def with_running_sums(df: DataFrame, order: list[Column],
                      sums: dict[str, str]) -> DataFrame:
    """Distributed prefix sums: for each ``out_col -> value_col`` in
    ``sums`` add the running SUM of ``value_col`` under the total ordering
    ``order`` — the UNBOUNDED PRECEDING..CURRENT ROW frame without a
    partition-less window. Same mechanics as ``with_global_rank`` (range
    partition → local running sum → broadcast per-partition totals as
    offsets); all requested sums share ONE range exchange. Exact for
    integer/decimal value columns; double columns change accumulation
    order vs a sequential scan (like any partial aggregation)."""
    part = df.repartitionByRange(*order).withColumn(
        _PID, F.spark_partition_id())
    w_local = (Window.partitionBy(_PID).orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = part.withColumns({
        out: F.sum(val).over(w_local) for out, val in sums.items()})
    totals = part.groupBy(_PID).agg(
        *[F.sum(val).alias(f"__tot_{out}") for out, val in sums.items()])
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[F.coalesce(F.sum(f"__tot_{out}").over(w_off), F.lit(0))
          .alias(f"__off_{out}") for out in sums])
    out_df = local.join(F.broadcast(offsets), _PID)
    out_df = out_df.withColumns({
        out: F.col(out) + F.col(f"__off_{out}") for out in sums})
    return out_df.drop(_PID, *[f"__off_{out}" for out in sums])


def _ntile_expr(rank: Column, n: Column, tiles: int) -> Column:
    """Closed-form ntile from (rank, n) — integer arithmetic only, matching
    SQL NTILE's first-tiles-take-the-remainder definition exactly."""
    t = F.lit(tiles)
    base, rem = (n / t).cast("long"), n % t
    big = base + 1  # size of the first `rem` tiles
    in_big = rank <= rem * big
    # integer ceil(a/b) = (a + b - 1) div b
    tile_big = ((rank + big - 1) / big).cast("long")
    tile_small = rem + (((rank - rem * big) + base - 1) / base).cast("long")
    return F.when(in_big, tile_big).otherwise(tile_small)


def with_ntile(df: DataFrame, order: list[Column], tiles: int,
               out_col: str, pct_col: str | None = None) -> DataFrame:
    """Exact distributed NTILE(tiles) OVER (ORDER BY ``order``) — and
    optionally percent_rank into ``pct_col`` — via ``with_global_rank``.
    ``order`` must be a total ordering (unique tiebreak)."""
    ranked = with_global_rank(df, order, rank_col="__rank", keep_total=True)
    rank, n = F.col("__rank"), F.col(TOTAL_COL)
    ranked = ranked.withColumn(out_col, _ntile_expr(rank, n, tiles))
    if pct_col is not None:
        ranked = ranked.withColumn(
            pct_col,
            F.when(n == 1, F.lit(0.0)).otherwise((rank - 1) / (n - 1)))
    return ranked.drop("__rank", TOTAL_COL)
