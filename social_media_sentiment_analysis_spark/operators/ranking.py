"""Distributed global ranking: exact rank / ntile / percent_rank over an
UNBOUNDED-cardinality input without a single-partition window.

``Window.orderBy(...)`` with no partitionBy plans a partition-less
WindowExec: every row flows through ONE task — the classic scale killer for
per-customer/per-document rollups (fine for bounded inputs like per-day or
per-type aggregates, fatal at tens of millions of rows). This module
replaces it with the classic distributed total-order rank:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the sort key
   (disjoint ordered key ranges, rows sorted inside each range — together
   this is a distributed total sort, spread over P tasks);
2. stamp each row map-side with ``spark_partition_id()`` and
   ``monotonically_increasing_id()`` (pid in the upper bits, a counter that
   increments by 1 per row in partition-local order in the lower bits);
3. ``localCheckpoint`` the stamped frame so the per-partition stats branch
   and the output branch read the SAME materialized partitions — this both
   removes the duplicate scan/exchange subtree and makes the pid/mid stamps
   deterministic even over nondeterministic upstreams (a task retry cannot
   re-deal rows to different partitions once the result is pinned);
4. one P-row aggregate (count + min(mid) per pid) turned into cumulative
   offsets and broadcast back;
5. global rank = offset[pid] + (mid - min_mid[pid]) + 1 — pure map-side
   arithmetic; NO window runs over the corpus, so no second full exchange.

The result is EXACTLY the rank a global sort would give as long as the
ordering is total (callers must include a unique tiebreak column — the same
requirement that makes single-partition ntile deterministic). ntile and
percent_rank are then closed-form expressions of (rank, n):

  percent_rank = (rank - 1) / (n - 1)                       [0 when n = 1]
  ntile(t):  base = n div t, rem = n mod t; the first ``rem`` tiles take
             base+1 rows:  rank <= rem·(base+1)
                             -> ceil(rank / (base+1))
                             -> rem + ceil((rank - rem·(base+1)) / base)

Cost, measured from the physical plan (PLANS.md): ONE full-corpus range
exchange (the sort any exact rank needs, spread over P tasks) + the
localCheckpoint materialization (MEMORY_AND_DISK write + one columnar
re-read for the P-row stats pass) + one P-row broadcast. ``step 5`` relies
on monotonically_increasing_id's per-partition counter being consecutive
(true since Spark 1.6: pid << 33 | row-index; pinned by
tests/test_ranking.py against a single-partition window oracle).

``with_running_sums`` additionally needs an ordered per-partition
accumulation, which only WindowExec provides — its window clusters on the
pid column, so the plan pays a SECOND exchange (hash on pid, still P-way
parallel, never single-task). Two exchanges total; the checkpoint keeps the
totals branch from re-scanning the input lineage.

Trade-off note for cluster deployments: localCheckpoint pins partitions to
executors (lost executor ⇒ recompute from nothing fails the job rather than
silently re-dealing rows). For long jobs on preemptible nodes, swap for
``df.checkpoint()`` with a reliable checkpoint dir — same determinism, adds
a DFS round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _MID, _MIN, _OFF = "__rank_pid", "__rank_mid", "__rank_minmid", "__rank_off"
TOTAL_COL = "__rank_n"


def _ranged_stamped(df: DataFrame, order: list[Column]) -> DataFrame:
    """Range-partition + locally sort ``df`` by ``order``, stamp pid/mid,
    and localCheckpoint so every downstream branch shares one materialized
    computation (deterministic pids, no duplicate scan).

    EAGER checkpoint, deliberately: a lazy (eager=False) checkpoint here is
    re-planned inside each derived action, so the two downstream branches
    can each materialize their own copy — measured as persisted-RDD blocks
    that never drain (tests/test_cache_hygiene.py caught it: steady state 6
    instead of ≤1, and pid agreement would again be by luck, not pinned).
    Eager materialization runs once at call time and every branch reads the
    same frozen partitions."""
    part = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(_MID, F.monotonically_increasing_id())
    )
    return part.localCheckpoint(eager=True)


def with_global_rank(df: DataFrame, order: list[Column],
                     rank_col: str = "rank",
                     keep_total: bool = False) -> DataFrame:
    """Add an exact 1-based global rank under the total ordering ``order``
    (pass desc()/asc() Columns, INCLUDING a unique tiebreak). With
    ``keep_total`` also adds the row count as ``TOTAL_COL`` (broadcast-
    joined, not a second scan).

    SIDE EFFECT — this call EXECUTES a Spark job: the eager
    ``localCheckpoint`` in ``_ranged_stamped`` materializes the
    range-sorted input at BUILD time (required for deterministic pid/mid
    stamps shared by both downstream branches — see module docstring), and
    pins it in executor MEMORY_AND_DISK until the returned frame's RDD is
    garbage-collected and the ContextCleaner sweeps. Plan-only callers
    (``.explain()``, exchange counting, building without an action) still
    pay the materialization; drop the result handle promptly when only
    inspecting plans."""
    part = _ranged_stamped(df, order)
    stats = part.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__cnt"), F.min(_MID).alias(_MIN))
    # cumulative offsets over the P-row stats table: bounded input (P =
    # number of shuffle partitions), so this tiny global window is fine
    w_off = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    offsets = stats.select(
        _PID, _MIN,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias(_OFF),
        F.sum("__cnt").over(w_all).alias(TOTAL_COL),
    )
    out = (
        part.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col,
                    F.col(_OFF) + (F.col(_MID) - F.col(_MIN)) + F.lit(1))
        .drop(_PID, _MID, _MIN, _OFF)
    )
    return out if keep_total else out.drop(TOTAL_COL)


def with_running_sums(df: DataFrame, order: list[Column],
                      sums: dict[str, str]) -> DataFrame:
    """Distributed prefix sums: for each ``out_col -> value_col`` in
    ``sums`` add the running SUM of ``value_col`` under the total ordering
    ``order`` — the UNBOUNDED PRECEDING..CURRENT ROW frame without a
    partition-less window. Range partition → per-pid running sum (window
    clustered on pid: one extra P-way hash exchange, see module docstring)
    → broadcast per-partition totals as offsets; all requested sums share
    the exchanges. Exact for integer/decimal value columns; double columns
    change accumulation order vs a sequential scan (like any partial
    aggregation).

    NULL semantics match the global window exactly: SUM ignores NULLs and
    returns NULL over an all-NULL (or empty) prefix, so the local sum and
    the prior-partition offset combine with NULL-as-identity-only-if-both:
    NULL ⊕ NULL = NULL, NULL ⊕ x = x, x ⊕ y = x + y.

    SIDE EFFECT: like ``with_global_rank``, building this frame runs a
    Spark job and pins the checkpointed input in executor storage until
    the handle is collected (see ``with_global_rank`` docstring)."""
    part = _ranged_stamped(df, order)
    w_local = (Window.partitionBy(_PID).orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = part.withColumns({
        out: F.sum(val).over(w_local) for out, val in sums.items()})
    totals = part.groupBy(_PID).agg(
        *[F.sum(val).alias(f"__tot_{out}") for out, val in sums.items()])
    # no coalesce here: a NULL cumulative total means "no non-NULL value in
    # any prior partition", which must propagate (not become 0)
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[F.sum(f"__tot_{out}").over(w_off).alias(f"__off_{out}")
          for out in sums])
    out_df = local.join(F.broadcast(offsets), _PID)

    def _combine(local_col: Column, off_col: Column) -> Column:
        return (F.when(off_col.isNull(), local_col)
                .when(local_col.isNull(), off_col)
                .otherwise(local_col + off_col))

    out_df = out_df.withColumns({
        out: _combine(F.col(out), F.col(f"__off_{out}")) for out in sums})
    return out_df.drop(_PID, _MID, *[f"__off_{out}" for out in sums])


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
