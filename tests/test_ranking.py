"""operators/ranking.py: the distributed global rank / ntile /
percent_rank must be EXACTLY what a partition-less window would compute —
pinned against Spark's own window functions on inputs with ties, skew, and
sizes around the tile boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.operators.ranking import (
    with_global_rank,
    with_ntile,
)


def _input(spark, n: int, n_ties: int):
    """n rows, values collide every n_ties rows (forces tiebreak use),
    skewed toward low values."""
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 37) % (n // n_ties + 1)).alias("v"),
    )


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 97, 1000])
def test_rank_matches_window_row_number(spark, n):
    df = _input(spark, n, 3)
    order = [F.desc("v"), F.asc("id")]
    got = {r["id"]: r["rank"] for r in
           with_global_rank(df, order, rank_col="rank").collect()}
    want = {r["id"]: r["rn"] for r in df.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
    ).collect()}
    assert got == want


@pytest.mark.parametrize("n,tiles", [(1, 4), (3, 4), (4, 4), (5, 4),
                                     (7, 5), (1000, 5), (1003, 4)])
def test_ntile_and_pct_match_window(spark, n, tiles):
    df = _input(spark, n, 4)
    order = [F.asc("v"), F.asc("id")]
    got = {r["id"]: (r["t"], r["p"]) for r in
           with_ntile(df, order, tiles, out_col="t", pct_col="p").collect()}
    w = Window.orderBy(*order)
    want = {r["id"]: (r["t"], r["p"]) for r in df.select(
        "id", F.ntile(tiles).over(w).cast("long").alias("t"),
        F.percent_rank().over(w).alias("p")).collect()}
    assert got == want


def test_running_sums_match_window(spark):
    """Distributed prefix sums ≡ UNBOUNDED PRECEDING..CURRENT ROW window,
    two value columns sharing one pass (integer-exact)."""
    from social_media_sentiment_analysis_spark.operators.ranking import (
        with_running_sums,
    )

    df = spark.range(500).select(
        "id", (F.col("id") % 7).alias("a"), (F.col("id") * 3 % 11).alias("b"))
    got = {r["id"]: (r["ca"], r["cb"]) for r in with_running_sums(
        df, [F.asc("id")], {"ca": "a", "cb": "b"}).collect()}
    w = (Window.orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r["id"]: (r["ca"], r["cb"]) for r in df.select(
        "id", F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb")).collect()}
    assert got == want


def test_running_sums_null_semantics_match_window(spark):
    """NULL handling must match the global window exactly (advisor finding):
    SUM ignores NULLs but returns NULL over an all-NULL (or empty) prefix —
    so a long all-NULL head must stay NULL across partition boundaries, not
    collapse to 0, and values resume adding after the first non-NULL."""
    from social_media_sentiment_analysis_spark.operators.ranking import (
        with_running_sums,
    )

    # 600 rows: the first 250 are NULL (spanning several range partitions
    # at shuffle_partitions=8), then sparse values with NULL gaps
    df = spark.range(600).select(
        "id",
        F.when(F.col("id") >= 250, F.col("id") % 5).alias("a"),
        F.when(F.col("id") % 3 == 0, F.col("id") % 7).alias("b"),
    )
    got = {r["id"]: (r["ca"], r["cb"]) for r in with_running_sums(
        df, [F.asc("id")], {"ca": "a", "cb": "b"}).collect()}
    w = (Window.orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r["id"]: (r["ca"], r["cb"]) for r in df.select(
        "id", F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb")).collect()}
    assert got == want
    assert want[0] == (None, 0)      # sanity: the head really is NULL
    assert want[249][0] is None      # ...all the way to the first value


def test_no_partitionless_window_over_input(spark):
    """The plan must contain no WindowExec without a partition spec over
    the (unbounded) input — only the bounded P-row offsets table may use
    one."""
    df = _input(spark, 1000, 4)
    plan = with_ntile(df, [F.asc("v"), F.asc("id")], 4, out_col="t") \
        ._jdf.queryExecution().executedPlan().toString()
    # the input-side window is partitioned by the range-partition id
    assert "partitionBy" not in plan  # sanity: textual form differs; check:
    for line in plan.splitlines():
        if "Window" in line and "__rank_pid" not in line:
            # must be the offsets-table window over __cnt (bounded input)
            assert "__cnt" in line, line
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
