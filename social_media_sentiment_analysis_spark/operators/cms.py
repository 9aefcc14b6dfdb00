"""Count-min sketch as a DataFrame — mergeable heavy-hitter counting.

The CMS (Cormode & Muthukrishnan 2005) maps each item into one bucket per
hash row; the estimate for an item is the MIN over its rows' bucket counts —
an overestimate biased by collisions, bounded by ε·N with ε = e/width at
confidence 1−(1/e)^depth.

Spark-first realization: the sketch is itself a tiny DataFrame
(row, bucket, cnt) of at most depth × width cells, built with ONE
explode + groupBy over the item stream — the same partial-aggregation
machinery as any count, so the map-side combine collapses each partition to
≤ depth × width cells before the shuffle regardless of input size. That is
exactly the "mergeable sketch" property: partitions build local sketches and
the exchange adds them cell-wise. Probing joins candidate items against the
broadcast sketch and takes min-over-rows.

Why not ``F.count_min_sketch``: the built-in returns an opaque binary that
only ``.`` JVM helpers can read; this formulation keeps build and probe in
plain relational ops (inspectable, AQE-planned, and usable as a persisted
table that later increments can be unioned onto).

Hashing: xxhash64 with per-row seeds — the same engine-independent hash
family the dedup/sampling operators use.

Accuracy contract (tests/test_skew_sketch.py::TestCountMin): estimates are
never below true counts, and are within ε·N on a skewed stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1024


def _bucket(item: Column, row: Column, width: int) -> Column:
    return F.pmod(F.xxhash64(item, row), F.lit(width))


def cms_build(df: DataFrame, item_col: str, depth: int = DEFAULT_DEPTH,
              width: int = DEFAULT_WIDTH) -> DataFrame:
    """One pass over ``df[item_col]`` → sketch table (row, bucket, cnt).

    The explode fans each item out to ``depth`` (row, bucket) cells; the
    aggregate's partial combine bounds shuffle input at depth × width cells
    per partition — constant in |df|.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(item_col).alias("__item"))
        .select("__item", rows)
        .select("row", _bucket(F.col("__item"), F.col("row"), width)
                .alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (the mergeability property —
    union the increments, re-aggregate)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, item_col: str,
                 depth: int = DEFAULT_DEPTH,
                 width: int = DEFAULT_WIDTH) -> DataFrame:
    """Point-query each candidate item: min over its depth cells.

    The sketch (≤ depth × width rows) broadcasts; candidates never shuffle.
    Missing cells read as 0 (an empty bucket was simply never hit).
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probes = (
        candidates.select(F.col(item_col).alias("__item")).distinct()
        .select("__item", rows)
        .select("__item", "row",
                _bucket(F.col("__item"), F.col("row"), width).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("__item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
        .select(F.col("__item").alias(item_col), "est_count")
    )
