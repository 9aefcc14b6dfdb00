"""Skew-mitigation operators.

Default posture: AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) splits skewed shuffle-join partitions at runtime, and map-side
partial aggregation absorbs groupBy skew — prefer those. Manual salting is
for the cases AQE does not cover: shuffle joins where one key dominates so
hard that a single split is still too large, window/as-of partitions, and
exact distinct-counts per hot key.

``salted_join`` replicates the small side SALT_N ways and fans the big
side's hot keys across salt buckets deterministically, turning one
oversized partition into SALT_N evenly-sized ones at the cost of
broadcasting/duplicating the small side SALT_N×. Results are identical to
the plain join (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt_from: str, num_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted against skew in big's
    key distribution.

    ``salt_from`` must be a (near-)unique big-side column (an id); the salt
    is a deterministic hash of it, so replays/retries produce identical
    partitioning (no rand()). The small side is exploded ``num_salts``× —
    keep it the dimension side.

    Only big-side-preserving join types are valid: an unmatched SMALL-side
    row exists ``num_salts`` times after the explode, so right/full outer
    would emit it ``num_salts`` times where the plain join emits once.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the exploded small "
            f"side would duplicate its unmatched rows {num_salts}x; use a "
            f"big-side-preserving join type {sorted(allowed)}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(num_salts)))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    return (
        salted_big.join(salted_small, on=[on, "__salt"], how=how)
        .drop("__salt")
    )


def two_stage_distinct_count(df: DataFrame, group_col: str,
                             distinct_col: str) -> DataFrame:
    """COUNT(DISTINCT x) per group without funneling each group's full value
    set through one reducer: stage 1 dedups (group, value) pairs — a shuffle
    keyed on BOTH columns, so a hot group spreads over many partitions —
    stage 2 counts per group (tiny after dedup).

    This is the manual form of what Catalyst's distinct-agg rewrite does;
    exposed as an operator so pipelines can fuse stage 1 with other
    pair-level work.
    """
    return (
        df.select(group_col, distinct_col).distinct()
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias(f"distinct_{distinct_col}"))
    )
