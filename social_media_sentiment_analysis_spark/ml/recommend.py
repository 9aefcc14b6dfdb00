"""ALS collaborative filtering over the customer x part purchase graph.

The reference has no recommender — its closest analogue is ranked retrieval
of rows by engagement (sentiment_analysis.py:450-715 orders by counts). A
large-scale analytics engine serving a social/e-commerce corpus needs the
standard implicit-feedback recommender, so this module provides it
Spark-first:

    lineitem ⋈ orders  →  (user, item, cnt) interactions  →  ALS(implicit)

- **Implicit feedback**: purchase counts are confidence, not ratings
  (Hu/Koren/Volinsky 2008, the model MLlib's ``implicitPrefs=True``
  implements). Observed cells should score near 1, unobserved near 0.
- **Scale**: ALS is MLlib's JVM-side blocked alternating least squares —
  factor matrices are partitioned by user/item block, so the fit is a
  sequence of distributed normal-equation solves, never a driver-side
  matrix. The interaction build is one shuffled fact-fact join keyed on
  ``o_orderkey`` followed by a hash aggregate on (user, item).
- **Determinism**: fixed ``seed`` so the registry query is stable run to
  run (rows-only check — factor matrices have no SQL twin).
"""

from __future__ import annotations

from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["purchase_interactions", "fit_als", "recommend_for_users"]


def purchase_interactions(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(user, item, cnt) purchase counts: customer bought part cnt times.

    One exchange on ``o_orderkey`` (orders is pre-projected to the two
    columns the join needs), then a partial-aggregated groupBy on the
    (user, item) pair — at 100 TB both shuffles are on high-cardinality
    keys with map-side combine, so no skew hotspot.
    """
    o = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_custkey").cast("int").alias("user"),
    )
    return (
        lineitem.select("l_orderkey", F.col("l_partkey").cast("int").alias("item"))
        .join(o, "l_orderkey")
        .groupBy("user", "item")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def fit_als(interactions: DataFrame,
            rank: int = 8,
            reg_param: float = 0.1,
            alpha: float = 10.0,
            max_iter: int = 10,
            seed: int = 42) -> ALSModel:
    """Fit implicit-feedback ALS on (user, item, cnt) interactions."""
    als = ALS(
        userCol="user",
        itemCol="item",
        ratingCol="cnt",
        implicitPrefs=True,
        rank=rank,
        regParam=reg_param,
        alpha=alpha,
        maxIter=max_iter,
        seed=seed,
        coldStartStrategy="drop",
        nonnegative=False,
    )
    return als.fit(interactions)


def recommend_for_users(model: ALSModel, users: DataFrame, k: int = 3) -> DataFrame:
    """Top-k item recommendations per user in ``users``.

    ``recommendForUserSubset`` runs JVM-side (blocked factor cross-product
    with per-block top-k pushdown — never materializes the full user x item
    score matrix); we then posexplode the packed recommendations into
    (user, rec_rank, item, score) rows.
    """
    recs = model.recommendForUserSubset(users.select("user"), k)
    return (
        recs.select(
            "user",
            F.posexplode("recommendations").alias("__pos", "__rec"),
        )
        .select(
            "user",
            (F.col("__pos") + 1).alias("rec_rank"),
            F.col("__rec.item").alias("item"),
            F.col("__rec.rating").cast("double").alias("score"),
        )
    )
