"""MLlib LSH similarity joins — the library path for near-duplicate pairs.

Two wrappers over ``pyspark.ml.feature``:

- ``minhash_text_pairs``: word-shingles → binary HashingTF → ``MinHashLSH``
  ``approxSimilarityJoin`` on Jaccard distance. The candidate join is
  hash-bucket co-partitioned (shuffle on hash values, never all-pairs), the
  same banding idea as ``operators/dedup.py::minhash_near_duplicates`` but
  with MLlib's AND-OR amplification and distance estimation.
- ``brp_embedding_pairs``: L2-normalize → ``BucketedRandomProjectionLSH``
  ``approxSimilarityJoin`` on Euclidean distance. On unit vectors
  ``d² = 2·(1 − cos)``, so a cosine threshold t maps to a distance threshold
  ``sqrt(2·(1−t))`` exactly — we convert back and report cosine.

Scale notes: both joins shuffle only on (hash-table, bucket) keys, so cost is
Σ|bucket|² per table, not |corpus|²; ``num_hash_tables`` is the recall dial
(more tables → more candidate buckets → higher recall, linearly more work).
Agreement with the exact Column-expression operators is asserted in
``tests/test_ml.py``.
"""

from __future__ import annotations

import math

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles

_FEATURES = "__lsh_features"


def minhash_text_pairs(df: DataFrame, text_col: str, id_col: str,
                       jaccard_threshold: float = 0.5,
                       shingle_k: int = 3,
                       num_hash_tables: int = 5,
                       num_features: int = 1 << 18,
                       seed: int = 7) -> DataFrame:
    """Near-duplicate (a_id, b_id, jaccard_sim) pairs with estimated
    shingle-Jaccard ≥ threshold. Rows whose text yields zero shingle features
    are dropped (MinHashLSH requires ≥1 non-zero entry)."""
    tf = HashingTF(inputCol="__shingles", outputCol=_FEATURES,
                   numFeatures=num_features, binary=True)
    # size(__shingles) > 0 guarantees >=1 non-zero HashingTF entry, which
    # MinHashLSH requires
    featured = tf.transform(
        df.select(F.col(id_col), shingles(F.col(text_col), shingle_k)
                  .alias("__shingles"))
        .filter(F.size("__shingles") > 0)
    )

    mh = MinHashLSH(inputCol=_FEATURES, outputCol="__hashes",
                    numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(featured)
    pairs = model.approxSimilarityJoin(
        featured, featured, 1.0 - jaccard_threshold, distCol="__jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round(1.0 - F.col("__jaccard_dist"), 4).alias("jaccard_sim"),
        )
        .filter(F.col("a_id") < F.col("b_id"))
    )


def brp_embedding_pairs(df: DataFrame, vec_col: str, id_col: str,
                        cosine_threshold: float = 0.95,
                        bucket_length: float = 0.5,
                        num_hash_tables: int = 4,
                        seed: int = 7) -> DataFrame:
    """Near-duplicate (a_id, b_id, cosine) pairs with cosine ≥ threshold,
    found via Euclidean LSH on L2-normalized vectors."""
    from ..functions.vectors import l2_norm

    dist_threshold = math.sqrt(max(0.0, 2.0 * (1.0 - cosine_threshold)))
    # stage the norm as a column so it is computed once, not per-component
    staged = df.withColumn("__norm", l2_norm(F.col(vec_col))).filter(
        F.col("__norm") > 0)
    featured = staged.select(
        F.col(id_col),
        array_to_vector(
            F.transform(F.col(vec_col),
                        lambda x: x.cast("double") / F.col("__norm"))
        ).alias(_FEATURES),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol=_FEATURES, outputCol="__hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed)
    model = brp.fit(featured)
    pairs = model.approxSimilarityJoin(
        featured, featured, dist_threshold, distCol="__euclid")
    cosine = 1.0 - (F.col("__euclid") * F.col("__euclid")) / 2.0
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round(cosine, 4).alias("cosine"),
        )
        .filter(F.col("a_id") < F.col("b_id"))
    )
