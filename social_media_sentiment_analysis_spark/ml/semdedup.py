"""SemDeDup — semantic deduplication via cluster-pruned cosine search
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540).

The brute-force embedding near-dup join is O(n²) comparisons; SemDeDup's
observation is that semantic duplicates land in the same KMeans cluster with
overwhelming probability, so the pair search can be restricted to
within-cluster — cost drops to Σ|cluster|², a ~k× reduction for balanced
clusters, and the candidate join becomes a plain equi-join on ``cluster_id``
that Spark shuffles once on the cluster key.

Pipeline (every step an existing primitive of this engine):

1. ``ml.ivf.fit_ivf`` — KMeans on a sample; the model is k × dim floats.
2. ``ml.ivf.assign_clusters`` — map-side nearest-centroid assignment (JVM).
3. ``operators.dedup.embedding_near_duplicates`` blocked on ``cluster_id`` —
   the within-cluster cosine pair join.
4. ``operators.graph.connected_components`` — duplicate groups; the min-id
   member is the canonical keeper (deterministic, engine-independent).

Scale: step 3 is the only super-linear cost and it is bounded by the largest
cluster; raising k shrinks clusters (and recall, slightly — near-dup pairs
straddling a cluster boundary are missed; the k=1 setting recovers exact
brute force, which is the equivalence pinned in tests/test_ml.py).

The reference repo has no embedding surface; engine-extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import embedding_near_duplicates
from ..operators.graph import connected_components
from .ivf import assign_clusters, fit_ivf

_CLUSTER = "__semdedup_cluster"


def semantic_duplicate_pairs(df: DataFrame, vec_col: str, id_col: str,
                             k: int = 16, threshold: float = 0.97,
                             seed: int = 7,
                             sample_fraction: float | None = None) -> DataFrame:
    """Within-cluster cosine near-dup pairs: (a_id, b_id, cosine), a<b.

    ``k=1`` skips clustering entirely (MLlib KMeans requires k≥2) and
    degenerates to the exact all-pairs join — the equivalence baseline.
    """
    if k <= 1:
        assigned = df.withColumn(_CLUSTER, F.lit(0))
    else:
        model = fit_ivf(df, vec_col, k=k, seed=seed,
                        sample_fraction=sample_fraction)
        assigned = assign_clusters(df, vec_col, model, out_col=_CLUSTER)
    return embedding_near_duplicates(
        assigned, vec_col, id_col, block_col=_CLUSTER, threshold=threshold)


def semantic_dedup(df: DataFrame, vec_col: str, id_col: str,
                   k: int = 16, threshold: float = 0.97, seed: int = 7,
                   sample_fraction: float | None = None) -> DataFrame:
    """Drop all but the min-id member of each semantic-duplicate group.

    Returns ``df`` minus the dropped rows (anti-join on the component
    non-roots — the kept set is a pure function of (data, k, seed), no
    randomness at apply time).
    """
    pairs = semantic_duplicate_pairs(
        df, vec_col, id_col, k=k, threshold=threshold, seed=seed,
        sample_fraction=sample_fraction)
    comps = connected_components(pairs)
    drops = (comps.filter(F.col("node") != F.col("component"))
             .select(F.col("node").alias(id_col)))
    return df.join(drops, id_col, "left_anti")
