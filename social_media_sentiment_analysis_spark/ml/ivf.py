"""IVF (inverted-file) approximate nearest-neighbor search on MLlib KMeans.

The "IVF variant as the scale path" for similarity search, complementing the
hyperplane-LSH ANN in ``operators/similarity.py``:

- **build**: fit KMeans on a sample of the corpus — the driver holds only
  k × dim centroid floats — then assign every vector its nearest-centroid id
  with ``model.transform``: JVM-side, one map pass, no shuffle. At 100 TB
  the assigned table is written **partitioned by cluster_id**
  (``sources/layout.py``), so the index IS the table layout and rebuilding
  it is a single scan + partitioned write.
- **probe**: rank the k centroids against the query vector driver-side
  (k × dim floats — trivially small), take the ``n_probe`` nearest cells,
  and scan only those. On a partitioned table that is partition pruning —
  the probe reads n_probe/k of the corpus; locally it is an ``isin`` filter.
  Exact cosine ranks the survivors (TakeOrderedAndProject → k rows).

Recall/cost dial: n_probe/k of the corpus is scanned (k=16, n_probe=4 →
25 %). Recall-vs-bruteforce is asserted in ``tests/test_ml.py``.

The reference repo has no vector search; this is engine-extension surface
(BASELINE.json north star: "Structured Streaming + Kafka + MLlib").
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_to_query

_FEATURES = "__ivf_features"


def fit_ivf(df: DataFrame, vec_col: str, k: int = 16, seed: int = 7,
            sample_fraction: float | None = None,
            max_iter: int = 20) -> KMeansModel:
    """Fit the coarse quantizer. ``sample_fraction`` bounds the training
    scan at scale (KMeans iterates; training on a 1-10% sample costs a
    fraction of a full pass and centroid quality is statistically identical
    for k ≪ n)."""
    train = df if sample_fraction is None else df.sample(
        fraction=sample_fraction, seed=seed)
    train = train.select(array_to_vector(F.col(vec_col)).alias(_FEATURES))
    km = KMeans(featuresCol=_FEATURES, k=k, seed=seed, maxIter=max_iter)
    return km.fit(train)


def assign_clusters(df: DataFrame, vec_col: str, model: KMeansModel,
                    out_col: str = "cluster_id") -> DataFrame:
    """Add each row's nearest-centroid id — ``model.transform`` runs in the
    JVM, map-side only. Write the result partitioned by ``out_col`` to make
    probes partition-pruned reads."""
    with_vec = df.withColumn(_FEATURES, array_to_vector(F.col(vec_col)))
    assigned = (
        model.copy()
        .setPredictionCol(out_col)
        .transform(with_vec)
        .drop(_FEATURES)
    )
    return assigned.withColumn(out_col, F.col(out_col).cast("int"))


def _nearest_cells(model: KMeansModel, query_vec: list[float],
                   n_probe: int) -> list[int]:
    """Driver-side centroid ranking — k × dim floats, no Spark job."""
    def sq_dist(c) -> float:
        return sum((float(a) - float(b)) ** 2 for a, b in zip(c, query_vec))

    centers = model.clusterCenters()
    order = sorted(range(len(centers)), key=lambda i: (sq_dist(centers[i]), i))
    return order[:max(1, min(n_probe, len(centers)))]


def ivf_topk(assigned: DataFrame, model: KMeansModel, query_vec: list[float],
             vec_col: str, id_col: str, k: int = 10, n_probe: int = 4,
             cluster_col: str = "cluster_id") -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` cells nearest the query,
    exact cosine rank within. ``assigned`` is the output of
    ``assign_clusters`` (or a table already laid out by cluster_id)."""
    cells = _nearest_cells(model, query_vec, n_probe)
    return (
        assigned.filter(F.col(cluster_col).isin(cells))
        .select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query_vec), 4)
            .alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
