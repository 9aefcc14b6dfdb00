"""Product quantization (PQ) for embedding compression + ANN scoring.

The third leg of the similarity-search scale path (next to hyperplane LSH
in ``operators/similarity.py`` and IVF in ``ml/ivf.py``), and the one that
attacks STORAGE: a d-dim float vector (d×8 bytes as array<double>) is
encoded as ``m`` small integer codes — one per d/m-dim subspace, each the
id of the nearest of ``k`` learned sub-centroids (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011). With m=8, k=256
a 64-dim embedding becomes 8 bytes: ~64× compression, and approximate
distances are computed WITHOUT decoding.

Spark mapping:
- **fit**: m independent MLlib KMeans fits, each on the corpus projected
  to its subspace slice (``F.slice`` — map-side). Model = m × k × (d/m)
  floats on the driver: broadcast-sized by construction.
- **encode**: m ``model.transform`` passes (JVM, map-side, no shuffle);
  output is an ``array<int>`` codes column — the persisted artifact. At
  100 TB this is the classic "codes table": scan-friendly, cache-friendly,
  and the raw vectors can be tiered to cold storage.
- **query (ADC)**: the query vector is NOT encoded; per subspace a k-entry
  distance table (query-slice → each sub-centroid) is computed driver-side
  and broadcast as an array literal; approximate distance =
  Σ_j table_j[code_j] — pure Column ``element_at`` folds inside
  whole-stage codegen, one map pass + TakeOrdered for top-k.

Recall-vs-bruteforce is asserted in tests/test_ml.py::TestPQ; the exact
reranking pattern (PQ shortlist → exact cosine on the shortlist) composes
with ``brute_force_topk`` unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUB = "__pq_sub"


@dataclass
class PQModel:
    m: int                    # number of subspaces
    sub_dim: int              # dims per subspace
    models: list              # m KMeansModel, one per subspace
    centers: list             # m × k × sub_dim python floats

    @property
    def k(self) -> int:
        return len(self.centers[0])


def fit_pq(df: DataFrame, vec_col: str, m: int = 4, k: int = 16,
           seed: int = 7, sample_fraction: float | None = None,
           max_iter: int = 20) -> PQModel:
    """Fit m per-subspace KMeans codebooks. Dim d must divide by m (checked
    against the first row). Same sampling rationale as ``fit_ivf``."""
    d = len(df.select(vec_col).first()[0])
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    sub_dim = d // m
    train = df if sample_fraction is None else df.sample(
        fraction=sample_fraction, seed=seed)
    models = []
    for j in range(m):
        sl = F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim)
        sub = train.select(array_to_vector(sl).alias(_SUB))
        km = KMeans(featuresCol=_SUB, k=k, seed=seed + j, maxIter=max_iter)
        models.append(km.fit(sub))
    centers = [[[float(x) for x in c] for c in mod.clusterCenters()]
               for mod in models]
    return PQModel(m=m, sub_dim=sub_dim, models=models, centers=centers)


def encode_pq(df: DataFrame, vec_col: str, model: PQModel,
              codes_col: str = "pq_codes") -> DataFrame:
    """Add ``codes_col``: array<int> of length m — each row's per-subspace
    nearest-sub-centroid ids. m JVM map passes, no shuffle; drop the raw
    vector column afterwards for the compressed table."""
    out = df
    code_cols = []
    for j, mod in enumerate(model.models):
        sl = F.slice(F.col(vec_col), j * model.sub_dim + 1, model.sub_dim)
        out = out.withColumn(_SUB, array_to_vector(sl))
        out = (mod.copy().setPredictionCol(f"__pq_{j}")
               .transform(out).drop(_SUB))
        code_cols.append(F.col(f"__pq_{j}").cast("int"))
    return (out.withColumn(codes_col, F.array(*code_cols))
            .drop(*[f"__pq_{j}" for j in range(model.m)]))


def pq_topk(encoded: DataFrame, model: PQModel, query_vec: list[float],
            id_col: str, k: int = 10,
            codes_col: str = "pq_codes") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the codes table: per subspace
    the query's k-entry squared-distance table is a broadcast array
    literal; the approximate distance is a Column fold of element_at
    lookups — whole-stage codegen, one scan, TakeOrdered."""
    tables = []
    for j in range(model.m):
        qs = query_vec[j * model.sub_dim:(j + 1) * model.sub_dim]
        tables.append([
            sum((a - b) ** 2 for a, b in zip(c, qs))
            for c in model.centers[j]
        ])
    dist = None
    for j, table in enumerate(tables):
        arr = F.array(*[F.lit(float(x)) for x in table])
        term = F.element_at(arr, F.col(codes_col)[j] + 1)
        dist = term if dist is None else dist + term
    return (encoded
            .select(F.col(id_col), F.round(dist, 6).alias("adc_dist"))
            .orderBy(F.asc("adc_dist"), F.asc(id_col))
            .limit(k))


def ivfpq_topk(assigned_encoded: DataFrame, ivf_model, pq_model: PQModel,
               query_vec: list[float], id_col: str, k: int = 10,
               n_probe: int = 4, cluster_col: str = "cluster_id",
               codes_col: str = "pq_codes") -> DataFrame:
    """IVF-PQ: the standard production ANN layout (FAISS ``IVFx,PQy``) as a
    composition of the two Spark-side artifacts — coarse cells prune the
    SCAN (partition pruning on ``cluster_col``), PQ codes prune the BYTES
    (ADC over the codes, never decoding vectors). ``assigned_encoded`` is
    a table carrying both columns, i.e. ``encode_pq(assign_clusters(...))``
    written partitioned by cell. Probe cost: n_probe/k_cells of the corpus
    read, m bytes per row scored."""
    from .ivf import _nearest_cells

    cells = _nearest_cells(ivf_model, query_vec, n_probe)
    return pq_topk(
        assigned_encoded.filter(F.col(cluster_col).isin(cells)),
        pq_model, query_vec, id_col, k=k, codes_col=codes_col)
