"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force top-k**: cosine against a (broadcast) query vector over the
  full corpus, `orderBy(desc(sim)).limit(k)` → TakeOrderedAndProject. Exact;
  linear scan — the baseline, and correct at any scale (it's one pass,
  map-side compute, k-sized result).
- **LSH-bucketed ANN (random hyperplanes)**: each vector gets a b-bit sign
  bucket from b fixed pseudo-random hyperplanes; search only probes the
  query's bucket (optionally + 1-bit-flip neighbor buckets). At 100 TB the
  bucket column is precomputed at ingest and the table is partitioned /
  clustered by it, so a probe reads a tiny fraction of the data. This is
  IVF-style partition pruning expressed in plain Spark.

Hyperplanes are deterministic: component h[j] of plane i is ±1 derived from
md5(i,j) — fixed across runs, no RNG state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, cosine_to_query


def brute_force_topk(df: DataFrame, query_vec: list[float], vec_col: str,
                     id_col: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is inlined as an array literal → the comparison is a
    map-side Column expression; no join, no shuffle; the top-k is a
    TakeOrderedAndProject (per-partition heaps + k-row merge)."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query_vec), 4)
            .alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane(i: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane: component j = sign bit of md5(i || j)."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{i}:{j}".encode()).digest()
        out.append(1 if h[0] & 1 else -1)
    return out


def hyperplane_bucket(vec_col: Column, dim: int, bits: int = 8,
                      plane_offset: int = 0) -> Column:
    """b-bit LSH bucket id: bit i = sign of <v, h_{plane_offset+i}> for
    fixed ±1 planes. Pure Column expression (aggregate over the array),
    map-side only. ``plane_offset`` selects an independent plane family —
    band j of a multiband scheme passes ``plane_offset=j*bits`` so no two
    bands share a hyperplane."""
    bucket = F.lit(0)
    for i in range(bits):
        plane = _hyperplane(plane_offset + i, dim)
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(c)) for c in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def banded_projection(df: DataFrame, vec_col: str, id_col: str,
                      dim: int, bands: int, band_bits: int) -> DataFrame:
    """The (id, band, val) banded-LSH projection of a vector table — every
    row fans out to ``bands`` rows, where ``val`` is the ``band_bits``-bit
    sign bucket of band j's hyperplanes (plane family j*band_bits ..
    j*band_bits+band_bits-1, the same md5-derived ±1 planes as
    ``hyperplane_bucket``).

    Computed as ONE ``mapInArrow`` matmul per Arrow batch (vectors ×
    plane matrix, then a sign test) instead of bands × band_bits
    per-element ``aggregate``/``zip_with`` folds: Spark's higher-order
    functions are CodegenFallback — interpreted per element — and the r9
    profiling measured the fold-built projection as a ~1.1 s single-task
    stage at sf0.1 (2k vectors × 16 planes × 64 dims) plus ~1 s of
    driver-side Column-tree construction; the matmul form is one Python
    crossing of (id, vec) and milliseconds of BLAS (guide §4.2).

    Bucket ids are IDENTICAL to the fold's by the measured margin
    argument (queries/llmdata.py): every |plane dot| on this corpus is
    ≥1e-4 at all three SFs, while pairwise-vs-sequential float64
    summation over 64 terms differs by ≲1e-13 — nine orders below the
    sign decision, so the ``> 0`` test can never diverge. The DuckDB
    oracle twins replay the same planes and keep hash-matching
    (re-verified at all three SFs for every consumer of this operator).
    """
    planes = [_hyperplane(j, dim) for j in range(bands * band_bits)]
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, band int, val int"

    def project(batches):
        import numpy as np
        import pyarrow as pa

        p = np.asarray(planes, dtype=np.float64).T   # dim × (bands·bits)
        weights = (1 << np.arange(band_bits)).astype(np.int32)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0)
            flat = np.asarray(batch.column(1).flatten(), dtype=np.float64)
            signs = (flat.reshape(n, dim) @ p) > 0           # n × (b·r)
            vals = signs.reshape(n, bands, band_bits) @ weights  # n × b
            idx = np.repeat(np.arange(n), bands)
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(idx)),
                 pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                 pa.array(vals.ravel().astype(np.int32))],
                names=[id_col, "band", "val"])

    return df.select(id_col, vec_col).mapInArrow(project, out_schema)


def multiband_lsh_pairs(df: DataFrame, vec_col: str, id_col: str,
                        dim: int, bands: int = 8, band_bits: int = 2,
                        threshold: float = 0.95) -> DataFrame:
    """High-recall embedding near-dup candidates via OR-of-bands
    hyperplane LSH — the MinHash-banding construction transplanted to
    cosine space, and the recall fix for single-block LSH dedup: a pair
    is a candidate if it collides in ANY of ``bands`` independent
    ``band_bits``-bit sign buckets, so candidate recall for a pair at
    angle θ is 1 − (1 − p^r)^b with p = 1 − θ/π, r = band_bits,
    b = bands — e.g. ≈0.98 at cosine 0.35 with r=2, b=8, versus ≈0.14
    for one 4-bit block. Every candidate is then EXACT-cosine verified
    (one Arrow-vectorized dot per pair against a broadcast vector matrix —
    ``pair_cosine_lookup``, bit-identical to the Column fold), so precision
    is exact and only recall is probabilistic; bands are deterministic
    (md5 planes), so so is the output.

    Plan shape, scale-first: the corpus is scanned once, each row
    fanning out to ``bands`` (band, val) rows map-side; candidates come
    from an equi-self-join on (band, val) — cost Σ_buckets |bucket|²
    per band, never all-pairs — deduped to distinct id pairs BEFORE the
    verify join, so a pair colliding in many bands is verified once.
    At 100 TB the banded projection is materialized at ingest and
    bucketed by (band, val); the dials are r (bucket size) and b
    (recall), the same trade the MinHash sink family documents.

    Economics of the dials, stated honestly: a BACKGROUND (dissimilar)
    pair collides in one r-bit band with probability ≈ 2^{-r} (exactly
    Σ shares² of the band's bucket distribution), so candidate volume is
    ≈ b·2^{-r}·n²/2 — r must GROW with corpus size for the join to
    prune. At a true near-dup operating point (cosine ≥ 0.95, p ≈ 0.90)
    r=16, b=8 keeps recall ≈ 0.84 while passing ~2^-13 of background
    pairs; the registry gate's r=2, b=8 is instead tuned to its
    corpus's 0.35–0.47 cosine band (70° apart — not near-dups; no r
    prunes hard there while keeping them), where it measures 0.96–0.99
    recall but passes ~90% of background pairs — a recall demonstration
    on gate-sized data, not the 100 TB operating point. Pick r from
    your threshold via p = 1 − arccos(t)/π, then b for target recall
    1 − (1 − p^r)^b.
    """
    from ..functions.vectors import pair_cosine_lookup

    # Spread the banded rows across the session's shuffle partitions BEFORE
    # the self-join: the join's OUTPUT fans out ~b·2^{-r}·n² rows, so task
    # count must follow the output, not the (tiny, 16-byte-row) input — a
    # single-file scan otherwise leaves the whole collision stream in ONE
    # task (broadcast join inherits the probe side's partitioning, and AQE
    # would coalesce a keyless exchange of a few hundred KB right back to
    # one partition; the explicit count is respected). This is the same
    # (band, val) clustering the 100 TB layout materializes at ingest.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    banded = (banded_projection(df, vec_col, id_col, dim, bands, band_bits)
              .repartition(n_parts, "band", "val"))
    cand = (
        banded.toDF("a_id", "band", "val")
        .join(banded.toDF("b_id", "band2", "val2"),
              (F.col("band") == F.col("band2"))
              & (F.col("val") == F.col("val2"))
              & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id").distinct()
    )
    # exact-cosine verify WITHOUT attaching vectors to the 16-byte pair
    # stream: pair_cosine_lookup broadcasts the (small-side) vector matrix
    # and computes each cosine as a vectorized per-dim gather — bit-identical
    # to the Column fold, join-attach fallback above its size guard
    # (functions/vectors.py). round/threshold stay in Column space so the
    # cut happens on the same JVM-rounded value.
    return (pair_cosine_lookup(cand, df, id_col, vec_col, "a_id", "b_id")
            .withColumn("cosine", F.round(F.col("cosine"), 4))
            .filter(F.col("cosine") >= threshold)
            .select("a_id", "b_id", "cosine"))


def ann_topk(df: DataFrame, query_vec: list[float], vec_col: str, id_col: str,
             k: int = 10, dim: int | None = None, bits: int = 6,
             probe_hamming: int = 2) -> DataFrame:
    """Approximate top-k: restrict the scan to hyperplane buckets within
    hamming distance ``probe_hamming`` of the query's bucket (multi-probe
    LSH), then exact cosine rank inside the probed set.

    Recall/cost dial: probed fraction ≈ Σ_{i≤h} C(bits,i) / 2^bits
    (bits=6, h=2 → 22/64 ≈ 34% of the corpus). At scale the bucket column is
    materialized at ingest and the table partitioned by it, so the probe is
    partition pruning, not a filter over a full scan.
    """
    from itertools import combinations

    dim = dim or len(query_vec)
    # query bucket computed driver-side with the same planes
    qb = 0
    for i in range(bits):
        plane = _hyperplane(i, dim)
        if sum(p * float(x) for p, x in zip(plane, query_vec)) > 0:
            qb |= 1 << i
    buckets = [qb]
    for h in range(1, probe_hamming + 1):
        for flips in combinations(range(bits), h):
            b = qb
            for i in flips:
                b ^= 1 << i
            buckets.append(b)
    return (
        df.withColumn("bucket", hyperplane_bucket(F.col(vec_col), dim, bits))
        .filter(F.col("bucket").isin(buckets))
        .select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query_vec), 4)
            .alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pairwise_topk_join(left: DataFrame, right: DataFrame, vec_col: str,
                       left_id: str, right_id: str, k: int = 5,
                       bits: int = 6, probe_hamming: int = 2,
                       dim: int | None = None) -> DataFrame:
    """For each left row, its k nearest right rows — multi-probe LSH join
    then windowed rank. The all-pairs fallback of vector search engines,
    kept bucket-local so the join is Σ|bucket|² not |corpus|².

    Each left row probes every bucket within hamming distance
    ``probe_hamming`` of its own (explode of a precomputed flip-mask array —
    the same recall/cost dial as ``ann_topk``, expressed as an equi-join
    key). Right rows stay single-bucket, so only the small/query side
    fans out (by Σ_{i≤h} C(bits,i) rows).

    Pass ``dim`` (the embedding dimension, as ``ann_topk`` takes it) to
    keep construction fully lazy; when omitted it is inferred with one
    small eager probe of ``right``, which fails loudly on an empty input.
    """
    from itertools import combinations

    from pyspark.sql import Window

    masks = [0]
    for h in range(1, probe_hamming + 1):
        for flips in combinations(range(bits), h):
            m = 0
            for i in flips:
                m |= 1 << i
            masks.append(m)
    if dim is None:
        probe = right.select(F.size(F.col(vec_col))).first()
        if probe is None:
            raise ValueError(
                "pairwise_topk_join: cannot infer the vector dimension "
                "from an empty right DataFrame — pass dim= explicitly")
        dim = probe[0]
    base = hyperplane_bucket(F.col(vec_col), dim, bits)
    lb = left.withColumn(
        "bucket",
        F.explode(F.array(*[base.bitwiseXOR(F.lit(m)) for m in masks])))
    rb = right.withColumn("bucket", base)
    l = lb.toDF(*[f"l_{c}" if c != "bucket" else c for c in lb.columns])
    r = rb.toDF(*[f"r_{c}" if c != "bucket" else c for c in rb.columns])
    sim = cosine_similarity(F.col(f"l_{vec_col}"), F.col(f"r_{vec_col}"))
    w = Window.partitionBy(f"l_{left_id}").orderBy(
        F.desc("cosine"), F.asc(f"r_{right_id}"))
    return (
        l.join(r, "bucket")
        .filter(F.col(f"l_{left_id}") != F.col(f"r_{right_id}"))
        .withColumn("cosine", F.round(sim, 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(f"l_{left_id}").alias("query_id"),
                F.col(f"r_{right_id}").alias("neighbor_id"),
                "cosine", "rank")
    )


def brute_force_topk_pandas(df: DataFrame, query_vec: list[float],
                            vec_col: str, id_col: str,
                            k: int = 10) -> DataFrame:
    """Arrow-vectorized twin of ``brute_force_topk``: cosine computed as a
    numpy matrix product per Arrow batch inside ``mapInPandas``, followed
    by the same TakeOrderedAndProject top-k.

    Same results (same IEEE op order per element, rounded to 4), different
    execution: the Column form stays in whole-stage codegen (zero Python);
    this form pays one Python crossing per batch but multiplies the whole
    batch against the query in one BLAS call — it wins when dimensions are
    wide (hundreds+) where per-element codegen arithmetic beats BLAS no
    longer. Benchmark both at your dimensionality; keep the Column form as
    the default.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def score(batches):
        for pdf in batches:
            m = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "cosine": np.round(sims, 4)})

    return (
        df.select(id_col, vec_col)
        .mapInPandas(score, schema=f"{id_col} long, cosine double")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def brute_force_topk_arrow(df: DataFrame, query_vec: list[float],
                           vec_col: str, id_col: str,
                           k: int = 10) -> DataFrame:
    """``mapInArrow`` twin of the pandas kNN: operates directly on pyarrow
    RecordBatches — no pandas materialization, so the per-batch overhead is
    one FixedSize/ListArray→numpy view instead of a pandas Block build.
    The lowest-overhead Python crossing Spark offers; same IEEE op order
    and top-k as the Column and pandas forms (pinned equal in tests).
    """
    import numpy as np
    import pyarrow as pa

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    out_schema = f"{id_col} long, cosine double"

    def score(batches):
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            vecs = batch.column(batch.schema.get_field_index(vec_col))
            m = np.stack([np.asarray(v.values, dtype=np.float64)
                          for v in vecs])
            sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(np.round(sims, 4), type=pa.float64())],
                names=[id_col, "cosine"])

    return (
        df.select(id_col, vec_col)
        .mapInArrow(score, schema=out_schema)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
