"""Vector math over array<float> embedding columns as Column expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Python
boundary); everything is computed in double precision with explicit casts so
results are deterministic across engines. For very hot paths a pandas UDF
over numpy matrices can beat this, but at 100 TB the first-order win is
avoiding the Python boundary entirely, which this does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], sequential left-to-right accumulation in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    ))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(|a|·|b|), NULL-safe on zero norms."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_to_query(vec: Column, query_vec: list[float]) -> Column:
    """``cosine_similarity(vec, lit(query_vec))`` with the query's norm
    folded DRIVER-side. Catalyst does not constant-fold higher-order-
    function folds, so the naive form re-runs the query literal's norm
    fold once per corpus ROW — a third of the scan CPU of every
    brute-force/rerank scoring pass for a value that never changes. The
    driver-side fold replays the Column fold's exact IEEE op order
    (left-to-right ``acc + x·x`` in double, then sqrt), so results are
    bit-identical to ``cosine_similarity`` and every oracle twin still
    hash-matches."""
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    acc = 0.0
    for x in query_vec:
        acc += float(x) * float(x)
    return dot(vec, q) / (l2_norm(vec) * F.lit(math.sqrt(acc)))


def hashed_embedding(toks: Column, dim: int = 16) -> Column:
    """Deterministic text featurizer (the 'hashing trick'): token counts
    bucketed by ``xxhash64 % dim``, L2-normalized, as array<double>.

    Pure Column algebra — the embedding-generation stage runs inside
    whole-stage codegen with zero Python crossings, making the full
    text → vector → similarity/dedup pipeline expressible end-to-end in
    one plan. Cost is O(dim · tokens) per row; fine for small dims. A real
    neural encoder slots into the same column contract as an Arrow-batched
    pandas UDF (model per executor), changing no downstream operator.
    """
    # hash each token ONCE (bucket array), then fold the buckets into a
    # dim-sized count array — the per-dimension-filter formulation would
    # recompute xxhash64 per (token, dimension) pair, dim× the hashing work
    buckets = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)))
    counts = F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.transform(
            acc, lambda x, i: F.when(i == b, x + 1.0).otherwise(x)),
    )
    norm = F.sqrt(F.aggregate(
        counts, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(
        counts, lambda x: x / F.greatest(norm, F.lit(1e-12)))
