"""Distributed connected components over an edge DataFrame.

Dedup pipelines produce *pairs* (MinHash/SimHash/Jaccard candidates), but
curation needs *clusters*: every document labeled with a canonical
representative so that "keep one per cluster" is a single filter. Pair →
cluster is graph connectivity, and the scale-correct way to compute it on
Spark is the alternating **large-star / small-star** algorithm (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SoCC'14): each round is two shuffle stages of
degree-bounded fan-out, and the edge set converges to per-component stars
in O(log n) rounds (2-3 in practice for near-dup graphs, whose components
are small and dense).

Why not label propagation? Naive min-label flooding needs O(diameter)
rounds — a 100-node chain takes 100 shuffles. Star contraction halves
path lengths every round, so the same chain takes ~7. At 100 TB the edge
set still fits comfortably (pairs are a tiny fraction of the corpus), but
round *count* is the latency driver, so the O(log) algorithm matters.

Iterative-plan hygiene: every round ends in ``localCheckpoint`` — without
it the lineage (and thus the optimizer's input) doubles per round and
planning time explodes exponentially. Convergence is detected with a
constant-size checksum aggregate (count + xor of xxhash64 over the
distinct edges),
not a driver-side collect of the edge set.

Reference parity note: the reference engine has no graph operator (its
dedup is a 10k-entry in-memory set, twitter_producer.py:202-205); this
generalizes its intent — "one row per duplicate group" — to transitive
duplicate groups at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every edge (max, min), drop self-loops and duplicates."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach every strictly-larger neighbor of u to u's minimum neighbor.

    Emits (v, m(u)) for each neighbor v > u, where m(u) = min(N(u) ∪ {u}).
    """
    und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        und.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    )
    # No distinct here: different u can emit the same (v, m) edge, but
    # _small_star's terminal distinct bounds the round's output and its
    # min-aggregate is duplicate-insensitive, so deduping twice per round
    # just adds an exchange. Output stays canonically oriented (m < u < v).
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Attach every smaller-or-equal neighbor of u (and u itself) to m(u).

    Input must be canonically oriented (u > v); then m(u) = min(N(u)).
    """
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    attached = edges.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v"))
    rerooted = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        attached.union(rerooted)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every vertex of the pair graph with its component minimum.

    Returns a DataFrame (node, component) covering every vertex that
    appears in ``edges``; ``component`` is the smallest vertex id in the
    node's connected component (so component roots label themselves).
    Vertices must be orderable (ids); isolated vertices never appear in an
    edge list, so callers wanting singletons left-join this result and
    coalesce to the node's own id.
    """
    # Lazy localCheckpoint + checksum = ONE action per round: the checksum
    # aggregate is the job that materializes the checkpoint, instead of an
    # eager checkpoint job followed by a separate collect. On tiny edge
    # sets (near-dup graphs are pairs-sparse) per-round latency is pure
    # job/stage overhead, so halving the action count halves the round.
    cur = _canonical(edges, src, dst).localCheckpoint(eager=False)
    prev_sig = _checksum(cur)
    if prev_sig[0] == 0:
        return cur.select(
            F.col("u").alias("node"), F.col("v").alias("component"))
    for _ in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    # Fixed point is a star forest: every edge is (member, root).
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(roots)


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 10, damping: float = 0.85) -> DataFrame:
    """PageRank over a directed edge list → (node, rank), Σrank = n.

    The iterative-numeric class of distributed algorithm (vs the
    contraction class of ``connected_components``): each round is one
    groupBy over the join of ranks with the out-degree-weighted edges.
    Dangling nodes' mass is redistributed uniformly each round, keeping
    total rank conserved (the standard correction).

    Same plan hygiene as connected_components: each round ends in an eager
    ``localCheckpoint`` so the lineage (and the optimizer's input) stays
    one-round deep — without it, round k re-analyzes a k-deep plan and the
    job dies of planning time long before data size matters. On a cluster
    use ``checkpoint`` on durable storage for fault tolerance instead.
    """
    from pyspark.sql import functions as F

    out = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (out.select(F.col("u").alias("node"))
             .union(out.select("v")).distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()
    degree = out.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    links = out.join(degree, "u").localCheckpoint(eager=True)
    # the dangling SET is fixed (nodes with no out-edges) — stamp it once;
    # only the mass it holds changes per round
    nodes = nodes.join(
        degree.select(F.col("u").alias("node")), "node", "left_semi"
    ).withColumn("dangling", F.lit(False)).unionByName(
        nodes.join(degree.select(F.col("u").alias("node")), "node",
                   "left_anti").withColumn("dangling", F.lit(True))
    ).localCheckpoint(eager=True)
    ranks = nodes.select("node", "dangling", F.lit(1.0).alias("rank"))
    for it in range(iterations):
        contrib = (
            links.join(ranks, links.u == ranks.node)
            .select("v", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v").agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.filter("dangling")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.v, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "dangling",
                (F.lit(1.0 - damping)
                 + F.lit(damping)
                 * (F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.col("d") / F.lit(float(n)))).alias("rank"),
            )
        )
        # checkpoint every 3rd round: lineage stays shallow while paying
        # 3x fewer materializations than checkpoint-per-round
        if it % 3 == 2 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


# ---------------------------------------------------------------------------
# Label propagation (community detection)
# ---------------------------------------------------------------------------

def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_iter: int = 5) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected edge list: every node adopts the most frequent label among
    its neighbors each round (ties broken by the smaller label — fully
    deterministic, unlike the randomized original). Communities = label
    groups after ``max_iter`` rounds.

    Where connected components answer "which docs are transitively
    near-duplicates" (hard connectivity), LPA answers "which docs cluster
    densely" (soft communities): on a similarity graph it separates
    topical groups even when stray edges connect them — the corpus-mixing
    / topic-balance view of the same pair table.

    Plan per round: symmetrized edges join the |nodes|-row label table on
    the neighbor key (label table broadcasts while it fits; at larger
    |nodes| AQE plans the shuffled join), per-(node,label) counts, top-1
    per node via max_by struct ordering — 2 exchanges per round, lineage
    cut by localCheckpoint (same hygiene as pagerank/components above).
    Synchronous + deterministic ⇒ reproducible across runs/cluster sizes;
    the classic bipartite oscillation is bounded by the fixed round count
    (callers needing convergence detection reuse the checksum idiom of
    connected_components).
    """
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint())
    labels = (und.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint())
    for _ in range(max_iter):
        nbr_labels = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "label"))
        counts = (nbr_labels.groupBy("node", "label")
                  .agg(F.count(F.lit(1)).alias("n")))
        # top-1 label per node: min over (-n, label) — most frequent,
        # smallest label on ties; one aggregate, no window sort. Negating
        # the COUNT (always numeric) instead of the label keeps this
        # correct for string node ids too (negating a string label casts
        # to double => NULL/ANSI error, silently corrupting every round).
        new = (counts.groupBy("node")
               .agg(F.min(F.struct((-F.col("n")).alias("nn"),
                                   F.col("label"))).alias("best"))
               .select("node", F.col("best.label").alias("label")))
        labels = new.localCheckpoint()
    return labels.select("node", "label")
