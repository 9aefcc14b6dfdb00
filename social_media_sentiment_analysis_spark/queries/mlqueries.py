"""MLlib-path registry queries: IVF ANN, MinHashLSH near-dup join, and the
trainable sentiment classifier.

All three involve fitted models (KMeans centroids, LSH hash tables, LR
weights) that DuckDB cannot express, so they are registered rows-only; their
accuracy contracts (recall vs brute force, agreement vs the exact Jaccard
operator, fit quality vs the weak-label teacher) are asserted in
``tests/test_ml.py`` instead. Seeds are fixed so row counts are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.classifier import classify, fit_sentiment_classifier
from ..ml.ivf import assign_clusters, fit_ivf, ivf_topk
from ..ml.lsh import minhash_text_pairs
from ..sources.batch import load_table


_IVF_RECALL_FLOOR = 6        # of 10 — measured 7/9/8 at the three SFs


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with its contract carried into the oracle gate (upgraded
    from rows-only, the r6-verdict-#4 recipe applied to the ANN family):
    KMeans coarse quantizer, probe 4 of 8 cells nearest the query, exact
    cosine rerank within — the approximate path whose pruning is the
    whole point at scale. The gate pins:

    - ``exact_top10_ids``: the EXACT answer (the knn_bruteforce scoring,
      round(cosine,4) DESC then id), sorted — the DuckDB twin recomputes
      it value-for-value;
    - ``full_probe_equals_exact``: probing ALL cells must reproduce the
      exact top-k — a theorem about the IVF machinery (assignment +
      per-cell rerank + global k add no approximation; only pruning
      does), so any bug in the cell pipeline flips it;
    - ``recall_at_10_ok``: the pruned 4-of-8 probe finds ≥
      {_IVF_RECALL_FLOOR}/10 of the exact set (measured 7-9 on the
      fixture; the floor leaves seed/partitioning headroom).

    max_iter=8 on the quantizer: an IVF coarse quantizer needs rough
    Voronoi cells, not converged centroids — recall is governed by
    n_probe and the within-cell exact rerank (FAISS trains its coarse
    quantizers with ~10 iterations for the same reason)."""
    from ..operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    corpus = emb.filter(F.col("vec_id") != 0)
    model = fit_ivf(emb, "embedding", k=8, seed=7, max_iter=8)
    assigned = assign_clusters(corpus, "embedding", model).localCheckpoint()
    ann = ivf_topk(assigned, model, qvec, "embedding", "vec_id",
                   k=10, n_probe=4).localCheckpoint()
    full = ivf_topk(assigned, model, qvec, "embedding", "vec_id",
                    k=10, n_probe=8)
    exact = sim.brute_force_topk(corpus, qvec, "embedding", "vec_id",
                                 k=10).localCheckpoint()
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    # comma-joined string, not an array column: array encodings differ
    # between the two engines' pandas bridges (numpy array vs list), which
    # breaks the driver's repr-based value hash — same serialization
    # convention as inverted_index's postings column
    exact_ids = exact.agg(
        F.array_join(F.sort_array(F.collect_list("vec_id")), ",")
        .alias("exact_top10_ids"))
    fp_mismatch = (full.select("vec_id")
                   .exceptAll(exact.select("vec_id"))
                   .unionAll(exact.select("vec_id")
                             .exceptAll(full.select("vec_id"))))
    fp_eq = fp_mismatch.agg(
        (F.count(F.lit(1)) == 0).alias("full_probe_equals_exact"))
    hits = (ann.join(exact.select("vec_id"), "vec_id", "left_semi")
            .agg((F.count(F.lit(1)) >= _IVF_RECALL_FLOOR)
                 .alias("recall_at_10_ok")))
    # 1-row theorem scalars: broadcast anchors (the dedup_simhash pattern)
    return (n_corpus.crossJoin(F.broadcast(exact_ids))
            .crossJoin(F.broadcast(fp_eq))
            .crossJoin(F.broadcast(hits)))


ORACLE_KNN_IVF = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
    SELECT vec_id,
           round(
             list_sum(list_transform(range(1, len(embedding) + 1),
                      i -> embedding[i]::DOUBLE * qv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))),
           4) AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
), topk AS (
    SELECT vec_id FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
)
SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id <> 0) AS n_corpus,
       (SELECT array_to_string(list_sort(list(vec_id)), ',') FROM topk)
           AS exact_top10_ids,
       TRUE AS full_probe_equals_exact,
       TRUE AS recall_at_10_ok
"""


def q_dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH approxSimilarityJoin near-dup pairs over documents — the
    library twin of dedup_minhash (hand-rolled banding)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        minhash_text_pairs(docs, "text", "doc_id",
                           jaccard_threshold=0.5, num_hash_tables=8)
        .orderBy("a_id", "b_id")
    )


def q_classify_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train TF-IDF + logistic regression on lexicon weak labels, score the
    same corpus, and roll up predicted-label counts (stable small output)."""
    docs = load_table(spark, sf_dir, "documents")
    model = fit_sentiment_classifier(docs, text_col="text",
                                     num_features=1 << 12)
    return (
        classify(model, docs, text_col="text")
        .groupBy("predicted_sentiment")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("predicted_sentiment")
    )


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: KMeans-cluster-pruned cosine
    near-dup groups, min-id keeper per group. Reported per label: corpus
    size, kept size, drop count — the per-stratum audit a curation run
    logs. Rows-only (fitted centroids); the k=1 ≡ brute-force equivalence
    and cross-k recall are pinned in tests/test_ml.py::TestSemDeDup."""
    from ..ml.semdedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    kept = semantic_dedup(emb, "embedding", "vec_id", k=8, threshold=0.97)
    return (
        emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_total"))
        .join(kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept")),
              "label", "left")
        .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)))
        .withColumn("n_dropped", F.col("n_total") - F.col("n_kept"))
        .orderBy("label")
    )


def q_recommend_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS implicit-feedback recommendations: top-3 parts for the five
    lowest-numbered customers with purchase history. Rows-only (factor
    matrices have no SQL twin); fit quality and ranking sanity are pinned
    in tests/test_ml.py::TestALS."""
    from ..ml.recommend import (
        fit_als, purchase_interactions, recommend_for_users,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    inter = purchase_interactions(lineitem, orders).cache()
    model = fit_als(inter)
    users = (inter.select("user").distinct().orderBy("user").limit(5))
    out = recommend_for_users(model, users, k=3)
    inter.unpersist()
    return out.select("user", "rec_rank", "item").orderBy("user", "rec_rank")


# ---------------------------------------------------------------------------
# Negative sampling for recommender / contrastive training
# ---------------------------------------------------------------------------

_NEG_POPULAR = 50   # candidate pool: top-50 most-purchased parts
_NEG_K = 3          # negatives per user
_NEG_USERS = 20     # audit slice: lowest-numbered customers


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-weighted negative sampling — the training-pair generator
    for implicit-feedback recommenders (the ALS model here) and two-tower
    retrieval: for each user, k popular items the user did NOT buy.
    Sampling negatives from the POPULAR pool is the standard correction —
    uniform negatives are too easy and teach the model popularity, not
    preference.

    Determinism: candidate ranking is md5(user, item) — a pure function of
    the pair, so the 'random' draw is stable across runs/engines (same
    recipe as the deterministic samplers). Shape: purchases aggregate once
    (user, item); the candidate pool is a broadcast top-k; the user ×
    candidates expansion is |users| × 50 with the anti-join condition
    applied map-side against the user's own purchase set (collected as an
    array per user — bounded by the pool size after the semi filter).
    """
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    purchases = (
        lineitem.select("l_orderkey", F.col("l_partkey").alias("item"))
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                            F.col("o_custkey").alias("user")),
              "l_orderkey")
        .select("user", "item").distinct()
    )
    pool = (purchases.groupBy("item")
            .agg(F.count(F.lit(1)).alias("buyers"))
            .orderBy(F.desc("buyers"), "item").limit(_NEG_POPULAR)
            .select("item"))
    users = (purchases.select("user").distinct()
             .orderBy("user").limit(_NEG_USERS))
    cand = users.crossJoin(F.broadcast(pool))
    negatives = cand.join(purchases, ["user", "item"], "left_anti")
    w = Window.partitionBy("user").orderBy(
        F.md5(F.concat_ws(",", F.col("user"), F.col("item"))), F.col("item"))
    return (
        negatives.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= _NEG_K)
        .select(F.col("user").cast("long").alias("user"), "neg_rank",
                F.col("item").cast("long").alias("item"))
        .orderBy("user", "neg_rank")
    )


ORACLE_NEGATIVE_SAMPLES = f"""
WITH purchases AS (
    SELECT DISTINCT o.o_custkey AS user, l.l_partkey AS item
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), pool AS (
    SELECT item FROM (
        SELECT item, COUNT(*) AS buyers FROM purchases GROUP BY item
    ) ORDER BY buyers DESC, item LIMIT {_NEG_POPULAR}
), users AS (
    SELECT DISTINCT user FROM purchases ORDER BY user LIMIT {_NEG_USERS}
), cand AS (
    SELECT u.user, p.item FROM users u CROSS JOIN pool p
), negatives AS (
    SELECT c.user, c.item FROM cand c
    ANTI JOIN purchases pu ON c.user = pu.user AND c.item = pu.item
), ranked AS (
    SELECT user, item,
           ROW_NUMBER() OVER (
               PARTITION BY user
               ORDER BY md5(user || ',' || item), item) AS neg_rank
    FROM negatives
)
SELECT CAST(user AS BIGINT) AS user, neg_rank,
       CAST(item AS BIGINT) AS item
FROM ranked WHERE neg_rank <= {_NEG_K}
ORDER BY user, neg_rank
"""


# ---------------------------------------------------------------------------
# Word2Vec distributional embeddings
# ---------------------------------------------------------------------------

def q_word_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit skip-gram Word2Vec on the documents corpus and report the top-5
    nearest-vocabulary neighbors of the corpus's most frequent word —
    the standard embedding sanity probe. Rows-only (learned weights have
    no SQL twin); neighborhood quality is pinned in tests/test_ml.py.
    """
    from ..ml.word2vec import fit_word2vec, similar_words, tokenized

    docs = load_table(spark, sf_dir, "documents")
    top_word = (
        tokenized(docs).select(F.explode("__tokens").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w").limit(1).first()["w"])
    model = fit_word2vec(docs, min_count=5, dim=32)
    return similar_words(model, top_word, k=5)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: per-subspace KMeans codebooks compress
    each embedding to m small codes; top-10 neighbors of vec_id=0 by
    asymmetric distance (broadcast query-to-centroid tables, Column fold
    over the codes — one scan, TakeOrdered). Rows-only (fitted codebooks);
    ADC recall vs exact L2 is pinned in tests/test_ml.py::TestPQ."""
    from ..ml.pq import encode_pq, fit_pq, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = [float(x)
             for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    model = fit_pq(emb, "embedding", m=16, k=16, seed=7)
    encoded = encode_pq(corpus, "embedding", model)
    return pq_topk(encoded, model, query, "vec_id", k=10)
