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


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 neighbors of vec_id=0: KMeans coarse quantizer,
    probe the 4 of 8 cells nearest the query, exact cosine rerank within.
    Same query convention as knn_bruteforce/knn_ann (vec_id=0 excluded)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    corpus = emb.filter(F.col("vec_id") != 0)
    model = fit_ivf(emb, "embedding", k=8, seed=7)
    assigned = assign_clusters(corpus, "embedding", model)
    return ivf_topk(assigned, model, qvec, "embedding", "vec_id",
                    k=10, n_probe=4)


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
