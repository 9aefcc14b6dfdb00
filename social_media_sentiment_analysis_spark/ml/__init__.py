"""MLlib-backed components: IVF vector index (KMeans), LSH similarity joins
(MinHashLSH / BucketedRandomProjectionLSH), and a trainable TF-IDF sentiment
classifier pipeline.

These are the Spark-ML counterparts of the hand-rolled Column-expression
operators in ``operators/`` — the BASELINE north star names
"Structured Streaming + Kafka + MLlib" as the target stack, so both paths
exist: the Column path is oracle-verifiable (DuckDB twin), the MLlib path is
the idiomatic library route with distributed fit/transform.
"""

from .ivf import assign_clusters, fit_ivf, ivf_topk
from .lsh import brp_embedding_pairs, minhash_text_pairs
from .classifier import classify, fit_sentiment_classifier, sentiment_pipeline
from .semdedup import semantic_dedup, semantic_duplicate_pairs
from .recommend import fit_als, purchase_interactions, recommend_for_users
from .word2vec import doc_vectors, fit_word2vec, similar_words, word_vectors
from .pq import PQModel, encode_pq, fit_pq, pq_topk

__all__ = [
    "PQModel",
    "encode_pq",
    "fit_pq",
    "pq_topk",
    "doc_vectors",
    "fit_word2vec",
    "similar_words",
    "word_vectors",
    "fit_als",
    "purchase_interactions",
    "recommend_for_users",
    "semantic_dedup",
    "semantic_duplicate_pairs",
    "assign_clusters",
    "fit_ivf",
    "ivf_topk",
    "brp_embedding_pairs",
    "minhash_text_pairs",
    "classify",
    "fit_sentiment_classifier",
    "sentiment_pipeline",
]
