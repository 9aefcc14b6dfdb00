"""Distributed Word2Vec embeddings over the documents corpus (MLlib).

The lexical counterpart of the hashing-trick embedding in
``functions/vectors.py``: where ``hashed_embedding`` is a pure-Column,
training-free featurizer, this module learns dense distributional vectors
with MLlib's skip-gram Word2Vec — the classic "words that co-occur embed
nearby" model, fit as a distributed job.

Scale notes: fit cost is ~(corpus tokens × window × dim) spread over
executors; the learned vocabulary table is |V| × dim floats, which is the
broadcast-sized model artifact (same regime as the unigram/bigram LM tables
in queries/llmdata.py). Scoring (``doc_vectors``) averages word vectors
per document — one map-side transform, no shuffle.
"""

from __future__ import annotations

from pyspark.ml.feature import Word2Vec, Word2VecModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z]+"


def tokenized(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``__tokens``: lowercase alpha tokens (same dialect as the
    tokenization query family)."""
    arr = F.filter(F.split(F.lower(text_col), _TOKEN_SPLIT),
                   lambda t: t != F.lit(""))
    return docs.withColumn("__tokens", arr)


def fit_word2vec(docs: DataFrame, text_col: str = "text",
                 dim: int = 32, window: int = 5, min_count: int = 5,
                 max_iter: int = 1, seed: int = 42) -> Word2VecModel:
    """Fit skip-gram embeddings on ``docs[text_col]``. Deterministic under
    a fixed seed + single fit (MLlib seeds its negative sampling)."""
    w2v = Word2Vec(vectorSize=dim, windowSize=window, minCount=min_count,
                   maxIter=max_iter, seed=seed,
                   inputCol="__tokens", outputCol="__docvec")
    return w2v.fit(tokenized(docs, text_col))


def word_vectors(model: Word2VecModel) -> DataFrame:
    """The learned |V|×dim vocabulary table (word, vector)."""
    return model.getVectors()


def doc_vectors(model: Word2VecModel, docs: DataFrame,
                text_col: str = "text") -> DataFrame:
    """Average-of-word-vectors document embedding — map-side transform."""
    return (model.transform(tokenized(docs, text_col))
            .withColumnRenamed("__docvec", "doc_vec")
            .drop("__tokens"))


def similar_words(model: Word2VecModel, word: str, k: int = 5) -> DataFrame:
    """Top-k nearest vocabulary words by cosine — the embedding sanity
    probe. Runs against the broadcast-sized vocab table."""
    return model.findSynonyms(word, k).select(
        F.lit(word).alias("query"), "word",
        F.round("similarity", 6).alias("similarity"))
