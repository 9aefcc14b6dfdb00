"""Trainable sentiment classifier: TF-IDF → multinomial logistic regression.

The reference scores sentiment with fixed third-party models
(sentiment_analysis.py:218-272) — it never trains anything. An engine
positioned as "Structured Streaming + Kafka + MLlib" should also own the
train/score loop, so this module provides the standard distributed text
classification pipeline:

    RegexTokenizer → HashingTF → IDF → LogisticRegression (multinomial)

- **Weak supervision**: labels come from the deterministic lexicon ensemble
  (``functions/sentiment.py``) — the same noisy-teacher → student-model
  pattern used to bootstrap classifiers for LLM-data quality filtering.
- **Scale**: fit is a handful of distributed passes (IDF one pass, LBFGS
  ~dozens); transform is map-side only, so scoring 100 TB is one
  embarrassingly-parallel scan. HashingTF avoids a driver-side vocabulary
  (no CountVectorizer broadcast that grows with corpus size).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sentiment import sentiment_enrich

# fixed label index — no StringIndexer, so the mapping never depends on data
LABELS = ["negative", "neutral", "positive"]
_LABEL_TO_IDX = {name: float(i) for i, name in enumerate(LABELS)}


def sentiment_pipeline(num_features: int = 1 << 14,
                       reg_param: float = 0.001,
                       max_iter: int = 50) -> Pipeline:
    tok = RegexTokenizer(inputCol="text", outputCol="__tokens",
                         pattern=r"\W+", toLowercase=True, minTokenLength=1)
    tf = HashingTF(inputCol="__tokens", outputCol="__tf",
                   numFeatures=num_features)
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(featuresCol="__features", labelCol="label",
                            predictionCol="prediction",
                            family="multinomial", regParam=reg_param,
                            maxIter=max_iter)
    return Pipeline(stages=[tok, tf, idf, lr])


def weak_labels(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``label`` (0/1/2) from the deterministic lexicon ensemble —
    pure Column expressions, no Python boundary."""
    enriched = sentiment_enrich(df, text_col=text_col)
    mapping = F.create_map(
        *[x for name, idx in _LABEL_TO_IDX.items()
          for x in (F.lit(name), F.lit(idx))])
    return enriched.withColumn(
        "label", mapping[F.col("final_sentiment")]).select(
        *df.columns, "label")


def fit_sentiment_classifier(df: DataFrame, text_col: str = "text",
                             **pipeline_kwargs) -> PipelineModel:
    """Fit on lexicon weak labels over ``df[text_col]``."""
    train = weak_labels(df, text_col=text_col)
    if text_col != "text":
        train = train.withColumn("text", F.col(text_col))
    return sentiment_pipeline(**pipeline_kwargs).fit(train)


def classify(model: PipelineModel, df: DataFrame,
             text_col: str = "text") -> DataFrame:
    """Score; adds ``predicted_sentiment`` (string label). Map-side only."""
    scored_in = df if text_col == "text" else df.withColumn(
        "text", F.col(text_col))
    label_arr = F.array(*[F.lit(x) for x in LABELS])
    scored = model.transform(scored_in)
    return scored.withColumn(
        "predicted_sentiment",
        label_arr[F.col("prediction").cast("int")],
    ).drop("__tokens", "__tf", "__features", "rawPrediction",
           "probability", "prediction")
