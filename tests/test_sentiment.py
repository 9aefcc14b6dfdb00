"""Golden tests for the sentiment ensemble (U3) — the reference's exact
constants (sentiment_analysis.py:274-317): weights 0.6/0.4, ±0.1 final
thresholds, 1.2 agreement boost, 1.0 clamp."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.functions.sentiment import (
    ensemble_columns,
    lexicon_scores,
    sentiment_enrich,
)


def _ensemble(spark, vader, textblob):
    df = spark.createDataFrame([(vader, textblob)], ["v", "t"])
    out = df.select(
        *[c.alias(n) for n, c in
          ensemble_columns(F.col("v"), F.col("t")).items()]
    ).collect()[0]
    return out["final_sentiment"], out["confidence_score"], out["combined_score"]


class TestEnsemble:
    """Truth table of the 9 label combinations."""

    @pytest.mark.parametrize("v,t,final,conf", [
        # agreement: confidence = min(|combined|*1.2, 1.0)
        ("positive", "positive", "positive", 1.0),
        ("negative", "negative", "negative", 1.0),
        ("neutral", "neutral", "neutral", 0.0),
        # disagreement: confidence = |combined|
        ("positive", "neutral", "positive", 0.6),
        ("neutral", "positive", "positive", 0.4),
        ("negative", "neutral", "negative", 0.6),
        ("neutral", "negative", "negative", 0.4),
        ("positive", "negative", "positive", pytest.approx(0.2)),
        ("negative", "positive", "negative", pytest.approx(0.2)),
    ])
    def test_truth_table(self, spark, v, t, final, conf):
        got_final, got_conf, _ = _ensemble(spark, v, t)
        assert got_final == final
        assert got_conf == conf

    def test_combined_weights(self, spark):
        _, _, combined = _ensemble(spark, "positive", "neutral")
        assert combined == pytest.approx(0.6)
        _, _, combined = _ensemble(spark, "positive", "negative")
        assert combined == pytest.approx(0.2)


class TestLexiconScores:
    def test_positive_text(self, spark):
        df = spark.createDataFrame([("fast fast big table",)], ["cleaned"])
        row = df.select(
            *[c.alias(n) for n, c in lexicon_scores(F.col("cleaned")).items()]
        ).collect()[0]
        # pos_n=3, neg_n=0, n_tok=4
        assert row["vader_compound"] == pytest.approx(3 / 4)
        assert row["vader_sentiment"] == "positive"
        assert row["textblob_polarity"] == pytest.approx(3 / 5)
        assert row["textblob_sentiment"] == "positive"
        assert row["vader_neutral"] == pytest.approx(1 - 3 / 5)

    def test_empty_text_canonical_neutral(self, spark):
        """U5: empty text → neutral record, compound 0, neutral share 1.0."""
        df = spark.createDataFrame([("",)], ["cleaned"])
        row = df.select(
            *[c.alias(n) for n, c in lexicon_scores(F.col("cleaned")).items()]
        ).collect()[0]
        assert row["vader_compound"] == 0.0
        assert row["vader_sentiment"] == "neutral"
        assert row["vader_neutral"] == 1.0

    def test_threshold_boundaries(self, spark):
        """VADER labels at >=0.05 (inclusive); ensemble/textblob at >0.1."""
        df = spark.createDataFrame([(0.05,), (0.049,), (-0.05,)], "s double")
        from social_media_sentiment_analysis_spark.functions.sentiment import _label_from
        got = [r["l"] for r in
               df.select(_label_from(F.col("s"), 0.05, strict=False).alias("l")).collect()]
        assert got == ["positive", "neutral", "negative"]


class TestEnrichPipeline:
    def test_enrich_adds_all_columns(self, spark):
        df = spark.createDataFrame(
            [("1", "RT @u the fast big run"), ("2", "slow slow small day")],
            ["id", "text"],
        )
        out = sentiment_enrich(df, "text")
        for col in ["cleaned_text", "vader_sentiment", "vader_compound",
                    "textblob_sentiment", "final_sentiment", "confidence_score"]:
            assert col in out.columns
        rows = {r["id"]: r for r in out.collect()}
        assert rows["1"]["final_sentiment"] == "positive"
        assert rows["2"]["final_sentiment"] == "negative"
        assert rows["1"]["cleaned_text"] == "u the fast big run"

    def test_single_codegen_stage(self, spark):
        """The whole clean→score→ensemble pipeline must collapse into one
        projection over the scan — no shuffle, no Python boundary."""
        df = spark.createDataFrame([("1", "fast")], ["id", "text"])
        plan = sentiment_enrich(df, "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
