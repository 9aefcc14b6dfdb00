"""Real-model UDF path (U1/U2): the import gate, and the full Arrow pandas
UDF plumbing exercised with deterministic fake model modules injected into
sys.modules (the real vaderSentiment/textblob aren't installed here). The
fakes are defined as locals so cloudpickle ships them to executors by value
— a test module isn't importable from Spark's Python workers."""

from __future__ import annotations

import sys
import types

import pytest

from social_media_sentiment_analysis_spark.functions.sentiment import (
    vader_textblob_udfs,
)


def test_udfs_gated_behind_import():
    assert "vaderSentiment" not in sys.modules
    with pytest.raises(ImportError):
        vader_textblob_udfs()


def _make_fakes():
    class Sentiment:
        def __init__(self, polarity, subjectivity):
            self.polarity = polarity
            self.subjectivity = subjectivity

    class FakeAnalyzer:
        """Deterministic VADER stand-in: score from 'good'/'bad' counts."""

        def polarity_scores(self, text):
            toks = (text or "").split()
            pos = sum(t == "good" for t in toks)
            neg = sum(t == "bad" for t in toks)
            n = max(len(toks), 1)
            return {"compound": (pos - neg) / n, "pos": pos / n,
                    "neg": neg / n, "neu": 1.0 - (pos + neg) / n}

    class FakeBlob:
        def __init__(self, text):
            self._t = text or ""

        @property
        def sentiment(self):
            toks = self._t.split()
            pos = sum(t == "good" for t in toks)
            neg = sum(t == "bad" for t in toks)
            n = max(len(toks), 1)
            return Sentiment((pos - neg) / n, (pos + neg) / n)

    return FakeAnalyzer, FakeBlob


@pytest.fixture
def fake_models(monkeypatch):
    FakeAnalyzer, FakeBlob = _make_fakes()
    vs = types.ModuleType("vaderSentiment")
    vs_inner = types.ModuleType("vaderSentiment.vaderSentiment")
    vs_inner.SentimentIntensityAnalyzer = FakeAnalyzer
    vs.vaderSentiment = vs_inner
    tb = types.ModuleType("textblob")
    tb.TextBlob = FakeBlob
    monkeypatch.setitem(sys.modules, "vaderSentiment", vs)
    monkeypatch.setitem(sys.modules, "vaderSentiment.vaderSentiment", vs_inner)
    monkeypatch.setitem(sys.modules, "textblob", tb)


def test_pandas_udf_pipeline_with_fake_models(spark, fake_models):
    from pyspark.sql import functions as F

    vader_udf, textblob_udf = vader_textblob_udfs()
    df = spark.createDataFrame(
        [("good good day",), ("bad outcome",), ("",), (None,)], "t string")
    rows = df.select(
        vader_udf(F.col("t")).alias("v"),
        textblob_udf(F.col("t")).alias("b"),
    ).collect()
    v0, b0 = rows[0].v, rows[0].b
    assert v0["compound"] == pytest.approx(2 / 3)
    assert v0["pos"] == pytest.approx(2 / 3)
    assert b0["polarity"] == pytest.approx(2 / 3)
    assert b0["subjectivity"] == pytest.approx(2 / 3)
    assert rows[1].v["compound"] == pytest.approx(-0.5)
    # empty/None → the reference's neutral fallback shape
    for r in rows[2:]:
        assert r.v["compound"] == 0.0 and r.b["polarity"] == 0.0
