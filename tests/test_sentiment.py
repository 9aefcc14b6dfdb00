"""Golden tests for the sentiment pipeline: the ensemble (U3) with the
reference's exact constants (sentiment_analysis.py:274-317), the valence
lexicon model (U1/U2 stand-in), and the equivalence of the Arrow-UDF and
relational scoring plans."""

from __future__ import annotations

import csv
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.functions.lexicon_data import (
    BASE_VALENCES,
    LEXICON,
    normalize_token,
    score_tokens,
)
from social_media_sentiment_analysis_spark.functions.sentiment import (
    ensemble_columns,
    sentiment_enrich,
    sentiment_enrich_relational,
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


class TestLexicon:
    def test_scale_and_content(self):
        """A real lexicon, not a demo list: thousands of entries, both
        polarities well represented, valences integer in [-5, 5]."""
        assert len(LEXICON) > 4000
        assert sum(1 for v in LEXICON.values() if v > 0) > 1000
        assert sum(1 for v in LEXICON.values() if v < 0) > 1500
        assert all(isinstance(v, int) and -5 <= v <= 5 and v != 0
                   for v in LEXICON.values())
        for word, expected_sign in [("excellent", 1), ("love", 1),
                                    ("awful", -1), ("terrible", -1),
                                    ("catastrophic", -1), ("okay", 1)]:
            assert LEXICON[word] * expected_sign > 0

    def test_csv_artifact_matches_module(self):
        """The checked-in CSV (what the DuckDB oracle reads) must equal the
        module dict (what the Spark paths use) row for row."""
        path = (Path(__file__).parent.parent
                / "social_media_sentiment_analysis_spark" / "data"
                / "sentiment_lexicon.csv")
        with open(path, newline="") as f:
            rows = list(csv.DictReader(f))
        assert {r["word"]: int(r["valence"]) for r in rows} == LEXICON
        assert [r["word"] for r in rows] == sorted(LEXICON)

    def test_normalize_token(self):
        assert normalize_token("Don't!") == "dont"
        assert normalize_token("(Amazing)") == "amazing"
        assert normalize_token("...") == ""
        assert normalize_token("It’s") == "its"

    @pytest.mark.parametrize("text,expected", [
        ("I love this amazing product!", (7, 2, 0)),
        ("This is terribel and awful.", (-3, 0, 1)),      # typo -> no hit
        ("It's okay, nothing special.", (-1, 1, 1)),      # negation flip
        ("Best day ever! So excited!", (7, 2, 0)),        # booster step
        ("not bad at all", (3, 1, 0)),                    # flipped negative
        ("", (0, 0, 0)),
    ])
    def test_score_tokens(self, text, expected):
        assert score_tokens(text.split(" ")) == expected


class TestGoldenReferenceTexts:
    """The reference's own smoke texts (test_setup.py:102-107) through the
    full pipeline — labels must match what VADER/TextBlob produce on them
    (clearly positive / clearly negative / not-positive / clearly positive).
    """

    TEXTS = [
        ("1", "I love this amazing product!"),
        ("2", "This is terribel and awful."),
        ("3", "It's okay, nothing special."),
        ("4", "Best day ever! So excited!"),
    ]

    def test_labels(self, spark):
        df = spark.createDataFrame(self.TEXTS, ["id", "text"])
        rows = {r["id"]: r for r in sentiment_enrich(df, "text").collect()}
        assert rows["1"]["final_sentiment"] == "positive"
        assert rows["1"]["vader_sentiment"] == "positive"
        assert rows["1"]["vader_compound"] == pytest.approx(0.875)
        assert rows["2"]["final_sentiment"] == "negative"
        assert rows["2"]["vader_sentiment"] == "negative"
        # "nothing special" is VADER-negated — must NOT read as positive
        assert rows["3"]["final_sentiment"] != "positive"
        assert rows["4"]["final_sentiment"] == "positive"
        assert rows["4"]["confidence_score"] == 1.0


class TestGoldenCorpus:
    """24-text labeled golden corpus (r3 verdict #4) spanning every scoring
    feature the reference exercises (sentiment_analysis.py:218-317):
    negation flips, boosters, all-caps, emoticons, empty/whitespace,
    neutral prose, balanced polarity, RT/mention/URL cleaning, unicode
    apostrophes/ellipsis. Each row pins the exact integer lexicon sums
    (s, pos_n, neg_n), all three labels, and the confidence — and BOTH
    scoring plans (Arrow UDF and pure-JVM relational) must reproduce them
    byte-equal."""

    # (doc_id, text, (s, pos_n, neg_n), vader, textblob, final, confidence)
    GOLDEN = [
        (1, "I love this amazing product!", (7, 2, 0),
         "positive", "positive", "positive", 1.0),
        (2, "This is terribel and awful.", (-3, 0, 1),   # typo -> no hit
         "negative", "negative", "negative", 1.0),
        (3, "It's okay, nothing special.", (-1, 1, 1),   # negated 'special'
         "negative", "neutral", "negative", 0.6),
        (4, "Best day ever! So excited!", (7, 2, 0),     # booster step
         "positive", "positive", "positive", 1.0),
        (5, "not bad at all", (3, 1, 0),                 # flip to positive
         "positive", "positive", "positive", 1.0),
        (6, "not good at all", (-2, 0, 1),               # flip to negative
         "negative", "negative", "negative", 1.0),
        (7, "very good indeed", (3, 1, 0),               # booster +1
         "positive", "positive", "positive", 1.0),
        (8, "very bad indeed", (-4, 0, 1),               # booster -1
         "negative", "negative", "negative", 1.0),
        (9, "extremely happy with the result", (4, 1, 0),
         "positive", "positive", "positive", 1.0),
        (10, "hardly a disappointment", (-2, 0, 1),
         "negative", "negative", "negative", 1.0),
        (11, "THIS IS ABSOLUTELY WONDERFUL", (5, 1, 0),  # all-caps lowercased
         "positive", "positive", "positive", 1.0),
        (12, "TERRIBLE SERVICE. AWFUL. NEVER AGAIN", (-6, 0, 2),
         "negative", "negative", "negative", 1.0),
        (13, "I am so so so happy :)", (4, 1, 0),        # emoticon ignored
         "positive", "positive", "positive", 1.0),
        (14, "worst purchase ever :(", (-3, 0, 1),
         "negative", "negative", "negative", 1.0),
        (15, "", (0, 0, 0), "neutral", "neutral", "neutral", 0.0),
        (16, "   ", (0, 0, 0), "neutral", "neutral", "neutral", 0.0),
        (17, "the cat sat on the mat", (0, 0, 0),        # neutral prose
         "neutral", "neutral", "neutral", 0.0),
        (18, "don't love it, don't hate it", (0, 1, 1),  # balanced flips
         "neutral", "neutral", "neutral", 0.0),
        (19, "RT @user check https://t.co/x this brilliant masterpiece",
         (8, 2, 0), "positive", "positive", "positive", 1.0),  # cleaned
        (20, "@someone that was a complete disaster, truly horrific",
         (-7, 0, 2), "negative", "negative", "negative", 1.0),
        (21, "good good good bad", (3, 3, 1),            # repeats all count
         "positive", "positive", "positive", 1.0),
        (22, "never been happier!", (3, 1, 0),
         "positive", "positive", "positive", 1.0),
        (23, "It’s not awful… it’s actually great", (6, 2, 0),  # unicode
         "positive", "positive", "positive", 1.0),
        (24, "meh", (-1, 0, 1),                          # weak negative
         "negative", "neutral", "negative", 0.6),
    ]

    CMP_COLS = ["doc_id", "cleaned_text", "vader_compound", "vader_positive",
                "vader_negative", "vader_neutral", "vader_sentiment",
                "textblob_polarity", "textblob_subjectivity",
                "textblob_sentiment", "combined_score", "final_sentiment",
                "confidence_score"]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t, *_ in self.GOLDEN], ["doc_id", "text"])

    def test_udf_path_matches_goldens(self, spark):
        rows = {r["doc_id"]: r for r in
                sentiment_enrich(self._df(spark), "text").collect()}
        for i, _text, _sums, vader, tb, final, conf in self.GOLDEN:
            r = rows[i]
            assert r["vader_sentiment"] == vader, (i, r)
            assert r["textblob_sentiment"] == tb, (i, r)
            assert r["final_sentiment"] == final, (i, r)
            assert r["confidence_score"] == pytest.approx(conf), (i, r)

    def test_integer_sums_pinned(self, spark):
        """The exact lexicon sums behind every label, through the scalar
        scorer on the SAME cleaned+normalized tokens Spark produces — the
        invariant that keeps the Arrow path, the relational path, and the
        DuckDB oracle in integer lockstep."""
        enr = sentiment_enrich(self._df(spark), "text") \
            .select("doc_id", "cleaned_text").collect()
        cleaned = {r["doc_id"]: r["cleaned_text"] for r in enr}
        for i, _text, sums, *_ in self.GOLDEN:
            toks = [normalize_token(t) for t in cleaned[i].split(" ")] \
                if cleaned[i] else []
            assert (score_tokens(toks) if toks else (0, 0, 0)) == sums, i

    def test_both_paths_byte_equal_on_corpus(self, spark):
        df = self._df(spark)
        a = {r["doc_id"]: r for r in
             sentiment_enrich(df, "text").select(*self.CMP_COLS).collect()}
        b = {r["doc_id"]: r for r in
             sentiment_enrich_relational(df, spark, "text")
             .select(*self.CMP_COLS).collect()}
        assert a == b


class TestEnrichPipeline:
    def test_enrich_adds_all_columns(self, spark):
        df = spark.createDataFrame(
            [("1", "RT @u a great wonderful run"), ("2", "an awful terrible day")],
            ["id", "text"],
        )
        out = sentiment_enrich(df, "text")
        for col in ["cleaned_text", "vader_sentiment", "vader_compound",
                    "textblob_sentiment", "final_sentiment", "confidence_score"]:
            assert col in out.columns
        rows = {r["id"]: r for r in out.collect()}
        assert rows["1"]["final_sentiment"] == "positive"
        assert rows["2"]["final_sentiment"] == "negative"
        assert rows["1"]["cleaned_text"] == "u a great wonderful run"

    def test_empty_text_canonical_neutral(self, spark):
        """U5: empty text → neutral record, compound 0, neutral share 1.0."""
        row = sentiment_enrich(
            spark.createDataFrame([("",)], ["text"]), "text").collect()[0]
        assert row["vader_compound"] == 0.0
        assert row["vader_sentiment"] == "neutral"
        assert row["vader_neutral"] == 1.0
        assert row["final_sentiment"] == "neutral"

    def test_zero_shuffle_one_arrow_crossing(self, spark):
        """The default path must stay scan → one ArrowEvalPython → codegen'd
        projection: no shuffle, no row-at-a-time Python."""
        df = spark.createDataFrame([("1", "great")], ["id", "text"])
        plan = sentiment_enrich(df, "text")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("ArrowEvalPython") == 1

    def test_relational_path_equivalent(self, spark):
        """The pure-JVM broadcast-join plan and the Arrow-UDF plan must be
        bit-identical on text exercising every feature: negation, boosting,
        punctuation stripping, apostrophes, unknown words, empty text."""
        texts = [
            (1, "I love this amazing product!"),
            (2, "not bad, actually VERY good..."),
            (3, "so slow and so broken; don't buy"),
            (4, ""),
            (5, "Neutral words only here today"),
            (6, "never fails, hardly disappointing, truly great!"),
        ]
        df = spark.createDataFrame(texts, ["doc_id", "text"])
        cols = ["doc_id", "vader_compound", "vader_sentiment",
                "textblob_polarity", "final_sentiment", "confidence_score"]
        a = {r["doc_id"]: r for r in
             sentiment_enrich(df, "text").select(*cols).collect()}
        b = {r["doc_id"]: r for r in
             sentiment_enrich_relational(df, spark, "text")
             .select(*cols).collect()}
        assert a == b

    def test_relational_broadcasts_lexicon(self, spark):
        """The 4.7k-row lexicon must hash-join broadcast, never shuffle."""
        df = spark.createDataFrame([(1, "great stuff")], ["doc_id", "text"])
        plan = sentiment_enrich_relational(df, spark, "text") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_base_valences_have_no_generated_collisions(self):
        """Every explicit base entry survives expansion verbatim."""
        for w, v in BASE_VALENCES.items():
            assert LEXICON[normalize_token(w)] == v
