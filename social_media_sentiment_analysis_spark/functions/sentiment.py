"""Sentiment scoring: real valence-lexicon models + the ensemble combiner.

The reference scores with two third-party models — VADER
(sentiment_analysis.py:218-247) and TextBlob (:249-272) — then combines them
with fixed arithmetic (:274-317). The combiner (U3) is pure Column algebra
here, with the reference's exact constants: label map {pos:+1, neu:0, neg:-1},
weights 0.6/0.4, final thresholds ±0.1, confidence = |combined| ×1.2 on
agreement, clamped to 1.0.

The model scores come from the engine's own ~4.7k-entry integer valence
lexicon (functions/lexicon_data.py — AFINN-style public data with VADER-style
negation and booster handling), through three interchangeable paths that are
pinned equal by tests and by the shared DuckDB oracle:

1. ``sentiment_enrich`` (default): an Arrow-vectorized ``pandas_udf``
   computes the per-document INTEGER sums (s, pos_n, neg_n); everything
   downstream is Column algebra. This is the zero-shuffle scale path — at
   100 TB the corpus is scanned once and never exchanged. The alternative
   relational formulation below must shuffle the corpus on doc_id to
   re-associate scores, which is the actual bottleneck at scale (the
   lexicon lookup itself is cheap either way). Integer sums keep the result
   order-independent and bit-identical to the SQL oracle.

2. ``sentiment_enrich_relational``: the same scores as a pure-JVM plan —
   normalize tokens, zip with the previous token, posexplode, broadcast-join
   the 4.7k-row lexicon table, re-aggregate, join back. Fully
   whole-stage-codegen'd and oracle-checked; kept as the no-Python variant
   and as a cross-check of the UDF path (test_sentiment pins equality).

3. ``vader_textblob_udfs``: the real third-party models as import-gated
   Arrow UDFs (not installed in this sandbox; scores aren't
   SQL-reproducible, so never on oracle-checked paths).

Score model (deterministic, integer-exact; mirrored in queries/sqlgen.py):
- s = Σ effective valence over lexicon hits; negation flips, boosters
  intensify one step (lexicon_data.score_tokens is the ground truth).
- vader_compound = s / sqrt(s² + 15)      (VADER's published normalization)
- vader_positive/negative = pos_n/(n_tok+1), neg_n/(n_tok+1); neutral = rest
- textblob_polarity = s / (5·(hits+1)) — valence rescaled to [-1,1] and
  damped by hit count; subjectivity = hits/(n_tok+1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .lexicon_data import (
    BOOSTERS,
    LEXICON,
    NEGATORS,
    score_normalized_tokens,
)
from .text import clean_text, token_count, tokens

# Reference constants (sentiment_analysis.py).
VADER_POS_THRESHOLD = 0.05     # :224-229
TEXTBLOB_POS_THRESHOLD = 0.1   # :257-262
ENSEMBLE_VADER_WEIGHT = 0.6    # :280
ENSEMBLE_TEXTBLOB_WEIGHT = 0.4  # :281
FINAL_THRESHOLD = 0.1          # :295-300
AGREEMENT_BOOST = 1.2          # :304
CONFIDENCE_CAP = 1.0           # :305

# Engine lexicon constants.
COMPOUND_ALPHA = 15.0          # VADER's compound normalization constant
VALENCE_SCALE = 5              # lexicon valences live in [-5, 5]


def _label_from(score: Column, threshold: float, strict: bool) -> Column:
    """pos/neg/neutral label from a signed score. ``strict`` selects > vs >=
    (VADER uses >=±0.05, TextBlob and the ensemble use >±0.1)."""
    pos = score > threshold if strict else score >= threshold
    neg = score < -threshold if strict else score <= -threshold
    return (
        F.when(pos, F.lit("positive"))
        .when(neg, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )


def _label_to_num(label: Column) -> Column:
    """Reference's score map {positive:1.0, neutral:0.0, negative:-1.0}
    (sentiment_analysis.py:284)."""
    return (
        F.when(label == "positive", F.lit(1.0))
        .when(label == "negative", F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )


def ensemble_columns(vader_label: Column, textblob_label: Column) -> dict[str, Column]:
    """U3 ensemble combine (sentiment_analysis.py:274-317), exact constants.

    combined = 0.6·vader + 0.4·textblob on the {-1,0,1} label map;
    final label at > ±0.1; confidence = |combined|, ×1.2 if the two labels
    agree, clamped to 1.0. Pure Column algebra — no UDF.
    """
    combined = (
        F.lit(ENSEMBLE_VADER_WEIGHT) * _label_to_num(vader_label)
        + F.lit(ENSEMBLE_TEXTBLOB_WEIGHT) * _label_to_num(textblob_label)
    )
    final = _label_from(combined, FINAL_THRESHOLD, strict=True)
    base_conf = F.abs(combined)
    confidence = F.when(
        vader_label == textblob_label,
        F.least(base_conf * F.lit(AGREEMENT_BOOST), F.lit(CONFIDENCE_CAP)),
    ).otherwise(base_conf)
    return {
        "combined_score": combined,
        "final_sentiment": final,
        "confidence_score": confidence,
    }


def lexicon_sums_udf():
    """Arrow pandas UDF: NORMALIZED space-joined tokens -> struct<s int,
    pos_n int, neg_n int> of integer lexicon sums
    (lexicon_data.score_normalized_tokens per document).

    The input is pre-normalized JVM-side (``normalized_tokens_col`` — the
    two per-token regexes run in whole-stage codegen, measured ~2× faster
    than normalizing in Python), joined with spaces so the Arrow transfer
    stays one string per row; normalized tokens contain no spaces, so the
    join/split round-trip is lossless (empty tokens survive as empty
    strings, preserving positions for the negation lookback).

    The ~4.7k-entry dict ships in the UDF closure (~100 KB — task-broadcast
    once per executor, same mechanism Spark uses for any closure constant).
    Deterministic by construction; integer outputs keep it
    oracle-verifiable.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _score(norm_texts):
        rows = [score_normalized_tokens(t.split(" ")) if t else (0, 0, 0)
                for t in norm_texts]
        return pd.DataFrame(rows, columns=["s", "pos_n", "neg_n"])

    _score.__annotations__ = {"norm_texts": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_score, "s int, pos_n int, neg_n int")


def _score_columns_from_sums(df: DataFrame) -> DataFrame:
    """Shared tail of every scoring path: model-score/label/ensemble columns
    from the integer columns (__s, __pos_n, __neg_n, __n_tok — dunder-
    prefixed so a caller DataFrame that already has s/pos_n/neg_n columns
    is never silently clobbered). Single-expression double arithmetic —
    identical op order to the DuckDB oracle (queries/sqlgen.py
    ENRICHED_DOCS_CTE `scored` stage)."""
    s, p, n = F.col("__s"), F.col("__pos_n"), F.col("__neg_n")
    t = F.col("__n_tok")
    df = df.withColumns({
        "vader_compound": s / F.sqrt(s * s + F.lit(COMPOUND_ALPHA)),
        "vader_positive": p / (t + F.lit(1.0)),
        "vader_negative": n / (t + F.lit(1.0)),
        "textblob_polarity": s / (F.lit(float(VALENCE_SCALE)) * (p + n + F.lit(1.0))),
        "textblob_subjectivity": (p + n) / (t + F.lit(1.0)),
    })
    df = df.withColumns({
        "vader_neutral": F.lit(1.0) - F.col("vader_positive") - F.col("vader_negative"),
        "vader_sentiment": _label_from(
            F.col("vader_compound"), VADER_POS_THRESHOLD, strict=False),
        "textblob_sentiment": _label_from(
            F.col("textblob_polarity"), TEXTBLOB_POS_THRESHOLD, strict=True),
    })
    df = df.withColumn(
        "combined_score",
        F.lit(ENSEMBLE_VADER_WEIGHT) * _label_to_num(F.col("vader_sentiment"))
        + F.lit(ENSEMBLE_TEXTBLOB_WEIGHT) * _label_to_num(F.col("textblob_sentiment")),
    )
    base_conf = F.abs(F.col("combined_score"))
    df = df.withColumns({
        "final_sentiment": _label_from(
            F.col("combined_score"), FINAL_THRESHOLD, strict=True),
        "confidence_score": F.when(
            F.col("vader_sentiment") == F.col("textblob_sentiment"),
            F.least(base_conf * F.lit(AGREEMENT_BOOST), F.lit(CONFIDENCE_CAP)),
        ).otherwise(base_conf),
    })
    return df.drop("__s", "__pos_n", "__neg_n", "__n_tok")


def sentiment_enrich(df: DataFrame, text_col: str = "text") -> DataFrame:
    """U4 composite, default path: clean → lexicon integer sums (one Arrow
    UDF call per row batch) → Column-algebra scores/labels/ensemble.

    Adds cleaned_text, all per-model score/label columns, and
    final_sentiment/confidence_score. Zero shuffles: the plan is scan →
    ArrowEvalPython → codegen'd projection, so at 100 TB the corpus is
    read once and never exchanged (see module docstring for the trade
    against the relational variant). Stateless — identical on a batch scan
    and a file stream (the streaming twin reuses this verbatim).
    """
    df = df.withColumn("cleaned_text", clean_text(F.col(text_col)))
    df = df.withColumn(
        "__sums", lexicon_sums_udf()(normalized_tokens_col(F.col("cleaned_text"))))
    df = df.withColumns({
        "__s": F.col("__sums.s"),
        "__pos_n": F.col("__sums.pos_n"),
        "__neg_n": F.col("__sums.neg_n"),
        "__n_tok": token_count(F.col("cleaned_text")),
    }).drop("__sums")
    return _score_columns_from_sums(df)


# ---------------------------------------------------------------------------
# Relational (pure-JVM) scoring path: broadcast lexicon join.
# ---------------------------------------------------------------------------

def normalize_token_col(tok: Column) -> Column:
    """Column twin of lexicon_data.normalize_token (and sqlgen.sql_norm)."""
    dequoted = F.replace(F.replace(F.lower(tok), F.lit("'"), F.lit("")),
                         F.lit("’"), F.lit(""))
    return F.regexp_replace(
        F.regexp_replace(dequoted, "^[^a-z0-9]+", ""), "[^a-z0-9]+$", "")


def normalized_tokens_col(cleaned: Column) -> Column:
    """Cleaned text -> normalized tokens re-joined with single spaces —
    the pre-computed input of ``lexicon_sums_udf`` (see its docstring for
    why normalization runs JVM-side and why the join is lossless)."""
    return F.concat_ws(" ", F.transform(tokens(cleaned), normalize_token_col))


def lexicon_table(spark: SparkSession) -> DataFrame:
    """The valence lexicon as a (word, valence) DataFrame — the broadcast
    dimension for the relational scoring path (4.7k rows).

    Built through the Arrow createDataFrame path (guide §6 "Arrow for
    driver transfers"): the plain-tuples path pickles the rows into
    defaultParallelism (32) slices and the broadcast build then schedules
    a 32-task wave of ~150-row partitions — measured 1.30 s per
    invocation on a warm session vs 0.20 s for one Arrow batch (r9). The
    explicit schema keeps the published (string, int) column types the
    pandas round-trip would otherwise widen."""
    import pandas as pd

    pdf = pd.DataFrame(sorted(LEXICON.items()),
                       columns=["word", "valence"])
    return spark.createDataFrame(pdf, schema="word string, valence int")


def effective_valence(valence: Column, prev: Column) -> Column:
    """Context-adjusted valence: negation flips sign, a booster intensifies
    one step toward the ±5 cap; negation wins (lexicon_data.score_tokens)."""
    boosted = F.when(
        valence > 0, F.least(valence + 1, F.lit(VALENCE_SCALE))
    ).otherwise(F.greatest(valence - 1, F.lit(-VALENCE_SCALE)))
    return (
        F.when(prev.isin(*NEGATORS), -valence)
        .when(prev.isin(*BOOSTERS), boosted)
        .otherwise(valence)
    )


def sentiment_enrich_relational(
    df: DataFrame, spark: SparkSession, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """U4 composite as a pure-JVM relational plan, result-identical to
    ``sentiment_enrich`` (pinned by tests and by sharing one oracle).

    Plan: hash the corpus by ``id_col`` ONCE up front, then normalize the
    token array in-place (codegen), zip each token with its predecessor,
    posexplode, broadcast-hash-join the lexicon (the idiomatic small-dim
    join — O(1) lookups, no skew), aggregate the integer sums per document,
    and join the sums back on ``id_col``. Because the explode and the
    broadcast join preserve the up-front partitioning, BOTH the per-doc
    aggregate and the join-back reuse that single exchange — the previous
    shape paid two (sums exchange + join-back corpus shuffle) and ran the
    explode inside the scan stage, which on an unsplittable single-file
    input is ONE task (guide §2.4/§2.5; r9: 2 exchanges → 1, measured
    2.0 → 1.4 s at sf0.1). One corpus shuffle is still one more than the
    zero-shuffle UDF path, which stays the default at scale.
    """
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = (df.repartition(n_parts, id_col)
          .withColumn("cleaned_text", clean_text(F.col(text_col))))
    toks = F.transform(tokens(F.col("cleaned_text")), normalize_token_col)
    prevs = F.concat(F.array(F.lit("")), F.slice(toks, 1, F.size(toks) - 1))
    pairs = (
        df.select(F.col(id_col), F.arrays_zip(toks, prevs).alias("__zip"))
        .select(F.col(id_col), F.explode("__zip").alias("pr"))
        .select(F.col(id_col), F.col("pr.0").alias("tok"),
                F.col("pr.1").alias("prev"))
    )
    hits = pairs.join(
        F.broadcast(lexicon_table(df.sparkSession)), pairs.tok == F.col("word"))
    v = effective_valence(F.col("valence"), F.col("prev"))
    sums = hits.groupBy(id_col).agg(
        F.sum(v).cast("int").alias("__s"),
        F.sum(F.when(v > 0, 1).otherwise(0)).cast("int").alias("__pos_n"),
        F.sum(F.when(v < 0, 1).otherwise(0)).cast("int").alias("__neg_n"),
    )
    df = (
        df.join(sums, on=id_col, how="left")
        .withColumns({
            "__s": F.coalesce(F.col("__s"), F.lit(0)),
            "__pos_n": F.coalesce(F.col("__pos_n"), F.lit(0)),
            "__neg_n": F.coalesce(F.col("__neg_n"), F.lit(0)),
            "__n_tok": token_count(F.col("cleaned_text")),
        })
    )
    return _score_columns_from_sums(df)


# ---------------------------------------------------------------------------
# Optional real-model path (U1/U2) — Arrow-vectorized pandas UDFs, gated.
# ---------------------------------------------------------------------------

def vader_textblob_udfs():
    """Return (vader_udf, textblob_udf) pandas UDFs wrapping the real models,
    or raise ImportError when the libraries aren't installed.

    Pattern notes for scale: the analyzer is constructed lazily once per
    executor process (module-level cache inside the UDF), and scoring is
    batched over Arrow record batches — the 10-100× win over row-at-a-time
    UDFs. The reference instead made one HTTP RPC per tweet
    (twitter_streamer.py:98-136).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer  # noqa
    from textblob import TextBlob  # noqa

    _STATE: dict = {}

    def _vader(texts):
        if "an" not in _STATE:
            _STATE["an"] = SentimentIntensityAnalyzer()
        an = _STATE["an"]

        def score(t):
            try:
                s = an.polarity_scores(t or "")
                return (s["compound"], s["pos"], s["neg"], s["neu"])
            except Exception:
                return (0.0, 0.0, 0.0, 1.0)   # reference fallback :241-247

        return pd.DataFrame(
            [score(t) for t in texts], columns=["compound", "pos", "neg", "neu"]
        )

    def _textblob(texts):
        def score(t):
            try:
                s = TextBlob(t or "").sentiment
                return (s.polarity, s.subjectivity)
            except Exception:
                return (0.0, 0.0)             # reference fallback :268-272
        return pd.DataFrame(
            [score(t) for t in texts], columns=["polarity", "subjectivity"]
        )

    # annotations set as real objects: this module uses `from __future__
    # import annotations`, which stringifies inline hints — pandas_udf's
    # type-hint inference can't evaluate 'pd.Series' (pd is local here)
    for f in (_vader, _textblob):
        f.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    vader_udf = pandas_udf(
        _vader, "compound double, pos double, neg double, neu double")
    textblob_udf = pandas_udf(
        _textblob, "polarity double, subjectivity double")
    return vader_udf, textblob_udf
