"""DuckDB-dialect SQL snippet generators mirroring functions/text.py and
functions/sentiment.py Column expressions.

Each generator is the textual twin of one Column helper; keeping them in one
module (and composing oracles from them) is what keeps Spark results and
DuckDB oracle results bit-compatible: same literals, same operation order,
same arithmetic in double precision.

Determinism policy for oracle-checked queries:
- per-row doubles: identical IEEE-754 op order on both sides → bitwise equal.
  When displayed rounded, use ``functions/rounding.py::round_half_up`` /
  ``sql_round_half_up`` (identical floor-based op sequence) — Spark's
  ``round`` (exact-decimal HALF_UP) and DuckDB's (numeric) disagree on
  doubles a few ulps under a …5 boundary.
- aggregated doubles (SUM/AVG over many rows): accumulation order is engine-
  dependent, so both sides wrap them in round(·, 4); where a boundary hit
  was ever observed (hourly_rollup, embedding_dim_profile at sf0.1) the
  aggregate itself is made order-independent via exact DECIMAL summation
  (``rounding.decimal_sum``) before the engine-exact rounding.
- integer aggregates: exact; DuckDB SUM(BIGINT) returns HUGEINT, so oracles
  cast back to BIGINT to match Spark's long.
"""

from __future__ import annotations

from ..functions.sentiment import (
    AGREEMENT_BOOST,
    ENSEMBLE_TEXTBLOB_WEIGHT,
    ENSEMBLE_VADER_WEIGHT,
    FINAL_THRESHOLD,
    NEGATIVE_WORDS,
    POSITIVE_WORDS,
    TEXTBLOB_POS_THRESHOLD,
    VADER_POS_THRESHOLD,
)
from ..functions.text import STOPWORDS


def sql_clean(col: str) -> str:
    """F1 clean_text: global 'RT @' removal, whitespace collapse, trim."""
    return (
        f"trim(regexp_replace(replace(coalesce({col}, ''), 'RT @', ''), "
        f"'\\s+', ' ', 'g'))"
    )


def sql_word_hits(col: str, word: str) -> str:
    return f"len(list_filter(string_split({col}, ' '), t -> t = '{word}'))"


def sql_multi_hits(col: str, words: tuple[str, ...]) -> str:
    return " + ".join(sql_word_hits(col, w) for w in words)


def sql_token_count(col: str) -> str:
    return f"CASE WHEN {col} = '' THEN 0 ELSE len(string_split({col}, ' ')) END"


def sql_label(score: str, threshold: float, strict: bool) -> str:
    gt, lt = (">", "<") if strict else (">=", "<=")
    return (
        f"CASE WHEN {score} {gt} {threshold} THEN 'positive' "
        f"WHEN {score} {lt} -{threshold} THEN 'negative' "
        f"ELSE 'neutral' END"
    )


def sql_label_to_num(label: str) -> str:
    return (
        f"CASE WHEN {label} = 'positive' THEN 1.0 "
        f"WHEN {label} = 'negative' THEN -1.0 ELSE 0.0 END"
    )


# Enriched-documents relation: the oracle twin of
# queries.reference.enriched_documents(). Synthetic engagement counts are
# deterministic functions of doc_id (the testdata has no engagement columns).
ENRICHED_DOCS_CTE = f"""
WITH cleaned AS (
    SELECT doc_id, text AS tweet_text, lang AS language, source, n_chars,
           {sql_clean('text')} AS cleaned_text,
           doc_id % 100 AS like_count,
           (doc_id * 7) % 50 AS retweet_count
    FROM documents
), counted AS (
    SELECT *,
           {sql_multi_hits('cleaned_text', POSITIVE_WORDS)} AS pos_n,
           {sql_multi_hits('cleaned_text', NEGATIVE_WORDS)} AS neg_n,
           {sql_token_count('cleaned_text')} AS n_tok
    FROM cleaned
), scored AS (
    SELECT *,
           (pos_n - neg_n) / (pos_n + neg_n + 1.0) AS vader_compound,
           pos_n / (n_tok + 1.0) AS vader_positive,
           neg_n / (n_tok + 1.0) AS vader_negative,
           1.0 - pos_n / (n_tok + 1.0) - neg_n / (n_tok + 1.0) AS vader_neutral,
           (pos_n - neg_n) / (n_tok + 1.0) AS textblob_polarity,
           (pos_n + neg_n) / (n_tok + 1.0) AS textblob_subjectivity
    FROM counted
), labeled AS (
    SELECT *,
           {sql_label('vader_compound', VADER_POS_THRESHOLD, strict=False)} AS vader_sentiment,
           {sql_label('textblob_polarity', TEXTBLOB_POS_THRESHOLD, strict=True)} AS textblob_sentiment
    FROM scored
), combined AS (
    SELECT *,
           {ENSEMBLE_VADER_WEIGHT} * {sql_label_to_num('vader_sentiment')}
             + {ENSEMBLE_TEXTBLOB_WEIGHT} * {sql_label_to_num('textblob_sentiment')} AS combined_score
    FROM labeled
), enriched AS (
    SELECT *,
           {sql_label('combined_score', FINAL_THRESHOLD, strict=True)} AS final_sentiment,
           CASE WHEN vader_sentiment = textblob_sentiment
                THEN least(abs(combined_score) * {AGREEMENT_BOOST}, 1.0)
                ELSE abs(combined_score) END AS confidence_score
    FROM combined
)
"""

SQL_STOPWORD_HITS = sql_multi_hits("cleaned_text", STOPWORDS)
