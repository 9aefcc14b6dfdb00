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

from pathlib import Path

from ..functions.lexicon_data import BOOSTERS, NEGATORS
from ..functions.sentiment import (
    AGREEMENT_BOOST,
    COMPOUND_ALPHA,
    ENSEMBLE_TEXTBLOB_WEIGHT,
    ENSEMBLE_VADER_WEIGHT,
    FINAL_THRESHOLD,
    TEXTBLOB_POS_THRESHOLD,
    VADER_POS_THRESHOLD,
    VALENCE_SCALE,
)
from ..functions.text import STOPWORDS

# The checked-in lexicon artifact (tools/build_lexicon_csv.py regenerates it
# from functions/lexicon_data.py; a test pins file == dict). Resolved to an
# absolute path at import time so the oracle SQL works from any cwd.
LEXICON_CSV = str(
    Path(__file__).resolve().parent.parent / "data" / "sentiment_lexicon.csv")


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


def sql_norm(tok: str) -> str:
    """DuckDB twin of lexicon_data.normalize_token: lowercase, drop
    apostrophes, strip non-[a-z0-9] runs from both ends."""
    dequoted = f"replace(replace(lower({tok}), '''', ''), '’', '')"
    return (
        f"regexp_replace(regexp_replace({dequoted}, "
        f"'^[^a-z0-9]+', ''), '[^a-z0-9]+$', '')"
    )


def _sql_str_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# Effective (context-adjusted) valence of one lexicon hit, given the
# normalized PREVIOUS token: negation flips sign, a booster intensifies one
# step toward the ±VALENCE_SCALE cap; negation wins. Twin of
# lexicon_data.score_tokens and of the Spark relational/UDF paths.
SQL_EFFECTIVE_VALENCE = f"""CASE
    WHEN prev IN ({_sql_str_list(NEGATORS)}) THEN -valence
    WHEN prev IN ({_sql_str_list(BOOSTERS)}) THEN
        CASE WHEN valence > 0 THEN least(valence + 1, {VALENCE_SCALE})
             ELSE greatest(valence - 1, -{VALENCE_SCALE}) END
    ELSE valence END"""


# Enriched-documents relation: the oracle twin of
# queries.reference.enriched_documents(). Synthetic engagement counts are
# deterministic functions of doc_id (the testdata has no engagement columns).
# Sentiment model: integer valence sums over the broadcast lexicon (see
# functions/lexicon_data.py) — tokens normalized, zipped with their previous
# token for negation/boosting, joined to the lexicon, summed per doc.
# Integer s/pos_n/neg_n make every aggregate order-independent; doubles only
# appear in the final single-expression normalizations, evaluated with the
# same op sequence in Spark.
ENRICHED_DOCS_CTE = f"""
WITH lex AS (
    SELECT word, valence
    FROM read_csv('{LEXICON_CSV}', header=true,
                  columns={{'word': 'VARCHAR', 'valence': 'INTEGER'}})
), cleaned AS (
    SELECT doc_id, text AS tweet_text, lang AS language, source, n_chars,
           {sql_clean('text')} AS cleaned_text,
           doc_id % 100 AS like_count,
           (doc_id * 7) % 50 AS retweet_count
    FROM documents
), tokd AS (
    SELECT *,
           CASE WHEN cleaned_text = '' THEN CAST([] AS VARCHAR[])
                ELSE list_transform(string_split(cleaned_text, ' '),
                                    t -> {sql_norm('t')}) END AS __toks
    FROM cleaned
), tokrow AS (
    SELECT doc_id,
           unnest(list_zip(__toks, list_prepend('', __toks[:-1]))) AS pr
    FROM tokd
), tokval AS (
    SELECT doc_id, {SQL_EFFECTIVE_VALENCE} AS v
    FROM (SELECT doc_id, pr[1] AS tok, pr[2] AS prev FROM tokrow) t
    JOIN lex ON t.tok = lex.word
), perdoc AS (
    SELECT doc_id,
           CAST(SUM(v) AS INT) AS s,
           CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS INT) AS pos_n,
           CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS INT) AS neg_n
    FROM tokval GROUP BY doc_id
), counted AS (
    SELECT tokd.* EXCLUDE (__toks),
           coalesce(perdoc.s, 0) AS s,
           coalesce(perdoc.pos_n, 0) AS pos_n,
           coalesce(perdoc.neg_n, 0) AS neg_n,
           {sql_token_count('cleaned_text')} AS n_tok
    FROM tokd LEFT JOIN perdoc USING (doc_id)
), scored AS (
    SELECT *,
           s / sqrt(s * s + {COMPOUND_ALPHA}) AS vader_compound,
           pos_n / (n_tok + 1.0) AS vader_positive,
           neg_n / (n_tok + 1.0) AS vader_negative,
           1.0 - pos_n / (n_tok + 1.0) - neg_n / (n_tok + 1.0) AS vader_neutral,
           s / ({VALENCE_SCALE}.0 * (pos_n + neg_n + 1.0)) AS textblob_polarity,
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
