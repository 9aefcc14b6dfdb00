from .text import (  # noqa: F401
    clean_text,
    tokens,
    token_count,
    word_hits,
    array_word_hits,
    stopword_hits,
    quality_columns,
    quality_enrich,
    bpe_ish_token_count,
    lang_id_column,
    fingerprint,
    bag_fingerprint,
    shingles,
)
from .sentiment import (  # noqa: F401
    POSITIVE_WORDS,
    NEGATIVE_WORDS,
    lexicon_scores,
    ensemble_columns,
    sentiment_enrich,
    vader_textblob_udfs,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from .rounding import (  # noqa: F401
    decimal_sum,
    round_half_up,
    sql_decimal_sum,
    sql_round_half_up,
)
