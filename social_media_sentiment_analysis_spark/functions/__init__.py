from .text import (  # noqa: F401
    clean_text,
    tokens,
    token_count,
    word_hits,
    stopword_hits,
    quality_columns,
    lang_id_column,
    fingerprint,
    shingles,
)
from .sentiment import (  # noqa: F401
    POSITIVE_WORDS,
    NEGATIVE_WORDS,
    lexicon_scores,
    ensemble_columns,
    sentiment_enrich,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
