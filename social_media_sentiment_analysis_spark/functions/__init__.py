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
from .lexicon_data import (  # noqa: F401
    BOOSTERS,
    LEXICON,
    NEGATORS,
    normalize_token,
    score_tokens,
)
from .sentiment import (  # noqa: F401
    ensemble_columns,
    lexicon_sums_udf,
    lexicon_table,
    sentiment_enrich,
    sentiment_enrich_relational,
    vader_textblob_udfs,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from .rounding import (  # noqa: F401
    decimal_sum,
    round_half_up,
    sql_decimal_sum,
    sql_round_half_up,
)
