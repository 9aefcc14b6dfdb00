"""Tokenizer-training and sequence-assembly queries for LLM data pipelines.

Three operators a training-data pipeline needs between "curated documents"
and "training batches":

- TF-IDF keyword extraction (`q_tfidf_keywords`) — per-document salient
  terms, the standard relevance/quality signal and the input to
  keyword-based domain mixing.
- Adjacent-pair (bigram) statistics (`q_vocab_pairs`) — the core counting
  step of BPE/WordPiece tokenizer training: the most frequent adjacent
  symbol pair is the next merge candidate.
- Sequence packing (`q_pack_sequences`) — greedy sequential packing of
  documents into fixed-size budget bins, the batch-assembly step that
  turns ragged documents into dense training sequences.

All three are pure Column algebra (no Python crossing) with DuckDB oracle
twins. Scale notes per query; none uses more exchanges than its semantic
keys require.

Reference scope note: the reference app (`sentiment_analysis.py`,
`twitter_streamer.py`) has no tokenizer/packing surface — these are engine
extensions per the BASELINE north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table

# ASCII-letter tokenization (lower → split on non-letters) keeps Java and
# DuckDB regex/casing semantics byte-identical — same idiom as
# q_word_frequency (shaping.py).
_TOKEN_SPLIT = "[^a-z]+"
_MIN_WORD_LEN = 3
_TOP_KEYWORDS = 3
_TOP_PAIRS = 30
_PACK_BUDGET_CHARS = 2048


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, word) for English docs, words ≥ 3 letters.

    explode is map-side: no exchange until the first aggregation.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("word"),
        )
        .filter(F.length("word") >= _MIN_WORD_LEN)
    )


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per English document by TF-IDF.

    Plan shape (three exchanges, each a semantic key):
      1. hash-agg on (doc_id, word) → term frequencies; partial combine
         collapses each partition's repeats before the shuffle.
      2. window count over (word) → document frequency — computed as a
         window on the tf table, NOT a self-join: one exchange instead of
         an agg + shuffle-join pair, and the tf rows are already the
         distinct (doc, word) pairs df counts.
      3. window row_number over (doc_id) → per-doc top-k.
    The corpus size N is a 1-row aggregate carried by broadcast cross-join
    (BroadcastNestedLoop over a single row — constant cost at any scale).

    At 100 TB the (word) window partitions by vocabulary term; stopword-like
    hot terms are bounded because tf rows are per-(doc,word), i.e. at most
    one row per document per term, and the ≥3-letter filter plus the
    min-doc-freq of real corpora keeps partitions within task memory.
    Raw score ties are broken by word so the top-k is deterministic.
    """
    tf = _tokens(spark, sf_dir).groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("tf"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.withColumn("df_docs", F.count(F.lit(1)).over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_raw",
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_docs") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_raw"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_KEYWORDS)
        .select(
            "doc_id",
            "rank",
            "word",
            "tf",
            "df_docs",
            F.round("score_raw", 4).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )


ORACLE_TFIDF_KEYWORDS = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}')) AS word
    FROM documents WHERE lang = 'en'
), tf AS (
    SELECT doc_id, word, COUNT(*) AS tf
    FROM toks WHERE length(word) >= {_MIN_WORD_LEN}
    GROUP BY doc_id, word
), n AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
), scored AS (
    SELECT tf.doc_id, tf.word, tf.tf,
           COUNT(*) OVER (PARTITION BY tf.word) AS df_docs,
           n.n_docs,
           tf.tf * ln((n.n_docs + 1.0) / (COUNT(*) OVER (PARTITION BY tf.word) + 1.0))
               AS score_raw
    FROM tf, n
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_raw DESC, word ASC) AS rank
    FROM scored
)
SELECT doc_id, rank, word, tf, df_docs, round(score_raw, 4) AS tfidf
FROM ranked WHERE rank <= {_TOP_KEYWORDS}
ORDER BY doc_id, rank
"""


def q_vocab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 adjacent token pairs — the BPE-merge counting step.

    Pair construction is pure array algebra inside whole-stage codegen:
    ``zip_with(arr[:-1], arr[1:], concat)`` — no self-join on position, no
    Python. The only exchange is the pair-count aggregate, and its partial
    combine collapses each partition to its distinct pairs first; top-k
    plans as TakeOrderedAndProject.

    A full BPE trainer iterates this count → merge → re-count loop; each
    round is exactly this query over the re-tokenized corpus, so the
    per-round cost is one scan + one reduced shuffle at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    arr = F.filter(
        F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != F.lit(""))
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(_TOP_PAIRS)
    )


ORACLE_VOCAB_PAIRS = f"""
WITH toks AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
                       t -> t <> '') AS arr
    FROM documents WHERE lang = 'en'
), pairs AS (
    SELECT unnest(list_transform(range(1, len(arr)),
                                 i -> arr[i] || ' ' || arr[i + 1])) AS pair
    FROM toks
)
SELECT pair, COUNT(*) AS n_occurrences
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {_TOP_PAIRS}
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into fixed-budget bins.

    Within each source (deterministic doc_id order), a document goes into
    bin ``floor(running_chars_before_it / budget)`` — the streaming
    first-fit approximation used to pack ragged documents into dense
    training sequences without a driver-side loop. Output is the per-bin
    manifest (doc count, payload size) a batch loader would consume.

    One exchange total: the (source) window sort; the bin rollup reuses the
    same partitioning (groupBy source, bin after a window partitioned by
    source needs no second exchange of the full data — partial agg runs on
    the window's output partitions). At 100 TB the unit of parallelism is
    the source/shard key, which an ingest layout would salt into
    (source, shard) for arbitrarily wide fan-out; the algebra is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("cum_before", F.coalesce(F.sum("n_chars").over(w), F.lit(0)))
        .withColumn(
            "bin",
            F.floor(F.col("cum_before") / F.lit(float(_PACK_BUDGET_CHARS))),
        )
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("bin_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


ORACLE_PACK_SEQUENCES = f"""
WITH binned AS (
    SELECT doc_id, source, n_chars,
           CAST(floor(COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {float(_PACK_BUDGET_CHARS)}) AS BIGINT) AS bin
    FROM documents
)
SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS bin_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned
GROUP BY source, bin
ORDER BY source, bin
"""


# ---------------------------------------------------------------------------
# Distributed BPE merge training (iterative; theorem-oracle registry entry)
# ---------------------------------------------------------------------------

_BPE_MERGES = 10


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training with its contract carried into the oracle gate
    (upgraded from rows-only, r7 — the knn_ivf recipe for iterative
    algorithms): ``operators/bpe.py::train_bpe`` learns 10 merges (K tiny
    jobs over the vocabulary-sized working set, lineage truncated per
    round); the training loop has no SQL twin, but its ROUND-0 STEP and
    its monotonicity theorem do:

    - ``first_left/first_right/first_count``: the first merge is by
      definition the most frequent freq-weighted adjacent character pair
      of the corpus vocabulary (lexicographic tiebreak) — the DuckDB twin
      recomputes it exactly from the same word-frequency table;
    - ``counts_nonincreasing``: merging (a,b) creates symbol ab whose new
      neighbor-pair counts are bounded by pre-merge counts (every (x,ab)
      occurrence was an (x,a) occurrence), so the per-round best count
      can never rise — any bookkeeping bug in the fold breaks this;
    - ``merges_distinct``: a merged pair's count drops to zero, so no
      pair is ever re-learned.

    The full 10-merge list stays pinned word-for-word to the
    single-process reference in tests/test_text_functions.py::TestBPE.
    r8: trains through ``train_bpe_batched`` — multiple provably-
    sequential merges per driver round (exact same merge list by
    construction, equality pinned incl. tie/self-pair adversaries in
    TestBPEBatched), so the oracle contract is untouched while the
    driver-round count drops (≥5× on wide-alphabet vocabularies)."""
    from ..operators.bpe import train_bpe_batched

    wf = _tokens(spark, sf_dir).groupBy(F.col("word")).agg(
        F.count(F.lit(1)).alias("freq"))
    merges = train_bpe_batched(wf, _BPE_MERGES)
    counts = [n for _, _, n in merges]
    return spark.createDataFrame(
        [(
            len(merges),
            merges[0][0], merges[0][1], int(merges[0][2]),
            all(x >= y for x, y in zip(counts, counts[1:])),
            len({(a, b) for a, b, _ in merges}) == len(merges),
        )],
        "n_merges long, first_left string, first_right string, "
        "first_count long, counts_nonincreasing boolean, "
        "merges_distinct boolean")


ORACLE_BPE_MERGES = f"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'))
        AS word
    FROM documents WHERE lang = 'en'
), words AS (
    SELECT word, COUNT(*) AS freq FROM toks
    WHERE length(word) >= {_MIN_WORD_LEN}
    GROUP BY word
), pairs AS (
    SELECT substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r,
           SUM(freq) AS n
    FROM words, UNNEST(generate_series(1, length(word) - 1)) AS t(i)
    GROUP BY 1, 2
), best AS (
    SELECT l, r, n FROM pairs ORDER BY n DESC, l, r LIMIT 1
)
SELECT CAST({_BPE_MERGES} AS BIGINT) AS n_merges,
       l AS first_left, r AS first_right,
       CAST(n AS BIGINT) AS first_count,
       TRUE AS counts_nonincreasing,
       TRUE AS merges_distinct
FROM best
"""


_PMI_MIN_COUNT = 10


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation extraction — the statistical
    step behind phrase detection (word2phrase) and tokenizer-vocab curation.

    PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) over adjacent-token pairs. Three
    tiny aggregates (pair counts, unigram counts, and their grand totals)
    come out of ONE tokenized scan family; the unigram table is vocabulary-
    sized, so both probability joins are broadcasts — the corpus itself
    shuffles only once, for the pair count. All pairs above a fixed support
    threshold are returned (no float top-k: ranking on a computed double is
    the one thing two engines can disagree on; a count threshold is exact).

    Scale: vocab- and pair-table sizes grow sub-linearly with the corpus, so
    at 100 TB the broadcasts stay small while the single corpus-sized
    exchange is the irreducible cost of counting.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    arr = F.filter(
        F.split(F.lower("text"), _TOKEN_SPLIT), lambda t: t != F.lit(""))
    toks = docs.select(arr.alias("arr"))
    words = toks.select(F.explode("arr").alias("w")) \
        .groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    pairs_col = F.zip_with(
        F.slice(F.col("arr"), 1, F.greatest(F.size("arr") - 1, F.lit(0))),
        F.slice(F.col("arr"), 2, F.greatest(F.size("arr") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = (
        toks.select(F.explode(pairs_col).alias("pair"))
        .groupBy("pair").agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .select(F.split("pair", " ").getItem(0).alias("a"),
                F.split("pair", " ").getItem(1).alias("b"),
                "c_ab")
    )
    totals = toks.agg(
        F.sum(F.size("arr")).cast("double").alias("n_words"),
        F.sum(F.greatest(F.size("arr") - 1, F.lit(0))).cast("double")
        .alias("n_pairs"))
    wa = words.select(F.col("w").alias("a"), F.col("c_w").alias("c_a"))
    wb = words.select(F.col("w").alias("b"), F.col("c_w").alias("c_b"))
    return (
        pairs
        .join(F.broadcast(wa), "a")
        .join(F.broadcast(wb), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a", "b", "c_ab",
            F.round(
                F.log((F.col("c_ab") / F.col("n_pairs"))
                      / ((F.col("c_a") / F.col("n_words"))
                         * (F.col("c_b") / F.col("n_words")))), 6
            ).alias("pmi"),
        )
        .orderBy("a", "b")
    )


ORACLE_PMI_COLLOCATIONS = f"""
WITH toks AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '{{_TS}}'),
                       t -> t <> '') AS arr
    FROM documents WHERE lang = 'en'
), words AS (
    SELECT unnest(arr) AS w FROM toks
), wcount AS (
    SELECT w, COUNT(*) AS c_w FROM words GROUP BY w
), pairs AS (
    SELECT unnest(list_transform(range(1, len(arr)),
                                 i -> arr[i] || ' ' || arr[i + 1])) AS pair
    FROM toks
), pcount AS (
    SELECT string_split(pair, ' ')[1] AS a,
           string_split(pair, ' ')[2] AS b,
           COUNT(*) AS c_ab
    FROM pairs GROUP BY pair
    HAVING COUNT(*) >= {_PMI_MIN_COUNT}
), totals AS (
    SELECT (SELECT CAST(SUM(c_w) AS DOUBLE) FROM wcount) AS n_words,
           (SELECT CAST(SUM(greatest(len(arr) - 1, 0)) AS DOUBLE)
            FROM toks) AS n_pairs
)
SELECT a, b, c_ab,
       round(ln((c_ab / n_pairs)
                / ((wa.c_w / n_words) * (wb.c_w / n_words))), 6) AS pmi
FROM pcount
JOIN wcount wa ON pcount.a = wa.w
JOIN wcount wb ON pcount.b = wb.w
CROSS JOIN totals
ORDER BY a, b
""".replace("{_TS}", _TOKEN_SPLIT)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE encoding with its contract carried into the
    oracle gate (upgraded from rows-only, r7): learn 10 merges, encode the
    corpus with them (once per DISTINCT word — operators/bpe.py::
    encode_words; corpus weight rides the frequency column, so
    corpus-sized work never touches the merge fold), then gate what the
    encode must preserve:

    - ``n_words`` / ``total_char_mass``: the distinct-word count and the
      freq-weighted character mass — SQL-exact anchors the DuckDB twin
      recomputes from the same tokenization, and the conservation law:
      Σ_tokens n·len(token) over the encoded stream MUST equal
      Σ_words freq·len(word) because BPE merges only regroup characters,
      never create or drop them (the Spark side computes the left-hand
      side from the encoded output — any fold bug that loses or
      duplicates a symbol breaks the equality);
    - ``roundtrip_ok``: every word reassembles from its subwords;
    - ``vocab_within_bound``: each merge adds at most one new symbol, so
      |token vocabulary| ≤ |alphabet| + n_merges.

    The encode stays pinned word-for-word to the single-process reference
    encoder in tests/test_text_functions.py::TestBPEEncode. r8: trains
    through ``train_bpe_batched`` (exact same merge list, fewer driver
    rounds — see q_bpe_merges)."""
    from ..operators.bpe import encode_words, train_bpe_batched

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    wf = _tokens(spark, sf_dir).groupBy(F.col("word")).agg(
        F.count(F.lit(1)).alias("freq"))
    merges = train_bpe_batched(wf, _BPE_MERGES)
    encoded = encode_words(docs, "text", merges).localCheckpoint()
    toks = encoded.select(F.explode("subwords").alias("token"),
                          "n_occurrences")
    anchors = encoded.agg(
        F.count(F.lit(1)).alias("n_words"))
    mass = toks.agg(
        F.sum(F.col("n_occurrences") * F.length("token"))
        .cast("bigint").alias("total_char_mass"))
    roundtrip = encoded.agg(
        F.every(F.array_join("subwords", "") == F.col("word"))
        .alias("roundtrip_ok"))
    vocab = toks.select("token").distinct().agg(
        F.count(F.lit(1)).alias("__vocab"))
    alphabet = (encoded
                .select(F.explode(F.split("word", "")).alias("c"))
                .distinct().agg(F.count(F.lit(1)).alias("__alpha")))
    bound = (vocab.crossJoin(F.broadcast(alphabet))
             .select((F.col("__vocab") <= F.col("__alpha")
                      + F.lit(len(merges))).alias("vocab_within_bound")))
    # 1-row theorem scalars: broadcast anchors (the dedup_simhash pattern)
    return (anchors.crossJoin(F.broadcast(mass))
            .crossJoin(F.broadcast(roundtrip))
            .crossJoin(F.broadcast(bound)))


ORACLE_BPE_TOKENIZE = """
WITH toks AS (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
    FROM documents WHERE lang = 'en'
), words AS (
    SELECT word, COUNT(*) AS n FROM toks WHERE word <> '' GROUP BY word
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n * length(word)) AS BIGINT) AS total_char_mass,
       TRUE AS roundtrip_ok,
       TRUE AS vocab_within_bound
FROM words
"""


_OOV_VOCAB_SIZE = 40


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per source, the share of token occurrences
    falling outside the top-40 corpus vocabulary — the OOV rate a
    fixed-vocab tokenizer would hit on each slice.

    The vocabulary is a 40-row aggregate (deterministic count-then-word
    tiebreak), broadcast; membership is a map-side left-semi-style flag, so
    the corpus shuffles once (per-source rollup). The per-source OOV rate is
    THE go/no-go number when a tokenizer trained on one mix is applied to a
    new source at scale.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select(
        "source",
        F.explode(F.filter(F.split(F.lower("text"), _TOKEN_SPLIT),
                           lambda t: t != F.lit(""))).alias("word"))
    vocab = (
        toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word").limit(_OOV_VOCAB_SIZE)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"))
        .withColumn("oov_rate",
                    F.round(F.col("n_oov") / F.col("n_tokens"), 4))
        .orderBy("source")
    )


ORACLE_OOV_RATE = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text),
                                                  '{_TOKEN_SPLIT}'),
                            t -> t <> '')) AS word
  FROM documents WHERE lang = 'en'
), vocab AS (
  SELECT word FROM toks GROUP BY word
  ORDER BY COUNT(*) DESC, word LIMIT {_OOV_VOCAB_SIZE}
)
SELECT source, COUNT(*) AS n_tokens,
       COUNT(*) FILTER (word NOT IN (SELECT word FROM vocab)) AS n_oov,
       round(COUNT(*) FILTER (word NOT IN (SELECT word FROM vocab))
             / CAST(COUNT(*) AS DOUBLE), 4) AS oov_rate
FROM toks
GROUP BY source
ORDER BY source
"""


_BM25_TERMS = ("spark", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring for a fixed query — the IR ranking function
    (Robertson/Sparck Jones, public formula) over the corpus.

    All statistics come from the one tf aggregate the TF-IDF query already
    uses: df per term (window over the tf table), document length and its
    corpus average (broadcast 1-row anchor). The doclen join carries NO
    hint — doclen is one row per document (corpus cardinality; a forced
    broadcast is the exact bug class plans/lint.py forbids), while the tf
    side is posting-list-sized, so AQE's runtime size check broadcasts the
    SMALL side of that join on its own. Every scored doc contains ≥1
    query term, so the candidate set is the tf rows of two terms — at
    100 TB this is an index-free search whose cost is the posting lists'
    size, not the corpus (term filter pushes into the tf aggregation).
    Output is every matching doc with its rounded score, sorted by doc_id:
    no ranking on raw floats, so the cross-engine hash is stable.
    """
    toks = _tokens(spark, sf_dir)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.avg("dl").alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        toks.filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_w = Window.partitionBy("word")
    idf = F.log(
        (F.col("n_docs") - F.col("df_docs") + 0.5)
        / (F.col("df_docs") + 0.5) + 1.0)
    denom = (F.col("tf")
             + _BM25_K1 * (1.0 - _BM25_B + _BM25_B
                           * F.col("dl") / F.col("avgdl")))
    return (
        tf.withColumn("df_docs", F.count(F.lit(1)).over(df_w))
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * F.col("tf") / denom), 4).alias("bm25"),
             F.count(F.lit(1)).alias("terms_matched"))
        .orderBy("doc_id")
    )


_BM25_CTES = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{{_TS}}')) AS word
  FROM documents WHERE lang = 'en'
), filtered AS (
  SELECT doc_id, word FROM toks WHERE length(word) >= {{_MINLEN}}
), doclen AS (
  SELECT doc_id, COUNT(*) AS dl FROM filtered GROUP BY doc_id
), stats AS (
  SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n_docs FROM doclen
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf
  FROM filtered WHERE word IN ('spark', 'join')
  GROUP BY doc_id, word
), scored AS (
  SELECT tf.doc_id,
         ln((n_docs - COUNT(*) OVER (PARTITION BY word) + 0.5)
            / (COUNT(*) OVER (PARTITION BY word) + 0.5) + 1.0)
         * tf / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B}
                                    * dl / avgdl)) AS s
  FROM tf JOIN doclen USING (doc_id) CROSS JOIN stats
)""".replace("{_TS}", _TOKEN_SPLIT).replace("{_MINLEN}", str(_MIN_WORD_LEN))

ORACLE_BM25_SEARCH = _BM25_CTES + """
SELECT doc_id, round(SUM(s), 4) AS bm25, COUNT(*) AS terms_matched
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ⊕ embedding cosine via reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60          # standard RRF damping (Cormack/Clarke/Buettcher 2009)
_RRF_DEPTH = 20      # fuse the top-20 of each ranker
_RRF_QUERY_VEC = 1   # embeddings row used as the dense query


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval: fuse the BM25 ranking (fixed query
    terms, ``q_bm25_search``) with an embedding-cosine ranking (query
    vector = embeddings row ``vec_id=1``) by reciprocal-rank fusion:
    score(d) = Σ_lists 1/(K + rank_list(d)) over each ranker's top-20.

    RRF needs only ranks, never comparable scores, which is what makes it
    the standard way to merge a sparse and a dense retriever. Both input
    rankings order by a ROUNDED score (4 dp) with id tiebreak, so the rank
    — and therefore the fused output — is stable across engines and
    accumulation orders. Each ranker's result is ≤ posting-list / corpus
    top-k sized, so the fusion join is a few-hundred-row sort — the heavy
    lifting stays in the two rankers, which at 100 TB are the index-free
    BM25 scan and an ANN probe respectively.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == _RRF_QUERY_VEC) \
        .select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x * x))
    cos_rank_w = Window.orderBy(F.desc("cosine"), F.col("doc_id"))
    dense = (
        emb.filter(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (nrm(F.col("embedding")) * nrm(F.col("qv"))), 4)
            .alias("cosine"))
        .withColumn("rank", F.row_number().over(cos_rank_w))
        .filter(F.col("rank") <= _RRF_DEPTH)
    )
    bm25_rank_w = Window.orderBy(F.desc("bm25"), F.col("doc_id"))
    sparse = (
        q_bm25_search(spark, sf_dir)
        .withColumn("rank", F.row_number().over(bm25_rank_w))
        .filter(F.col("rank") <= _RRF_DEPTH)
    )
    rrf = F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rank"))
    fused = (
        sparse.select("doc_id", rrf.alias("contrib"))
        .unionByName(dense.select("doc_id", rrf.alias("contrib")))
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("rrf_score"),
             F.count(F.lit(1)).alias("n_lists"))
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )
    return fused


ORACLE_HYBRID_SEARCH = _BM25_CTES + f"""
, bm25_ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM (SELECT doc_id, round(SUM(s), 4) AS bm25
        FROM scored GROUP BY doc_id)
), flat AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), qv AS (
  SELECT dim, v AS qv FROM flat WHERE vec_id = {_RRF_QUERY_VEC}
), cos AS (
  SELECT f.vec_id AS doc_id,
         round(SUM(f.v * q.qv)
               / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(q.qv * q.qv))), 4)
             AS cosine
  FROM flat f JOIN qv q ON f.dim = q.dim
  WHERE f.vec_id <> {_RRF_QUERY_VEC}
  GROUP BY f.vec_id
), cos_ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rank
  FROM cos
), contribs AS (
  SELECT doc_id, 1.0 / ({_RRF_K} + rank) AS contrib
  FROM bm25_ranked WHERE rank <= {_RRF_DEPTH}
  UNION ALL
  SELECT doc_id, 1.0 / ({_RRF_K} + rank) AS contrib
  FROM cos_ranked WHERE rank <= {_RRF_DEPTH}
)
SELECT doc_id, round(SUM(contrib), 6) AS rrf_score,
       COUNT(*) AS n_lists
FROM contribs
GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Inverted-index materialization (posting lists as arrays)
# ---------------------------------------------------------------------------

_INDEX_MIN_DF = 3


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the search index the index-free BM25 query implies:
    one row per term with document frequency, total term frequency, and
    the sorted posting list (doc_ids) packed as an array — the layout a
    serving tier loads, and the precomputation that turns every later
    retrieval query's cost from corpus-sized to posting-list-sized.

    One (doc, word) aggregate then one (word) aggregate — both partial-
    combined; posting lists are array_sort(collect_list(...)) so the
    packed array is deterministic regardless of shuffle order. Rare terms
    below df=3 are dropped (the long tail that bloats an index without
    serving queries). At 100 TB posting lists for stopword-like terms are
    the skew risk: cap or shard them (the df filter is the first dial).
    """
    tf = (_tokens(spark, sf_dir)
          .groupBy("word", "doc_id")
          .agg(F.count(F.lit(1)).alias("tf")))
    return (
        tf.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df_docs"),
             F.sum("tf").alias("total_tf"),
             F.array_sort(F.collect_list("doc_id")).alias("postings"))
        .filter(F.col("df_docs") >= _INDEX_MIN_DF)
        # the packed list is serialized to a comma-joined string for the
        # cross-engine hash (array encodings differ between engines'
        # pandas bridges); a real index writer would keep the array column
        .select("word", "df_docs", "total_tf",
                F.array_join(F.col("postings"), ",").alias("postings"))
        .orderBy("word")
    )


ORACLE_INVERTED_INDEX = f"""
WITH tf AS (
  SELECT word, doc_id, COUNT(*) AS tf FROM filtered GROUP BY word, doc_id
)
SELECT word, COUNT(*) AS df_docs,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM tf
GROUP BY word
HAVING COUNT(*) >= {_INDEX_MIN_DF}
ORDER BY word
"""
# reuse the BM25 CTE prefix for identical tokenization
ORACLE_INVERTED_INDEX = _BM25_CTES.split(", doclen AS")[0] + \
    ORACLE_INVERTED_INDEX.replace("WITH tf AS", ", tf AS")


# ---------------------------------------------------------------------------
# Corpus statistics: Heaps'-law vocabulary growth + Zipf exponent
# ---------------------------------------------------------------------------

_VOCAB_BUCKET_DOCS = 50
_ZIPF_TOP = 100


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct vocabulary
    vs cumulative tokens as the corpus grows in doc_id order (bucketed
    every 50 docs) — the curve whose flattening tells you when more data
    stops buying new vocabulary (tokenizer/corpus sizing evidence).

    Scalable identity (same trick as the user growth curve): each word
    contributes once, at its FIRST document, so cumulative-distinct is a
    first-seen aggregate (|vocab| rows) + running sums over the tiny
    bucket rollup — no distinct-over-growing-frame state anywhere.
    """
    toks = _tokens(spark, sf_dir)
    bucket = (F.floor(F.col("doc_id") / _VOCAB_BUCKET_DOCS)
              .cast("long").alias("bucket"))
    first_seen = (
        toks.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
        .select((F.floor(F.col("first_doc") / _VOCAB_BUCKET_DOCS))
                .cast("long").alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("new_words"))
    )
    tokens_per_bucket = (
        toks.select(bucket)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_tokens"))
    )
    # running sums via the distributed prefix-sum operator: the bucket
    # rollup grows with the corpus (|docs|/bucket_size rows), so a
    # partition-less window here would be a single-task scan at scale;
    # both cumulative series share one range exchange
    from ..operators.ranking import with_running_sums

    joined = (
        tokens_per_bucket.join(first_seen, "bucket", "left")
        .na.fill({"new_words": 0})
    )
    return (
        with_running_sums(joined, [F.asc("bucket")],
                          {"cum_tokens": "bucket_tokens",
                           "cum_vocab": "new_words"})
        .select("bucket", "cum_tokens", "cum_vocab")
        .orderBy("bucket")
    )


ORACLE_VOCAB_GROWTH = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{{_TS}}')) AS word
  FROM documents WHERE lang = 'en'
), filtered AS (
  SELECT doc_id, word FROM toks WHERE length(word) >= {{_MINLEN}}
), first_seen AS (
  SELECT (MIN(doc_id) // {_VOCAB_BUCKET_DOCS}) AS bucket
  FROM filtered GROUP BY word
), new_words AS (
  SELECT bucket, COUNT(*) AS new_words FROM first_seen GROUP BY bucket
), tokens_per_bucket AS (
  SELECT (doc_id // {_VOCAB_BUCKET_DOCS}) AS bucket,
         COUNT(*) AS bucket_tokens
  FROM filtered GROUP BY 1
)
SELECT t.bucket,
       CAST(SUM(t.bucket_tokens) OVER (ORDER BY t.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens,
       CAST(SUM(COALESCE(n.new_words, 0)) OVER (ORDER BY t.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_vocab
FROM tokens_per_bucket t LEFT JOIN new_words n ON t.bucket = n.bucket
ORDER BY t.bucket
""".replace("{_TS}", _TOKEN_SPLIT).replace("{_MINLEN}", str(_MIN_WORD_LEN))


def q_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of log(frequency) on log(rank) over the
    top-100 words — natural corpora sit near −1; a corpus that doesn't is
    synthetic, templated, or broken (and this one IS synthetic, which the
    number shows). One word-count aggregate, a top-k window over it, and
    an algebraic regression over 100 rows."""
    wf = (_tokens(spark, sf_dir)
          .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    rank_w = Window.orderBy(F.desc("freq"), F.col("word"))
    ranked = (wf.withColumn("rank", F.row_number().over(rank_w))
              .filter(F.col("rank") <= _ZIPF_TOP))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 4)
        .alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rank")), 4).alias("r2"),
    )


ORACLE_ZIPF_EXPONENT = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '{{_TS}}')) AS word
  FROM documents WHERE lang = 'en'
), wf AS (
  SELECT word, COUNT(*) AS freq FROM toks
  WHERE length(word) >= {{_MINLEN}} GROUP BY word
), ranked AS (
  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rank
  FROM wf QUALIFY rank <= {_ZIPF_TOP}
)
SELECT COUNT(*) AS n_words,
       round(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope,
       round(regr_r2(ln(freq), ln(rank)), 4) AS r2
FROM ranked
""".replace("{_TS}", _TOKEN_SPLIT).replace("{_MINLEN}", str(_MIN_WORD_LEN))
