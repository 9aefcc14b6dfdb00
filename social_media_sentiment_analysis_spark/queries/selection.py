"""Data-selection operators for pretraining pipelines: DSIR-style importance
resampling, duplicated-span detection, deterministic per-group sampling, and
tokenizer-fertility profiling.

These extend the engine beyond the reference's own surface (SURVEY §2 covers
the reference; this module is part of the BASELINE north-star "LLM-data
pipeline" set). All four are pure Column algebra — every query has an exact
DuckDB oracle twin.

Shared cross-engine primitives:
- hash bucket: ``conv(substr(md5(x),1,4),16,10)`` == DuckDB
  ``CAST('0x'||substring(md5(x),1,4) AS BIGINT)`` — deterministic,
  engine-independent.
- tokens: lowercase split on ``[^a-z]+`` (same regex dialect both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table

_TOKEN_SPLIT = "[^a-z]+"
_N_BUCKETS = 64
_DSIR_TARGET_SOURCE = "src1"
_SPAN_K = 8  # tokens per shingle for span detection


def _words(docs: DataFrame) -> DataFrame:
    """(doc_id, source, word) — lowercase alpha tokens, exploded."""
    arr = F.filter(F.split(F.lower("text"), _TOKEN_SPLIT),
                   lambda t: t != F.lit(""))
    return docs.select("doc_id", "source", F.explode(arr).alias("w"))


_SQL_WORDS = f"""
WITH words AS (
    SELECT doc_id, source, unnest(list_filter(
        regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
        t -> t <> '')) AS w
    FROM documents
)
"""


def _bucket(col: F.Column) -> F.Column:
    return (F.conv(F.substring(F.md5(col), 1, 4), 16, 10)
            .cast("long") % _N_BUCKETS)


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (data selection with importance weights)
# ---------------------------------------------------------------------------

def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: score every raw-pool document by how much
    its hashed-n-gram feature distribution looks like a TARGET domain, and
    keep the docs whose average log importance ratio is positive.

    Following the published DSIR recipe (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): features are
    words hashed into a fixed bucket space; the target (here: docs from
    source 'src1') and raw (all other sources) corpora each induce a
    smoothed bucket distribution p / q; a doc's weight is the mean over its
    words of ln(p[b]/q[b]). Selection keeps weight > 0 — "more target-like
    than raw-average" — with no float *ranking* (sign tests are robust
    cross-engine; ordered top-k on computed doubles is not).

    Plan shape at scale: the bucket tables are 64 rows (broadcast); the
    corpus shuffles once to explode+aggregate per-doc sums. This is exactly
    the hashed-feature pass a 100 TB selection job runs — the model fits in
    a closure, the data is touched twice (estimate, score), both map-heavy.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Tokenize+hash ONCE: the estimate pass (bucket counts -> totals and
    # ratios) and the scoring pass all consume the same exploded table, and
    # without a barrier each consumer re-ran the tokenize/explode inside
    # the scan stage (profiled: three 0.3-0.6 s single-task stages at
    # sf0.1). The checkpoint keeps only (doc_id, source, b) — the word
    # itself never crosses a stage boundary. The checkpoint inherits the
    # scan's partitioning, so at 100 TB (many-file layout) the one
    # tokenize pass is parallel; spreading it wider HERE was measured
    # slower (each consumer pass then pays a 32-task wave for 270k rows).
    words = (_words(docs)
             .select("doc_id", "source", _bucket(F.col("w")).alias("b"))
             .localCheckpoint())
    is_target = F.col("source") == _DSIR_TARGET_SOURCE

    # 64 rows, TWO consumers (totals and ratios) — checkpoint so the
    # bucket-count aggregation over the corpus runs once, not twice
    counts = (words.groupBy("b")
              .agg(F.count(F.when(is_target, 1)).alias("n_tgt"),
                   F.count(F.when(~is_target, 1)).alias("n_raw"))
              .coalesce(1).localCheckpoint())
    totals = counts.agg(F.sum("n_tgt").alias("t_tot"),
                        F.sum("n_raw").alias("r_tot"))
    ratios = (counts.crossJoin(F.broadcast(totals))
              .select("b",
                      (F.log((F.col("n_tgt") + 1.0)
                             / (F.col("t_tot") + F.lit(_N_BUCKETS)))
                       - F.log((F.col("n_raw") + 1.0)
                               / (F.col("r_tot") + F.lit(_N_BUCKETS))))
                      .alias("log_ratio")))

    # The rounded weight feeds a MEMBERSHIP test (> 0), so it must be
    # engine-exact: decimal-summed mean (order-independent) + the shared
    # floor-half-up rounding, not native AVG/round whose ulp divergence
    # flips rows in and out of the result (functions/rounding.py).
    from ..functions.rounding import decimal_sum, round_half_up

    scored = (words.filter(~is_target)
              .join(F.broadcast(ratios), "b")
              .groupBy("doc_id", "source")
              .agg(F.count(F.lit(1)).alias("n_words"),
                   round_half_up(
                       decimal_sum(F.col("log_ratio"), 26, 12)
                       / F.count(F.lit(1)), 6).alias("weight")))
    return (scored.filter(F.col("weight") > 0)
            .select("doc_id", "source", "n_words", "weight")
            .orderBy("doc_id"))


ORACLE_DSIR_SELECT = _SQL_WORDS + f"""
, bucketed AS (
    SELECT doc_id, source,
           CAST('0x' || substring(md5(w), 1, 4) AS BIGINT) % {_N_BUCKETS}
               AS b
    FROM words
), counts AS (
    SELECT b,
           COUNT(*) FILTER (source = '{_DSIR_TARGET_SOURCE}') AS n_tgt,
           COUNT(*) FILTER (source <> '{_DSIR_TARGET_SOURCE}') AS n_raw
    FROM bucketed GROUP BY b
), totals AS (
    SELECT SUM(n_tgt) AS t_tot, SUM(n_raw) AS r_tot FROM counts
), ratios AS (
    SELECT b, ln((n_tgt + 1.0) / (t_tot + {_N_BUCKETS}))
              - ln((n_raw + 1.0) / (r_tot + {_N_BUCKETS})) AS log_ratio
    FROM counts CROSS JOIN totals
), scored AS (
    SELECT doc_id, source, COUNT(*) AS n_words,
           floor((CAST(SUM(CAST(log_ratio AS DECIMAL(26,12))) AS DOUBLE)
                  / COUNT(*)) * 1000000 + 0.5) / 1000000 AS weight
    FROM bucketed JOIN ratios USING (b)
    WHERE source <> '{_DSIR_TARGET_SOURCE}'
    GROUP BY doc_id, source
)
SELECT doc_id, source, n_words, weight
FROM scored WHERE weight > 0
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Duplicated-span detection (suffix-array-lite substring dedup)
# ---------------------------------------------------------------------------

def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN detection: for every document, find
    maximal runs of {_SPAN_K}-token shingles that also occur in at least
    one OTHER document — the shingle-table approximation of exact substring
    deduplication (Lee et al., "Deduplicating Training Data Makes Language
    Models Better" build a suffix array; positional shingle hashing finds
    the same ≥k-token repeated substrings with relational ops only).

    Per doc: n_spans (maximal runs of consecutive duplicated shingle start
    positions), dup_tokens (Σ span token lengths, spans measured start..
    start+k-1), longest_span. Docs with no duplicated span are omitted.

    Plan (r5 rewrite, see duplicated_spans): positional shingles are one
    map-side posexplode; ONE window over hash(h) marks duplicated
    positions in place (min(doc) != max(doc) over the h-group — no
    aggregate-and-join-back, no second tokenization of the corpus); the
    island grouping then windows within doc_id (one hits-sized exchange,
    reused by the final per-doc aggregate). Two content exchanges total —
    the r4 shape paid four, measured by tools/shuffle_probe.py. At 100 TB
    the shingle table is the same artifact the MinHash pipeline already
    materializes — this query reads positions from it rather than
    re-shingling.

    r9 (guide §2.5 input skew): the positional-shingle projection (md5
    per shingle, posexplode) is fused into the scan, and the single-file
    test input is unsplittable — the whole fan-out ran in ONE task before
    the window's h-exchange. ``spread_scan`` round-robins the raw docs
    first (NO-OP on a many-file 100 TB layout); single consumer chain, so
    the exchange is computed once (unlike the bloom first cut). Paired
    interleaved A/B at sf0.1: +0.42 s/pass median, 7/7 steady passes
    (~1.95 → 1.55 s). The same spread was measured SLOWER on
    q_dedup_rewrite (−0.21 s median: its chunk fan-out is ~k× lighter
    than per-shingle md5, so the text exchange costs more than it
    parallelizes) and rejected there — OPTIMIZATION_r09.md.
    """
    from ..sources.batch import spread_scan

    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    return (duplicated_spans(docs, "text", "doc_id", k=_SPAN_K)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum("span_tokens").alias("dup_tokens"),
                 F.max("span_tokens").alias("longest_span"))
            .orderBy("doc_id"))


def _positional_shingles(docs: DataFrame, text_col: str, id_col: str,
                         k: int, materialize: bool = True) -> DataFrame:
    """(id, pos, h): every k-token shingle of every eligible document with
    its 0-based start position — the positional dedup-index artifact shared
    by the span queries. The table feeds two consumers (the hash profile/
    benchmark set AND the position probe), so it must materialize once,
    not re-tokenize per consumer. Two sharing mechanisms:

    - ``materialize=True`` (contamination_spans): ``localCheckpoint``
      — the benchmark branch is a 1%-slice distinct and the probe is a
      broadcast semi-join, so neither consumer wants an h-shuffle and the
      checkpoint's partitioning loss is irrelevant.
    - ``materialize=False`` (duplicated_spans): the raw lazy frame — its
      r5 rewrite has a SINGLE consumer (one window over h), so there is
      nothing to share and any barrier would only add cost."""
    arr = F.filter(F.split(F.lower(text_col), _TOKEN_SPLIT),
                   lambda t: t != F.lit(""))
    toked = docs.select(F.col(id_col), arr.alias("arr")) \
        .filter(F.size("arr") >= k)
    n_sh = F.size("arr") - F.lit(k - 1)
    sh = toked.select(
        id_col,
        F.posexplode(F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.md5(F.concat_ws(" ", F.slice("arr", i, k)))
        )).alias("pos", "h"))
    return sh.localCheckpoint() if materialize else sh


def _island_spans(marked: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge marked shingle start positions into maximal spans: runs of
    consecutive positions collapse via the pos − row_number island key.
    Positions are 1-based in the output; a span covers start_pos ..
    end_pos+k-1 tokens."""
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = marked.withColumn(
        "isl", F.col("pos") - F.row_number().over(w))
    return (islands.groupBy(id_col, "isl")
            .agg((F.min("pos") + F.lit(1)).alias("start_pos"),
                 (F.max("pos") + F.lit(1)).alias("end_pos"),
                 (F.max("pos") - F.min("pos") + F.lit(k))
                 .alias("span_tokens"))
            .drop("isl"))


def duplicated_spans(docs: DataFrame, text_col: str, id_col: str,
                     k: int = _SPAN_K) -> DataFrame:
    """(id, start_pos, end_pos, span_tokens) per maximal duplicated span:
    runs of consecutive k-shingle start positions whose shingle also occurs
    in ≥ 1 other document. Positions are 1-based over the lowercase-alpha
    token array; a span covers start_pos .. end_pos+k-1 tokens. Core of
    ``q_dedup_spans`` — see its docstring for the plan-shape story; the
    cross-engine property pin is tests/test_properties.py."""
    sh = _positional_shingles(docs, text_col, id_col, k, materialize=False)
    # "appears in >= 2 distinct documents" == the h-group's doc ids are not
    # all equal == min(doc) != max(doc) — a WINDOW over h, not an
    # aggregate-and-join-back: one corpus exchange (the window's hash(h)
    # sort) replaces the r4 shape's three (profile agg + join re-shuffle,
    # plus a second scan/tokenize of the corpus for the profile branch).
    # min/max stream through the whole-partition frame; a pathologically
    # hot shingle serializes its h-group into one task either way (same
    # skew class as the groupBy formulation — cap shingle frequency
    # upstream if a corpus has universal boilerplate).
    w_h = Window.partitionBy("h")
    dup_pos = (sh
               .withColumn("__dmin", F.min(id_col).over(w_h))
               .withColumn("__dmax", F.max(id_col).over(w_h))
               .filter(F.col("__dmin") != F.col("__dmax"))
               .drop("__dmin", "__dmax"))
    return _island_spans(dup_pos, id_col, k)


ORACLE_DEDUP_SPANS = f"""
WITH toked AS (
    SELECT doc_id, list_filter(
        regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
        t -> t <> '') AS arr
    FROM documents
), eligible AS (
    SELECT doc_id, arr FROM toked WHERE len(arr) >= {_SPAN_K}
), sh AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(arr[i:i+{_SPAN_K - 1}], ' ')) AS h
    FROM eligible, unnest(range(1, len(arr) - {_SPAN_K - 1} + 1)) AS t(i)
), dup AS (
    SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), dup_pos AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
    FROM sh WHERE h IN (SELECT h FROM dup)
), spans AS (
    SELECT doc_id, isl,
           MAX(pos) - MIN(pos) + {_SPAN_K} AS span_tokens
    FROM dup_pos GROUP BY doc_id, isl
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
       CAST(MAX(span_tokens) AS BIGINT) AS longest_span
FROM spans GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic k-per-group sampling
# ---------------------------------------------------------------------------

_SAMPLE_K = 5


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: the first {_SAMPLE_K} events of
    each type under an md5 shuffle order — engine-independent "random"
    sampling (reservoir semantics without reservoir state: the md5 of the
    key IS the uniform draw, reproducible across engines/runs/retries).

    One exchange (partition by type), rank, filter — the standard inspect-
    a-few-per-stratum pipeline debug query. At 100 TB the same plan holds;
    skew is bounded because every group truncates to k rows at the window.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type") \
        .orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
    return (events
            .select("event_id", "event_type",
                    F.md5(F.col("event_id").cast("string")).alias("draw"))
            .withColumn("draw_rank", F.row_number().over(w))
            .filter(F.col("draw_rank") <= _SAMPLE_K)
            .select("event_type", "draw_rank", "event_id")
            .orderBy("event_type", "draw_rank"))


ORACLE_GROUP_SAMPLE = f"""
WITH ranked AS (
    SELECT event_type, event_id,
           ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS draw_rank
    FROM events
)
SELECT event_type, draw_rank, event_id
FROM ranked WHERE draw_rank <= {_SAMPLE_K}
ORDER BY event_type, draw_rank
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility profile
# ---------------------------------------------------------------------------

def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile per source: BPE-ish pieces per
    whitespace word and bytes per piece — the budgeting stats a tokenizer
    change is evaluated with (fertility ↑ means the tokenizer fragments
    this source's text more; bytes/token is the compression the model
    actually sees).

    One scan, one small aggregate; all token counting is JVM regex.
    """
    from ..functions.text import BPE_ISH_PATTERN, clean_text

    docs = load_table(spark, sf_dir, "documents")
    c = clean_text(F.col("text"))
    staged = docs.select(
        "source",
        F.octet_length(c).alias("n_bytes"),
        F.when(c == "", F.lit(0))
         .otherwise(F.size(F.split(c, " "))).alias("n_words"),
        F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).alias("n_pieces"))
    return (staged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.sum("n_words").alias("total_words"),
                 F.sum("n_pieces").alias("total_pieces"),
                 # NULLIF: a source whose docs all clean to '' has zero
                 # words/pieces — ANSI mode would throw on the division,
                 # and the oracle must agree on NULL (not NaN)
                 F.round(F.sum("n_pieces")
                         / F.nullif(F.sum("n_words"), F.lit(0)), 4)
                  .alias("fertility"),
                 F.round(F.sum("n_bytes")
                         / F.nullif(F.sum("n_pieces"), F.lit(0)), 4)
                  .alias("bytes_per_piece"))
            .orderBy("source"))


def _sql_clean_expr() -> str:
    from .sqlgen import sql_clean
    return sql_clean("text")


def _oracle_tokenizer_fertility() -> str:
    return f"""
WITH docs AS (
    SELECT source, {_sql_clean_expr()} AS cleaned_text FROM documents
), feats AS (
    SELECT source,
           strlen(cleaned_text) AS n_bytes,
           CASE WHEN cleaned_text = '' THEN 0
                ELSE len(string_split(cleaned_text, ' ')) END AS n_words,
           len(regexp_extract_all(cleaned_text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS n_pieces
    FROM docs
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
       round(SUM(n_pieces) / CAST(NULLIF(SUM(n_words), 0) AS DOUBLE), 4)
           AS fertility,
       round(SUM(n_bytes) / CAST(NULLIF(SUM(n_pieces), 0) AS DOUBLE), 4)
           AS bytes_per_piece
FROM feats GROUP BY source
ORDER BY source
"""


ORACLE_TOKENIZER_FERTILITY = _oracle_tokenizer_fertility()


# ---------------------------------------------------------------------------
# Span-level benchmark contamination
# ---------------------------------------------------------------------------

_CONTAM_K = 3  # tokens per shingle (matches the doc-level check)


def q_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination: for every candidate document,
    the maximal token spans whose {_CONTAM_K}-gram shingles appear in the
    held-out benchmark slice (doc_id % 100 == 0) — the surgical variant of
    the doc-level ``contamination`` check: pipelines that REDACT the
    leaked span instead of dropping the whole document (PaLM/GPT-3-style
    decontamination) need exactly these offsets.

    Same islands idiom as ``dedup_spans`` with the duplicated-hash set
    replaced by the broadcast benchmark shingle set: positional shingles
    are one map-side posexplode, the probe is a broadcast semi-join (the
    benchmark is eval-suite-sized by construction), the island merge
    windows within doc_id. Reported per contaminated doc: span count,
    contaminated token estimate, longest span.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _positional_shingles(docs, "text", "doc_id", _CONTAM_K)
    bench = (sh.filter(F.col("doc_id") % 100 == 0)
             .select("h").distinct())
    hits = (sh.filter(F.col("doc_id") % 100 != 0)
            .join(F.broadcast(bench), "h", "left_semi"))
    spans = _island_spans(hits, "doc_id", _CONTAM_K)
    return (spans.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum("span_tokens").alias("contaminated_tokens"),
                 F.max("span_tokens").alias("longest_span"))
            .orderBy("doc_id"))


ORACLE_CONTAMINATION_SPANS = f"""
WITH toked AS (
    SELECT doc_id, list_filter(
        regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
        t -> t <> '') AS arr
    FROM documents
), eligible AS (
    SELECT doc_id, arr FROM toked WHERE len(arr) >= {_CONTAM_K}
), sh AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(arr[i:i+{_CONTAM_K - 1}], ' ')) AS h
    FROM eligible, unnest(range(1, len(arr) - {_CONTAM_K} + 2)) AS t(i)
), bench AS (
    SELECT DISTINCT h FROM sh WHERE doc_id % 100 = 0
), hits AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
    FROM sh WHERE doc_id % 100 <> 0 AND h IN (SELECT h FROM bench)
), spans AS (
    SELECT doc_id, isl,
           MAX(pos) - MIN(pos) + {_CONTAM_K} AS span_tokens
    FROM hits GROUP BY doc_id, isl
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(span_tokens) AS BIGINT) AS contaminated_tokens,
       CAST(MAX(span_tokens) AS BIGINT) AS longest_span
FROM spans GROUP BY doc_id
ORDER BY doc_id
"""

def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets an
    exact 1-based position under a seeded content-independent permutation
    (ORDER BY md5(doc_id), doc_id) — the "shuffle the corpus before
    sharding" step every pretraining run needs, made reproducible.

    This is the oracle-gated workout for ``operators/ranking.py`` on an
    UNBOUNDED corpus: a naive ROW_NUMBER() OVER (ORDER BY md5) plans a
    single-task window; ``with_global_rank`` computes the identical
    positions with one range exchange + a P-row broadcast (module
    docstring has the cost proof; the DuckDB twin below is the exactness
    proof, re-checked per driver round)."""
    from ..operators.ranking import with_global_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__key"))
    ranked = with_global_rank(
        docs, [F.asc("__key"), F.asc("doc_id")], rank_col="position")
    return ranked.select("doc_id", "position")


ORACLE_TRAINING_ORDER = """
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS position
FROM documents
"""


_WINNOW_K = 4   # shingle width (tokens) — the noise threshold
_WINNOW_W = 4   # window width (shingles) — guarantee span = w + k - 1


def winnowing_window_minima(docs: DataFrame, text_col: str, id_col: str,
                            k: int = _WINNOW_K,
                            w: int = _WINNOW_W) -> DataFrame:
    """(id, pos, fp): each full w-window's minimum k-gram hash — the raw
    winnowing selection stream. ``SELECT DISTINCT id, fp`` of it is the
    document's fingerprint set (the guarantee: any shared substring of
    ≥ w+k-1 tokens between two documents yields a shared fp — pinned
    against a pure-Python reference in tests/test_properties.py).
    One corpus exchange (the per-doc window sort) — placed BEFORE the
    shingle projection: the window needs a hash-by-``id_col`` exchange
    either way, and issuing it on the raw documents instead of the
    shingle stream (a) shuffles the text once instead of the ~8-30x
    larger (pos, md5) fan-out (guide §2.3) and (b) runs the expensive
    tokenize/slice/md5 projection AFTER the exchange, spread over the
    shuffle partitions, instead of inside the scan stage — which for an
    unsplittable single-row-group input file is ONE task (guide §2.5
    input skew; measured a 2.8 s single-task stage at sf0.1). Same
    exchange count at any scale; the window reuses the partitioning
    (same key, same partition count)."""
    n_parts = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    sh = _positional_shingles(docs.repartition(n_parts, id_col),
                              text_col, id_col, k, materialize=False)
    w_win = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(-(w - 1), 0))
    return (sh.withColumn("fp", F.min("h").over(w_win))
            .filter(F.col("pos") >= w - 1)
            .select(id_col, "pos", "fp"))


def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS local fingerprinting algorithm): slide a w-window over the
    k-token shingle hash sequence and keep each window's MINIMUM hash —
    any substring match of at least w+k-1 tokens between two documents is
    then guaranteed to share a selected fingerprint, at ~2/(w+1) the
    index size of the full shingle set. The per-source rollup reports the
    selection density (selected/total shingles — should sit near the
    2/(w+1) theoretical rate for random text) and the cross-document
    fingerprint collision share (fingerprints kept by >= 2 docs — the
    dup-candidate index this pipeline feeds).

    The fingerprint SET per document equals DISTINCT(window-min): winnowing
    selects one position per window, but the selected VALUES collapse to
    exactly the distinct per-window minima, which is what an index keys on
    — so the whole operator is relational: positional shingles (map-side
    posexplode) → min over a w-row window within doc (ONE corpus exchange,
    by doc) → distinct + per-doc counts reuse that partitioning
    exchange-free → doc-level join back for source → per-source aggregate.
    Only full windows select (pos >= w-1), per the paper.
    """
    docs = load_table(spark, sf_dir, "documents")
    fps = (winnowing_window_minima(docs, "text", "doc_id",
                                   k=_WINNOW_K, w=_WINNOW_W)
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_windows"),
                F.count_distinct("fp").alias("n_fps")))
    per_doc = fps.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id")
    return _fingerprint_source_rollup(per_doc)


def _fingerprint_source_rollup(per_doc: DataFrame) -> DataFrame:
    """Per-source selection-density rollup over per-doc winnowing stats
    (doc_id, source, n_windows, n_fps) — shared by the corpus-rebuilding
    query above and ``winnowing_fingerprints_from_index``."""
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_fps").cast("bigint").alias("total_fps"),
                 F.round(F.sum("n_fps") / F.sum("n_windows"), 4)
                 .alias("selection_density"))
            .orderBy("source"))


ORACLE_WINNOWING_FINGERPRINTS = f"""
WITH toked AS (
    SELECT doc_id, source, list_filter(
        regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
        t -> t <> '') AS arr
    FROM documents
), eligible AS (
    SELECT doc_id, source, arr FROM toked WHERE len(arr) >= {_WINNOW_K}
), sh AS (
    SELECT doc_id, source, i - 1 AS pos,
           md5(array_to_string(arr[i:i+{_WINNOW_K - 1}], ' ')) AS h
    FROM eligible, unnest(range(1, len(arr) - {_WINNOW_K} + 2)) AS t(i)
), wm AS (
    SELECT doc_id, source, pos,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {_WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS fp
    FROM sh
), perdoc AS (
    SELECT doc_id, source,
           COUNT(*) AS n_windows, COUNT(DISTINCT fp) AS n_fps
    FROM wm WHERE pos >= {_WINNOW_W - 1}
    GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_fps) AS BIGINT) AS total_fps,
       round(SUM(n_fps) / SUM(n_windows), 4) AS selection_density
FROM perdoc GROUP BY source
ORDER BY source
"""


_CONTAIN_MAX_FP_DOCS = 50   # drop universal-boilerplate fingerprints
_CONTAIN_THRESHOLD = 0.5


def q_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment candidates from the winnowing index: pairs
    of documents sharing enough selected fingerprints that the smaller
    fingerprint set is >= {_CONTAIN_THRESHOLD} contained in the overlap —
    the doc-inside-doc detector (quote farms, scraped mirrors with added
    chrome) that symmetric Jaccard misses: a 200-token doc fully pasted
    into a 20k-token page has tiny Jaccard but containment ~1.

    This is the winnowing index USED as its paper intends: the fingerprint
    sets (~2/(w+1) of shingle volume) are the join keys, so the pairwise
    stage runs over fingerprint buckets, never the corpus. Hot
    fingerprints kept by > {_CONTAIN_MAX_FP_DOCS} docs are dropped before
    the self-join (the standard LSH bucket cap — universal boilerplate
    would otherwise create quadratic candidate blowup; bounded loss,
    same policy as the banded MinHash pipeline).

    Plan: winnowing stream (one corpus exchange) → distinct (doc, fp),
    eagerly localCheckpointed — the fingerprint table feeds both sides
    of the self-join and the REST-probe showed the corpus scan+window
    executing once per branch without the barrier (column pruning
    differentiates the subtrees, so AQE stage reuse does not collapse
    them); the checkpoint is fingerprint-sized (~2/(w+1) of the shingle
    volume), the exact artifact a production pipeline would persist as
    its dedup index → per-doc set size as a window count over doc_id
    (each row CARRIES its document's n_fps into the pair stage — no
    aggregate-and-join-back, and critically no broadcast of a
    doc-cardinality table, which is billions of rows at corpus scale;
    r5 verdict #1) → fp-frequency window filter (one fp-keyed exchange)
    → self-equi-join on fp (bucket-bounded, join sides share the
    fp-window stage) → per-pair overlap counts grouped WITH the carried
    sizes (functionally dependent on the doc pair, so same groups).
    """
    docs = load_table(spark, sf_dir, "documents")
    fps = (winnowing_window_minima(docs, "text", "doc_id",
                                   k=_WINNOW_K, w=_WINNOW_W)
           .select("doc_id", "fp").distinct().localCheckpoint())
    return _containment_pairs(fps)


def _containment_pairs(fps: DataFrame) -> DataFrame:
    """The containment pair stage over a (doc_id, fp) fingerprint set —
    shared by the corpus-rebuilding query above and the read-from-index
    path (``winnow_containment_from_index``). See ``q_winnow_containment``
    for the plan narrative."""
    w_doc = Window.partitionBy("doc_id")
    w_fp = Window.partitionBy("fp")
    kept = (fps.withColumn("n_fps", F.count(F.lit(1)).over(w_doc))
            .withColumn("__docs", F.count(F.lit(1)).over(w_fp))
            .filter((F.col("__docs") >= 2)
                    & (F.col("__docs") <= _CONTAIN_MAX_FP_DOCS))
            .drop("__docs"))
    a, b = kept.alias("a"), kept.alias("b")
    shared = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"),
                       F.col("a.n_fps").alias("n_a"),
                       F.col("b.n_fps").alias("n_b"))
              .agg(F.count(F.lit(1)).alias("shared_fps")))
    return (shared
            .withColumn("containment",
                        F.col("shared_fps")
                        / F.least(F.col("n_a"), F.col("n_b")))
            .filter(F.col("containment") >= _CONTAIN_THRESHOLD)
            .select("doc_a", "doc_b", "shared_fps",
                    F.round("containment", 4).alias("containment"))
            .orderBy("doc_a", "doc_b"))


ORACLE_WINNOW_CONTAINMENT = f"""
WITH toked AS (
    SELECT doc_id, list_filter(
        regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
        t -> t <> '') AS arr
    FROM documents
), eligible AS (
    SELECT doc_id, arr FROM toked WHERE len(arr) >= {_WINNOW_K}
), sh AS (
    SELECT doc_id, i - 1 AS pos,
           md5(array_to_string(arr[i:i+{_WINNOW_K - 1}], ' ')) AS h
    FROM eligible, unnest(range(1, len(arr) - {_WINNOW_K} + 2)) AS t(i)
), wm AS (
    SELECT doc_id, pos,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {_WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS fp
    FROM sh
), fps AS (
    SELECT DISTINCT doc_id, fp FROM wm WHERE pos >= {_WINNOW_W - 1}
), sizes AS (
    SELECT doc_id, COUNT(*) AS n_fps FROM fps GROUP BY doc_id
), kept AS (
    SELECT doc_id, fp FROM (
        SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS nd
        FROM fps
    ) WHERE nd BETWEEN 2 AND {_CONTAIN_MAX_FP_DOCS}
), shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
    FROM kept a JOIN kept b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared_fps,
       round(shared_fps / least(sa.n_fps, sb.n_fps), 4) AS containment
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared_fps / least(sa.n_fps, sb.n_fps) >= {_CONTAIN_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level source-overlap matrix: Jaccard similarity between each
    pair of SOURCES over their winnowing fingerprint sets — the "are these
    two feeds scraping each other" signal that doc-level dedup can't show
    (two sources can share 30% of their content while no single document
    pair crosses a dedup threshold). Standard corpus-audit step before
    mixing sources into a training run.

    Plan: the winnowing stream (one corpus exchange) → doc-level source
    join → DISTINCT (source, fp), eagerly localCheckpointed (three
    consumers — sizes and both self-join sides — would each re-run the
    corpus pipeline otherwise, the winnow_containment lesson); the
    checkpointed table holds at most |sources| rows per fingerprint, so
    the self-join on fp is bounded by the source count squared per
    fingerprint, never by document counts; per-pair intersection counts +
    broadcast per-source set sizes close it out. Output is
    |sources|-choose-2 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    fps = (winnowing_window_minima(docs, "text", "doc_id",
                                   k=_WINNOW_K, w=_WINNOW_W)
           .join(docs.select("doc_id", "source"), "doc_id")
           .select("source", "fp").distinct().localCheckpoint())
    return _source_overlap_pairs(fps)


def _source_overlap_pairs(fps: DataFrame) -> DataFrame:
    """The source-pair Jaccard stage over a distinct (source, fp) set —
    shared by the corpus-rebuilding query above and the read-from-index
    path (``source_overlap_from_index``)."""
    sizes = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n_fps"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                     & (F.col("a.source") < F.col("b.source")))
              .groupBy(F.col("a.source").alias("source_a"),
                       F.col("b.source").alias("source_b"))
              .agg(F.count(F.lit(1)).alias("shared_fps")))
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("n_fps").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("n_fps").alias("n_b"))
    return (shared.join(F.broadcast(sa), "source_a")
            .join(F.broadcast(sb), "source_b")
            .select("source_a", "source_b", "shared_fps",
                    F.round(F.col("shared_fps")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("shared_fps")), 6).alias("jaccard"))
            .orderBy("source_a", "source_b"))


ORACLE_SOURCE_OVERLAP = f"""
WITH toked AS (
    SELECT doc_id, source, list_filter(
        regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
        t -> t <> '') AS arr
    FROM documents
), eligible AS (
    SELECT doc_id, source, arr FROM toked WHERE len(arr) >= {_WINNOW_K}
), sh AS (
    SELECT doc_id, source, i - 1 AS pos,
           md5(array_to_string(arr[i:i+{_WINNOW_K - 1}], ' ')) AS h
    FROM eligible, unnest(range(1, len(arr) - {_WINNOW_K} + 2)) AS t(i)
), wm AS (
    SELECT doc_id, source, pos,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {_WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS fp
    FROM sh
), fps AS (
    SELECT DISTINCT source, fp FROM wm WHERE pos >= {_WINNOW_W - 1}
), sizes AS (
    SELECT source, COUNT(*) AS n_fps FROM fps GROUP BY source
), shared AS (
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
)
SELECT source_a, source_b, shared_fps,
       round(shared_fps / (sa.n_fps + sb.n_fps - shared_fps), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# Persisted winnowing index (r5 verdict #3)
# ---------------------------------------------------------------------------

_WINNOW_IDX_BUCKETS = 16


def index_winnowing(spark: SparkSession, sf_dir: str,
                    prefix: str = "winnow_idx",
                    num_buckets: int = _WINNOW_IDX_BUCKETS,
                    ) -> tuple[str, str]:
    """Maintenance op: build the winnowing fingerprint index ONCE and
    persist it as catalog tables, so the three consumers
    (``winnow_containment``, ``source_overlap``,
    ``winnowing_fingerprints``) read an artifact instead of each
    re-running the corpus shingle pipeline (localCheckpoint is
    session-local; this is the durable version a production pipeline
    schedules next to compaction).

    Artifacts:

    - ``{prefix}_fps``: DISTINCT (doc_id, fp, source), **bucketed AND
      sorted by fp** — the dedup index proper, at ~2/(w+1) of shingle
      volume. Bucketing by fp is the layout win: the containment
      self-join and the fp-frequency window both key on fp, so both
      sides of the join arrive pre-shuffled (zero fp exchanges — the
      measured 2.1x bucketed-join speedup from SCALE.md applies), and
      carrying ``source`` in the index makes the source-overlap audit
      index-only too.
    - ``{prefix}_doc_stats``: per-doc (doc_id, source, n_windows,
      n_fps) — doc-cardinality stats feeding the selection-density
      rollup (and any future size-normalized score) without touching
      the corpus.

    The stream is checkpointed once so the two writes don't re-shingle
    the corpus. Returns the two table names.
    """
    docs = load_table(spark, sf_dir, "documents")
    stream = (winnowing_window_minima(docs, "text", "doc_id",
                                      k=_WINNOW_K, w=_WINNOW_W)
              .localCheckpoint())
    src = docs.select("doc_id", "source")
    fps_table, stats_table = f"{prefix}_fps", f"{prefix}_doc_stats"
    from ..sources.layout import write_bucketed

    write_bucketed(
        stream.select("doc_id", "fp").distinct().join(src, "doc_id"),
        fps_table, "fp", num_buckets=num_buckets, sort_col="fp")
    (stream.groupBy("doc_id")
     .agg(F.count(F.lit(1)).alias("n_windows"),
          F.count_distinct("fp").alias("n_fps"))
     .join(src, "doc_id")
     .write.mode("overwrite").saveAsTable(stats_table))
    return fps_table, stats_table


def index_winnowing_append(spark: SparkSession, new_docs: DataFrame,
                           prefix: str = "winnow_idx",
                           num_buckets: int = _WINNOW_IDX_BUCKETS,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> tuple[str, str]:
    """Incremental maintenance of the persisted winnowing index: shingle
    and fingerprint ONLY the new documents, then APPEND their rows to the
    bucketed ``{prefix}_fps`` table (same bucket spec — appended files are
    physically bucketed identically, so index consumers keep their
    zero-fp-exchange plans) and to the per-doc stats table. Cost is
    O(new docs); the full rebuild (``index_winnowing``) stays the
    from-scratch/backfill path.

    Caller contract: ``new_docs`` carries ids not already in the index —
    the same append-only ingest contract the corpus itself has (a re-fed
    doc would double its rows in BOTH artifacts; dedup upstream, e.g. via
    the keyed idempotent sink). Append == rebuild parity is pinned by
    ``tests/test_layout.py``. Returns the two table names.
    """
    stream = (winnowing_window_minima(new_docs, text_col, id_col,
                                      k=_WINNOW_K, w=_WINNOW_W)
              .localCheckpoint())
    src = new_docs.select(id_col, "source")
    fps_table, stats_table = f"{prefix}_fps", f"{prefix}_doc_stats"
    (stream.select(id_col, "fp").distinct().join(src, id_col)
     .write.mode("append").bucketBy(num_buckets, "fp").sortBy("fp")
     .saveAsTable(fps_table))
    (stream.groupBy(id_col)
     .agg(F.count(F.lit(1)).alias("n_windows"),
          F.count_distinct("fp").alias("n_fps"))
     .join(src, id_col)
     .write.mode("append").saveAsTable(stats_table))
    return fps_table, stats_table


def winnow_containment_from_index(spark: SparkSession,
                                  fps_table: str = "winnow_idx_fps",
                                  stats_table: str = "winnow_idx_doc_stats",
                                  ) -> DataFrame:
    """``q_winnow_containment`` reading the persisted index: identical
    semantics, but every corpus-derived input is an artifact scan. The
    fp-frequency window and the fp self-join run DIRECTLY over the
    bucketed-by-fp layout (zero fp exchanges — asserted in
    tests/test_layout.py), and the per-doc set sizes come from the
    persisted ``doc_stats`` table via an UNHINTED join (doc-keyed, on
    the candidate pairs — AQE broadcasts the small side at runtime;
    forcing it is the lint-forbidden bug class). This ordering differs
    from the rebuild path deliberately: there the sizes ride a window on
    the fingerprint stream's existing doc partitioning; here a doc_id
    window FIRST would make the planner disable the bucketed scan
    (`DisableUnnecessaryBucketedScan`), throwing away the index's whole
    point."""
    fps = spark.table(fps_table).select("doc_id", "fp")
    w_fp = Window.partitionBy("fp")
    kept = (fps.withColumn("__docs", F.count(F.lit(1)).over(w_fp))
            .filter((F.col("__docs") >= 2)
                    & (F.col("__docs") <= _CONTAIN_MAX_FP_DOCS))
            .drop("__docs"))
    a, b = kept.alias("a"), kept.alias("b")
    shared = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("shared_fps")))
    sizes = spark.table(stats_table).select("doc_id", "n_fps")
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_fps").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_fps").alias("n_b"))
    return (shared.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("containment",
                        F.col("shared_fps")
                        / F.least(F.col("n_a"), F.col("n_b")))
            .filter(F.col("containment") >= _CONTAIN_THRESHOLD)
            .select("doc_a", "doc_b", "shared_fps",
                    F.round("containment", 4).alias("containment"))
            .orderBy("doc_a", "doc_b"))


def source_overlap_from_index(spark: SparkSession,
                              fps_table: str = "winnow_idx_fps",
                              ) -> DataFrame:
    """``q_source_overlap`` reading the persisted index (source rides in
    the index, so this is index-only — no corpus join)."""
    return _source_overlap_pairs(spark.table(fps_table)
                                 .select("source", "fp").distinct())


def winnowing_fingerprints_from_index(spark: SparkSession,
                                      stats_table: str =
                                      "winnow_idx_doc_stats",
                                      ) -> DataFrame:
    """``q_winnowing_fingerprints`` reading the persisted per-doc stats —
    a doc-cardinality rollup; the corpus is never touched."""
    return _fingerprint_source_rollup(spark.table(stats_table))
