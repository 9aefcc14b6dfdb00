"""Multimodal registry queries: opaque-binary media columns derived from the
``documents`` table (TESTDATA has no media table), metadata analytics as pure
Column plans (oracle-checked), and Arrow-batched fake-decode feature
extraction (rows-only — mapInPandas has no SQL twin; parity vs a pure-pandas
reference lives in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_media, extract_media_features
from ..sources.batch import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_media(load_table(spark, sf_dir, "documents"))


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality metadata rollup over the opaque-payload media table.
    Payload bytes never cross to Python — metadata analytics stay columnar
    (the point of the binary+metadata design)."""
    return (
        _media(spark, sf_dir)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("media_count"),
            F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("duration_ms"), 4).alias("avg_duration_ms"),
        )
        .orderBy("modality")
    )


ORACLE_MEDIA_METADATA = """
WITH media AS (
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           doc_id
    FROM documents
), typed AS (
    SELECT modality, n_bytes,
           CASE WHEN modality = 'image' THEN (n_bytes % 64) + 16 END AS width,
           CASE WHEN modality <> 'image' THEN n_bytes * 10 END AS duration_ms
    FROM media
)
SELECT modality,
       COUNT(*) AS media_count,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       round(AVG(n_bytes), 4) AS avg_bytes,
       round(AVG(width), 4) AS avg_width,
       round(AVG(duration_ms), 4) AS avg_duration_ms
FROM typed
GROUP BY modality
ORDER BY modality
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas (deterministic fake decoder),
    aggregated per modality — FULLY oracle-gated (upgraded from rows-only,
    r7): the fake decoder is pure byte arithmetic over the payload (the
    UTF-8 text bytes, ASCII in this corpus), so the DuckDB twin recomputes
    every value independently — per-doc byte mean as a code-point average,
    frame counts as the fixed-256-byte ceil. A real codec swaps in behind
    the same mapInPandas contract; the gate then pins the plumbing via the
    metadata columns instead (tests keep the pandas-reference parity)."""
    feats = extract_media_features(_media(spark, sf_dir))
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("media_count"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("modality")
    )


# The fake decoder reads max(1, n) bytes (empty payload decodes as one zero
# byte), mean = code-point sum / n (ASCII corpus: code point == byte), video
# frame count = ceil(n/256). All recomputable from octet_length + per-char
# ord — the decode crossing's arithmetic, not its plumbing, is the contract.
ORACLE_MEDIA_FEATURES = """
WITH media AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         text,
         octet_length(encode(text)) AS n
  FROM documents
), means AS (
  SELECT m.doc_id, m.modality,
         CASE WHEN m.n = 0 THEN 1 ELSE m.n END AS n_bytes,
         CASE WHEN m.n = 0 THEN 0.0
              ELSE (SELECT SUM(ord(substring(m.text, t.i, 1)))
                    FROM UNNEST(generate_series(1, m.n)) AS t(i))
                   / CAST(m.n AS DOUBLE) END AS byte_mean,
         CASE WHEN m.modality = 'video'
              THEN GREATEST(1, CAST(CEIL(m.n / 256.0) AS BIGINT))
              ELSE 1 END AS n_frames
  FROM media m
)
SELECT modality,
       COUNT(*) AS media_count,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       round(AVG(byte_mean), 4) AS avg_byte_mean,
       CAST(SUM(n_frames) AS BIGINT) AS total_frames
FROM means
GROUP BY modality
ORDER BY modality
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample every video payload (every 2nd fake frame) and roll up
    per media: sampled-frame count, span, bytes kept — the video→frames→
    stats pipeline with the row-expanding mapInPandas stage in the middle.
    FULLY oracle-gated (upgraded from rows-only, r7): the fake frame
    sampler is deterministic arithmetic — ceil(n/256) fixed-byte frames,
    stride-2 sampling, timestamps floor(i·dur/n_frames) — so the DuckDB
    twin replays the expansion with generate_series and compares every
    per-media rollup value. every_n=2 (not the operator default 4) so the
    ≤3-frame corpus payloads actually exercise the stride."""
    from ..operators.multimodal import sample_frames

    frames = sample_frames(_media(spark, sf_dir), every_n=2)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_ts_ms").alias("last_ts_ms"),
            F.sum(F.octet_length("frame_bytes")).cast("bigint")
             .alias("bytes_kept"),
        )
        .orderBy("media_id")
    )


# Mirrors sample_frames' Python exactly: n_frames = max(1, ceil(n/256)),
# step_ms = dur/n_frames (one IEEE double division, then per-frame multiply
# — same ops in the same order, so floor() matches Python's int() bit for
# bit), frame i bytes = min(256, n - 256·i).
ORACLE_MEDIA_FRAMES = """
WITH vids AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 2
), meta AS (
  SELECT media_id, n,
         GREATEST(1, CAST(CEIL(n / 256.0) AS BIGINT)) AS n_frames,
         n * 10 AS dur
  FROM vids
), sampled AS (
  SELECT media_id, n, n_frames, dur, i
  FROM meta, UNNEST(generate_series(0, n_frames - 1, 2)) AS t(i)
)
SELECT media_id,
       COUNT(*) AS n_sampled,
       MAX(CAST(FLOOR(i * (dur / CAST(n_frames AS DOUBLE))) AS BIGINT))
           AS last_ts_ms,
       CAST(SUM(GREATEST(0, LEAST(256, n - i * 256))) AS BIGINT)
           AS bytes_kept
FROM sampled
GROUP BY media_id
ORDER BY media_id
"""


def q_media_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every audio payload into overlapping 1 s windows (500 ms
    hop) and roll up per media: segment count, covered span, bytes — the
    audio→segments→stats pipeline. FULLY oracle-gated (upgraded from
    rows-only, r7): the fake segmenter maps time to bytes linearly
    (constant-bitrate semantics), so the DuckDB twin replays the hop loop
    — including the early-exit at end ≥ dur and the ≥1-byte slice floor —
    with generate_series and compares every per-media value."""
    from ..operators.multimodal import segment_audio

    segs = segment_audio(_media(spark, sf_dir), segment_ms=1000, hop_ms=500)
    return (
        segs.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.max("end_ms").alias("covered_ms"),
            F.sum(F.octet_length("segment_bytes")).cast("bigint")
             .alias("bytes_total"),
        )
        .orderBy("media_id")
    )


# Mirrors segment_audio's Python exactly: starts at 0,500,…; a start is
# emitted iff no earlier start's segment already reached dur (start = 0 OR
# start + 500 < dur — the loop's break-after-emit); byte offsets are
# floor(ms · n/dur) with the b1 ≥ b0+1 floor, n/dur computed once as one
# IEEE double division exactly like the Python.
ORACLE_MEDIA_SEGMENTS = """
WITH auds AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 1
), meta AS (
  SELECT media_id, n, n * 10 AS dur, n / CAST(n * 10 AS DOUBLE) AS bpm
  FROM auds WHERE n > 0
), segs AS (
  SELECT media_id, n, dur, s,
         LEAST(s + 1000, dur) AS e,
         CAST(FLOOR(s * bpm) AS BIGINT) AS b0,
         GREATEST(CAST(FLOOR(s * bpm) AS BIGINT) + 1,
                  CAST(FLOOR(LEAST(s + 1000, dur) * bpm) AS BIGINT)) AS b1
  FROM meta, UNNEST(generate_series(0, dur - 1, 500)) AS t(s)
  WHERE s = 0 OR s + 500 < dur
)
SELECT media_id,
       COUNT(*) AS n_segments,
       MAX(e) AS covered_ms,
       CAST(SUM(b1 - b0) AS BIGINT) AS bytes_total
FROM segs
GROUP BY media_id
ORDER BY media_id
"""


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by payload content hash — the first pass of any
    multimodal curation run (byte-identical re-uploads dominate media
    duplicate mass; perceptual hashing only matters after this).

    The md5 runs over the BINARY payload column JVM-side (bytes never
    cross to Python), then two aggregates: per-(modality, fingerprint)
    counts, then the per-modality dedup report. Oracle-checkable because
    the testdata payload is the UTF-8 encoding of the text column, so
    DuckDB's md5(text) hashes identical bytes.
    """
    per_fp = (
        _media(spark, sf_dir)
        .groupBy("modality", F.md5("payload").alias("fp"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_fp.groupBy("modality")
        .agg(
            F.sum("cnt").cast("bigint").alias("media_count"),
            F.count(F.lit(1)).alias("distinct_payloads"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0))
            .cast("bigint").alias("redundant_copies"),
        )
        .orderBy("modality")
    )


ORACLE_MEDIA_DEDUP = """
WITH per_fp AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         md5(text) AS fp, COUNT(*) AS cnt
  FROM documents
  GROUP BY 1, 2
)
SELECT modality,
       CAST(SUM(cnt) AS BIGINT) AS media_count,
       COUNT(*) AS distinct_payloads,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT)
           AS redundant_copies
FROM per_fp
GROUP BY modality
ORDER BY modality
"""


_PHASH_MAX_HAMMING = 6


def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) near-dup with its theorems carried into
    the oracle gate (upgraded from rows-only — the dedup_simhash recipe,
    r6 verdict #4, applied to the media modality). The decode→hash
    crossing has no SQL twin, so the gate pins what IS provable, per
    modality: (1) byte-identical payloads imply identical dHash imply
    hamming 0 imply the pair MUST be emitted —
    ``all_identical_pairs_emitted``, anchored on the SQL-exact
    identical-payload pair count the DuckDB twin recomputes
    independently (payload = UTF-8 text bytes, so md5(text) groups
    within modality ARE the identical payloads); (2) the verify bound —
    no emitted pair above max_hamming; (3) canonical output (a < b, no
    duplicate pairs). Pair-level recall against one-byte-perturbed
    payloads stays pinned in tests/test_multimodal.py::TestPhash."""
    from ..operators.multimodal import phash_near_duplicates

    media = _media(spark, sf_dir)
    emitted = phash_near_duplicates(
        media, max_hamming=_PHASH_MAX_HAMMING).localCheckpoint()
    keyed = media.select("modality", "media_id",
                         F.md5(F.col("payload")).alias("__h"))
    same = (keyed.toDF("modality", "a_id", "__h")
            .join(keyed.toDF("__m2", "b_id", "__h"),
                  ["__h"])
            .filter((F.col("modality") == F.col("__m2"))
                    & (F.col("a_id") < F.col("b_id")))
            .select("modality", "a_id", "b_id"))
    modalities = media.select("modality").distinct()
    n_dup = (same.groupBy("modality")
             .agg(F.count(F.lit(1)).alias("n_identical_payload_pairs")))
    missing = (same.join(emitted.select("a_id", "b_id"),
                         ["a_id", "b_id"], "left_anti")
               .groupBy("modality")
               .agg(F.count(F.lit(1)).alias("__missing")))
    stats = (emitted.groupBy("modality")
             .agg(F.every(F.col("hamming") <= _PHASH_MAX_HAMMING)
                  .alias("__h_ok"),
                  (F.every(F.col("a_id") < F.col("b_id"))
                   & (F.count(F.lit(1))
                      == F.count_distinct(F.col("a_id"), F.col("b_id"))))
                  .alias("__canon")))
    return (modalities
            .join(n_dup, "modality", "left")
            .join(missing, "modality", "left")
            .join(stats, "modality", "left")
            .select(
                "modality",
                F.coalesce("n_identical_payload_pairs", F.lit(0))
                .alias("n_identical_payload_pairs"),
                (F.coalesce("__missing", F.lit(0)) == 0)
                .alias("all_identical_pairs_emitted"),
                F.coalesce("__h_ok", F.lit(True))
                .alias("max_hamming_within_bound"),
                F.coalesce("__canon", F.lit(True)).alias("pairs_canonical"))
            .orderBy("modality"))


ORACLE_MEDIA_PHASH = """
WITH media AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         md5(text) AS fp
  FROM documents
), grp AS (
  SELECT modality, fp, COUNT(*) AS c FROM media GROUP BY 1, 2
)
SELECT modality,
       CAST(COALESCE(SUM(c * (c - 1) / 2), 0) AS BIGINT)
           AS n_identical_payload_pairs,
       TRUE AS all_identical_pairs_emitted,
       TRUE AS max_hamming_within_bound,
       TRUE AS pairs_canonical
FROM grp
GROUP BY modality
ORDER BY modality
"""


def q_media_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-style caption↔media pair-alignment audit — the pair
    filter an image-text training set is curated with (LAION's CLIP-score
    threshold): run BOTH towers (media bytes, caption bytes) through the
    shared-space encoder (stub towers, real Arrow plumbing —
    ``operators/multimodal.py::encode_media``) and compare matched-pair
    cosine against a shifted MISMATCHED baseline.

    Oracle-gated via the theorem recipe (upgraded from rows-only, r7):
    the encoder crossing has no SQL twin, but in this stand-in data the
    payload IS the caption's bytes, so two theorems hold — every matched
    pair must score cosine 1 (same bytes → same unit vector), and the
    matched mean must strictly exceed the mismatched mean (the gap that
    makes the filter useful). The DuckDB twin recomputes both pair
    COUNTS exactly (matched = every doc; mismatched = docs whose id+3
    exists) and pins the two booleans TRUE. Real encoders drop the
    cosine-1 theorem, not the plumbing; the full score distributions are
    pinned in tests/test_multimodal.py. Both vectors are unit-normalized
    so cosine = one zip_with/aggregate fold; the only join key is doc_id
    — at 100 TB this is one equi-join of two map-side-derived tables,
    shuffled on the id."""
    from ..operators.multimodal import encode_media

    docs = load_table(spark, sf_dir, "documents")
    media_vecs = (
        encode_media(_media(spark, sf_dir))
        .withColumn("doc_id", F.substring("media_id", 2, 18).cast("long"))
    )
    captions = (
        encode_media(docs.select(
            F.concat(F.lit("c"), F.col("doc_id").cast("string"))
            .alias("media_id"),
            F.lit("text").alias("modality"),
            F.encode("text", "UTF-8").alias("payload")))
        .select(
            F.substring("media_id", 2, 18).cast("long").alias("cap_doc_id"),
            F.col("media_vec").alias("cap_vec"))
    )
    dot = F.aggregate(
        F.zip_with("media_vec", "cap_vec", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    matched = (
        media_vecs.join(captions,
                        media_vecs.doc_id == captions.cap_doc_id)
        .select("modality", dot.alias("cos_matched")))
    mismatched = (
        media_vecs.join(captions,
                        media_vecs.doc_id + 3 == captions.cap_doc_id)
        .select("modality", dot.alias("cos_mismatched")))
    m = matched.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_matched_pairs"),
        F.every(F.col("cos_matched") > 0.999999)
        .alias("matched_all_perfect"),
        F.avg("cos_matched").alias("__mm"))
    mm = mismatched.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_mismatched_pairs"),
        F.avg("cos_mismatched").alias("__mmm"))
    return (
        m.join(mm, "modality")
        .select(
            "modality", "n_matched_pairs", "n_mismatched_pairs",
            "matched_all_perfect",
            (F.col("__mm") > F.col("__mmm")).alias("alignment_gap_positive"))
        .orderBy("modality")
    )


ORACLE_MEDIA_ALIGNMENT = """
WITH media AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality
  FROM documents
)
SELECT m.modality,
       COUNT(*) AS n_matched_pairs,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM documents d
                                  WHERE d.doc_id = m.doc_id + 3)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched_pairs,
       TRUE AS matched_all_perfect,
       TRUE AS alignment_gap_positive
FROM media m
GROUP BY m.modality
ORDER BY m.modality
"""


_NEARDUP_MIN_MATCH = 0.6   # the operators' min_frame/segment_match default


def _positional_neardup_contract(media: DataFrame, pairs: DataFrame,
                                 modality: str) -> DataFrame:
    """Shared theorem contract for the positional (frame/segment) near-dup
    queries — the media_phash recipe (r6 verdict #4) lifted to positional
    matching: (1) byte-identical payloads of ``modality`` have identical
    per-position hashes, so every such pair MUST be emitted with
    match_frac 1.0 — anchored on the SQL-exact identical-payload pair
    count the twin recomputes from md5(text) groups; (2) the majority
    bound — every emitted match_frac within [min_match, 1]; (3) canonical
    output (a < b, no duplicate pairs). Perturbed-copy recall stays
    pinned in tests/test_multimodal.py."""
    pairs = pairs.localCheckpoint()
    keyed = (media.filter(F.col("modality") == modality)
             .select(F.col("media_id").alias("a_id"),
                     F.md5(F.col("payload")).alias("__h")))
    same = (keyed.join(keyed.toDF("b_id", "__h"), "__h")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id"))
    n_dup = same.agg(F.count(F.lit(1)).alias("n_identical_payload_pairs"))
    full_match = pairs.filter(F.col("match_frac") >= 0.9999) \
        .select("a_id", "b_id")
    all_emitted = (same.join(full_match, ["a_id", "b_id"], "left_anti")
                   .agg((F.count(F.lit(1)) == 0)
                        .alias("all_identical_pairs_emitted")))
    frac_ok = pairs.agg(
        F.coalesce(F.every((F.col("match_frac") >= _NEARDUP_MIN_MATCH)
                           & (F.col("match_frac") <= 1.0)), F.lit(True))
        .alias("match_frac_within_bounds"))
    canonical = pairs.agg(
        (F.coalesce(F.every(F.col("a_id") < F.col("b_id")), F.lit(True))
         & (F.count(F.lit(1))
            == F.count_distinct(F.col("a_id"), F.col("b_id"))))
        .alias("pairs_canonical"))
    # 1-row theorem scalars: broadcast anchors (the dedup_simhash pattern)
    return (n_dup.crossJoin(F.broadcast(all_emitted))
            .crossJoin(F.broadcast(frac_ok))
            .crossJoin(F.broadcast(canonical)))


def _oracle_identical_pairs(mod_selector: str) -> str:
    return f"""
WITH media AS (
  SELECT md5(text) AS fp
  FROM documents WHERE doc_id % 3 = {mod_selector}
), grp AS (
  SELECT fp, COUNT(*) AS c FROM media GROUP BY fp
)
SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT)
           AS n_identical_payload_pairs,
       TRUE AS all_identical_pairs_emitted,
       TRUE AS match_frac_within_bounds,
       TRUE AS pairs_canonical
FROM grp
"""


def q_media_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level video near-duplicate audit with its theorems carried
    into the oracle gate (upgraded from rows-only, r7):
    ``operators/multimodal.py::video_near_duplicates`` (per-frame dHash,
    banded candidate join, frame-majority verify) checked against the
    SQL-exact identical-payload pair count plus the emitted/bounds/
    canonical theorems — see ``_positional_neardup_contract``."""
    from ..operators.multimodal import video_near_duplicates

    media = _media(spark, sf_dir)
    pairs = video_near_duplicates(media)
    return _positional_neardup_contract(media, pairs, "video")


ORACLE_MEDIA_VIDEO_NEARDUP = _oracle_identical_pairs("2")


def q_media_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level audio near-duplicate audit with its theorems carried
    into the oracle gate (upgraded from rows-only, r7):
    ``operators/multimodal.py::audio_near_duplicates`` (per-window dHash,
    positional banded join, segment-majority verify — the Chromaprint-
    shaped pipeline) checked against the SQL-exact identical-payload pair
    count plus the emitted/bounds/canonical theorems."""
    from ..operators.multimodal import audio_near_duplicates

    media = _media(spark, sf_dir)
    pairs = audio_near_duplicates(media)
    return _positional_neardup_contract(media, pairs, "audio")


ORACLE_MEDIA_AUDIO_NEARDUP = _oracle_identical_pairs("1")
