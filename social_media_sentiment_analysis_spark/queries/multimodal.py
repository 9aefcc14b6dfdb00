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
    aggregated per modality. Rows-only for the driver; byte-exact parity vs a
    pure-pandas reference is asserted in tests."""
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


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample every video payload (every 4th fake frame) and roll up
    per media: sampled-frame count, span, bytes kept — the video→frames→
    stats pipeline with the row-expanding mapInPandas stage in the middle
    (rows-only; per-frame slicing parity is asserted in
    tests/test_multimodal.py)."""
    from ..operators.multimodal import sample_frames

    frames = sample_frames(_media(spark, sf_dir), every_n=4)
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


def q_media_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every audio payload into overlapping 1 s windows (500 ms
    hop) and roll up per media: segment count, covered span, bytes — the
    audio→segments→stats pipeline (rows-only; hop/overlap arithmetic
    parity is asserted in tests/test_multimodal.py)."""
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
    cosine against a shifted MISMATCHED baseline. A healthy pairing shows
    a positive alignment gap; pairs scoring below the matched distribution
    are the drop candidates.

    Rows-only (the encoder crossing has no SQL twin); the matched >
    mismatched invariant is pinned in tests/test_multimodal.py. In this
    stand-in data the payload derives from the caption, so matched pairs
    score exactly 1.0 and the informative readout is the mismatched
    distribution below it — real encoders change the numbers, not the
    query. Both vectors are unit-normalized so cosine = one
    zip_with/aggregate fold; the only join key is doc_id — at 100 TB this
    is one equi-join of two map-side-derived tables, shuffled on the id."""
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
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("cos_matched"), 4).alias("mean_matched"))
    mm = mismatched.groupBy("modality").agg(
        F.round(F.avg("cos_mismatched"), 4).alias("mean_mismatched"))
    return (
        m.join(mm, "modality")
        .withColumn("alignment_gap",
                    F.round(F.col("mean_matched")
                            - F.col("mean_mismatched"), 4))
        .orderBy("modality")
    )


def q_media_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level video near-duplicate audit: pair count and mean matched-
    frame fraction from ``operators/multimodal.py::video_near_duplicates``
    (per-frame dHash, banded candidate join, frame-majority verify).
    Rows-only (the frame decode→hash crossing has no SQL twin); exact /
    perturbed / distinct recall is pinned in
    tests/test_multimodal.py::TestVideoNearDup."""
    from ..operators.multimodal import video_near_duplicates

    pairs = video_near_duplicates(_media(spark, sf_dir))
    return pairs.agg(
        F.count(F.lit(1)).alias("dup_pairs"),
        F.round(F.avg("match_frac"), 4).alias("avg_match_frac"),
        F.round(F.avg("n_matched"), 4).alias("avg_matched_frames"),
    )


def q_media_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level audio near-duplicate audit: pair count and mean
    matched-segment fraction from
    ``operators/multimodal.py::audio_near_duplicates`` (per-window dHash,
    positional banded join, segment-majority verify — the Chromaprint-
    shaped pipeline). Rows-only (decode crossing); recall behavior is
    pinned in tests/test_multimodal.py::TestAudioNearDup."""
    from ..operators.multimodal import audio_near_duplicates

    pairs = audio_near_duplicates(_media(spark, sf_dir))
    return pairs.agg(
        F.count(F.lit(1)).alias("dup_pairs"),
        F.round(F.avg("match_frac"), 4).alias("avg_match_frac"),
        F.round(F.avg("n_matched"), 4).alias("avg_matched_segments"),
    )
