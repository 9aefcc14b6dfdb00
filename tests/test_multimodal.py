"""Multimodal plumbing tests: MEDIA_SCHEMA shape, Arrow-batch feature
extraction parity vs a pure-pandas reference, decode stub contract, and the
oracle twin for the metadata rollup.
"""

from __future__ import annotations

import numpy as np
import pytest

from social_media_sentiment_analysis_spark.operators.multimodal import (
    _fake_decode_stats,
    attach_media,
    decode_payload,
    extract_media_features,
)
from social_media_sentiment_analysis_spark.queries.multimodal import (
    ORACLE_MEDIA_METADATA,
    q_media_features,
    q_media_metadata,
)
from social_media_sentiment_analysis_spark.sources.batch import load_table


def test_attach_media_schema_and_modality(spark, sf_dir):
    media = attach_media(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == [
        "media_id", "modality", "payload", "mime_type",
        "width", "height", "duration_ms", "sample_rate",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    rows = media.limit(50).collect()
    for r in rows:
        assert r.modality in ("image", "audio", "video")
        if r.modality == "image":
            assert r.width is not None and r.duration_ms is None
        else:
            assert r.width is None and r.duration_ms is not None
        assert isinstance(r.payload, (bytes, bytearray))


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x01", "image/png")


def test_feature_extraction_matches_pandas_reference(spark, sf_dir):
    media = attach_media(load_table(spark, sf_dir, "documents"))
    got = {r.media_id: r for r in extract_media_features(media).collect()}
    for r in media.collect():
        exp = _fake_decode_stats(bytes(r.payload), r.modality)
        g = got[r.media_id]
        assert (g.n_bytes, g.byte_min, g.byte_max, g.n_frames) == (
            exp[0], exp[3], exp[4], exp[5])
        assert g.byte_mean == pytest.approx(exp[1])
        assert g.byte_std == pytest.approx(exp[2])
    # byte-level sanity on one known payload
    assert _fake_decode_stats(b"abc", "video") == (
        3, np.mean([97, 98, 99]), np.std([97, 98, 99]), 97, 99, 1)


def test_video_frame_sampling_cardinality():
    assert _fake_decode_stats(b"\x01" * 700, "video")[5] == 3   # ceil(700/256)
    assert _fake_decode_stats(b"\x01" * 700, "image")[5] == 1


def test_media_metadata_oracle_parity(spark, sf_dir, duck):
    spark_rows = {r.modality: r for r in q_media_metadata(spark, sf_dir).collect()}
    duck_rows = duck.execute(ORACLE_MEDIA_METADATA).df().to_dict("records")
    assert len(spark_rows) == len(duck_rows) == 3
    for d in duck_rows:
        s = spark_rows[d["modality"]]
        assert s.media_count == d["media_count"]
        assert s.total_bytes == d["total_bytes"]
        assert s.avg_bytes == pytest.approx(d["avg_bytes"])
        assert (s.avg_width is None) == (d["avg_width"] is None or
                                         np.isnan(d["avg_width"]))


def test_media_features_rollup(spark, sf_dir):
    rows = {r.modality: r for r in q_media_features(spark, sf_dir).collect()}
    assert set(rows) == {"image", "audio", "video"}
    # frame sampling only multiplies frames for video
    assert rows["image"].total_frames == rows["image"].media_count
    assert rows["audio"].total_frames == rows["audio"].media_count
    assert rows["video"].total_frames >= rows["video"].media_count


class TestFrameSampleResize:
    def test_frame_sampling_matches_manual_slicing(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            _FRAME_BYTES,
            attach_media,
            sample_frames,
        )
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )
        media = attach_media(load_table(spark, sf_dir, "documents"))
        vids = {r.media_id: (bytes(r.payload), r.duration_ms)
                for r in media.filter("modality = 'video'").collect()}
        got = sample_frames(media, every_n=4).collect()
        assert {r.media_id for r in got} == set(vids)
        for r in got:
            raw, dur = vids[r.media_id]
            n_frames = max(1, -(-len(raw) // _FRAME_BYTES))
            assert r.frame_idx % 4 == 0 and r.frame_idx < n_frames
            start = r.frame_idx * _FRAME_BYTES
            assert bytes(r.frame_bytes) == raw[start:start + _FRAME_BYTES]
            assert r.frame_ts_ms == int(r.frame_idx * (dur / n_frames))

    def test_resize_fixed_output_size(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            attach_media,
            resize_images,
        )
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )
        media = attach_media(load_table(spark, sf_dir, "documents"))
        out = resize_images(media, width=8, height=8).collect()
        n_images = media.filter("modality = 'image'").count()
        assert len(out) == n_images > 0
        assert all(len(bytes(r.payload)) == 64 for r in out)
        assert all(r.width == 8 and r.height == 8 for r in out)
        # deterministic: strided downsample preserves first byte
        src = {r.media_id: bytes(r.payload)
               for r in media.filter("modality = 'image'").collect()}
        for r in out:
            assert bytes(r.payload)[0] == src[r.media_id][0]


class TestAudioSegmentation:
    def test_segments_cover_duration_with_hop_overlap(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            attach_media, segment_audio,
        )
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )

        media = attach_media(load_table(spark, sf_dir, "documents"))
        segs = segment_audio(media, segment_ms=1000, hop_ms=500).toPandas()
        assert len(segs) > 0
        audio = media.filter("modality = 'audio'") \
            .select("media_id", "duration_ms").toPandas() \
            .set_index("media_id")["duration_ms"].to_dict()
        for mid, grp in segs.groupby("media_id"):
            grp = grp.sort_values("segment_idx")
            dur = audio[mid]
            # windows advance by the hop, end clamped to the duration
            assert (grp["start_ms"].diff().dropna() == 500).all()
            assert grp["end_ms"].iloc[-1] == dur
            assert (grp["end_ms"] - grp["start_ms"] <= 1000).all()
            # every segment carries a non-empty payload slice
            assert (grp["segment_bytes"].map(len) > 0).all()

    def test_python_reference_slicing_parity(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            attach_media, segment_audio,
        )
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )

        media = attach_media(load_table(spark, sf_dir, "documents"))
        from pyspark.sql import functions as F

        one = media.filter("modality = 'audio'").limit(1).collect()[0]
        segs = (segment_audio(
            media.filter(F.col("media_id") == one["media_id"]),
            segment_ms=1000, hop_ms=500)
            .orderBy("segment_idx").collect())
        raw, dur = bytes(one["payload"]), one["duration_ms"]
        bpms = len(raw) / dur
        for s in segs:
            b0 = int(s["start_ms"] * bpms)
            b1 = max(b0 + 1, int(s["end_ms"] * bpms))
            assert bytes(s["segment_bytes"]) == raw[b0:b1]


class TestPhash:
    """Perceptual-hash near-dup: gradient-hash stability for perturbed
    payloads, modality blocking, and pair ordering."""

    def test_batched_phash_bit_identical_to_scalar(self):
        """The whole-batch reduceat path must be bit-identical to the
        per-row reference for every size class, including the empty/tiny
        payloads that fall back to the scalar path."""
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            _fake_decode_phash,
            _phash_batch,
        )

        rng = np.random.default_rng(11)
        payloads = [None, b"", b"\x01", bytes(range(10)), bytes(64),
                    bytes(65), bytes(66)]
        payloads += [rng.integers(0, 256, size=int(n), dtype=np.uint8)
                     .tobytes()
                     for n in rng.integers(1, 5000, size=200)]
        got = _phash_batch(payloads)
        for i, p in enumerate(payloads):
            assert got[i] == _fake_decode_phash(p if p else b"\x00")

    def _media_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "media_id string, modality string, payload binary")

    def test_perturbed_payload_pairs_distinct_does_not(self, spark):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            phash_near_duplicates,
        )

        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, size=2048, dtype=np.uint8).tobytes()
        # flip one byte mid-stream: a re-encode-sized perturbation
        near = bytearray(base)
        near[1000] = (near[1000] + 3) % 256
        other = rng.integers(0, 256, size=2048, dtype=np.uint8).tobytes()
        media = self._media_df(spark, [
            ("m1", "image", base),
            ("m2", "image", bytes(near)),
            ("m3", "image", other),
            ("m4", "audio", base),   # same bytes, different modality
        ])
        pairs = {(r.a_id, r.b_id)
                 for r in phash_near_duplicates(media).collect()}
        assert ("m1", "m2") in pairs            # near-identical pairs
        assert ("m1", "m4") not in pairs        # modality-blocked
        assert all(a < b for a, b in pairs)     # canonical ordering
        assert ("m1", "m3") not in pairs and ("m2", "m3") not in pairs

    def test_phash_deterministic_and_long_typed(self, spark):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            _fake_decode_phash, phash_media,
        )

        payload = bytes(range(256)) * 4
        media = self._media_df(spark, [("m1", "image", payload)])
        row = phash_media(media).collect()[0]
        assert row.phash == _fake_decode_phash(payload)
        assert phash_media(media).schema["phash"].dataType.simpleString() == "bigint"

    def test_registry_rollup_shape(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )

        df = QUERIES["media_phash"].builder(spark, sf_dir)
        assert [f.name for f in df.schema.fields] == [
            "modality", "n_identical_payload_pairs",
            "all_identical_pairs_emitted", "max_hamming_within_bound",
            "pairs_canonical"]
        for r in df.collect():
            assert r.modality in ("image", "audio", "video")
            assert r.n_identical_payload_pairs >= 0
            assert r.all_identical_pairs_emitted is True
            assert r.max_hamming_within_bound is True
            assert r.pairs_canonical is True


class TestMediaAlignment:
    """Caption↔media alignment audit: encoder contract + the matched >
    mismatched invariant (payload bytes derive from the caption text, so a
    correct pipeline must separate the two distributions)."""

    def test_encoder_unit_norm_and_deterministic(self, spark):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            _fake_media_encoder, encode_media,
        )

        payload = b"some media payload bytes for the encoder"
        media = spark.createDataFrame(
            [("m1", "image", payload)],
            "media_id string, modality string, payload binary")
        row = encode_media(media).collect()[0]
        assert row.media_vec == _fake_media_encoder(payload)
        assert abs(sum(v * v for v in row.media_vec) - 1.0) < 1e-9

    def test_matched_pairs_align_better_than_shifted(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )

        rows = QUERIES["media_alignment"].builder(spark, sf_dir).collect()
        assert {r.modality for r in rows} == {"image", "audio", "video"}
        for r in rows:
            assert r.n_matched_pairs > 0
            assert r.matched_all_perfect, r
            assert r.alignment_gap_positive, r


class TestVideoNearDup:
    """Frame-level video near-dup: exact copies pair at match_frac 1.0,
    re-encode-sized perturbations still pair, distinct content does not."""

    def _video_df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "media_id string, modality string, payload binary, "
            "duration_ms long")

    def test_copy_perturbed_and_distinct(self, spark):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            video_near_duplicates,
        )

        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
        near = bytearray(base)
        near[100] = (near[100] + 3) % 256    # frame 0 perturbed
        near[3000] = (near[3000] + 5) % 256  # frame 11 perturbed
        other = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
        media = self._video_df(spark, [
            ("v1", "video", base, 4000),
            ("v2", "video", bytes(near), 4000),
            ("v3", "video", other, 4000),
            ("v4", "video", base, 4000),
        ])
        rows = {(r.a_id, r.b_id): r for r in
                video_near_duplicates(media).collect()}
        assert ("v1", "v4") in rows
        assert rows[("v1", "v4")].match_frac == 1.0
        assert ("v1", "v2") in rows          # perturbed copy still pairs
        assert rows[("v1", "v2")].match_frac >= 0.6
        assert all("v3" not in pair for pair in rows)

    def test_registry_rollup_shape(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.multimodal import (
            q_media_video_neardup,
        )

        out = q_media_video_neardup(spark, sf_dir)
        assert out.columns == ["n_identical_payload_pairs",
                               "all_identical_pairs_emitted",
                               "match_frac_within_bounds",
                               "pairs_canonical"]
        row = out.first()
        # identical-payload pairs only exist within the video modality at
        # sf0.1 (the planted text dups straddle modalities at smaller SFs,
        # same as media_phash); the theorems must hold at every SF
        assert row.n_identical_payload_pairs >= 0
        assert row.all_identical_pairs_emitted
        assert row.match_frac_within_bounds
        assert row.pairs_canonical


class TestAudioNearDup:
    def test_copy_perturbed_distinct(self, spark):
        from social_media_sentiment_analysis_spark.operators.multimodal import (
            audio_near_duplicates,
        )

        rng = np.random.default_rng(23)
        base = rng.integers(0, 256, size=8000, dtype=np.uint8).tobytes()
        near = bytearray(base)
        near[500] = (near[500] + 3) % 256
        other = rng.integers(0, 256, size=8000, dtype=np.uint8).tobytes()
        media = spark.createDataFrame(
            [("a1", "audio", base, 4000),
             ("a2", "audio", bytes(near), 4000),
             ("a3", "audio", other, 4000)],
            "media_id string, modality string, payload binary, "
            "duration_ms long")
        rows = {(r.a_id, r.b_id): r
                for r in audio_near_duplicates(media).collect()}
        assert ("a1", "a2") in rows
        assert rows[("a1", "a2")].match_frac >= 0.6
        assert all("a3" not in p for p in rows)

    def test_registry_rollup_runs(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.multimodal import (
            q_media_audio_neardup,
        )

        row = q_media_audio_neardup(spark, sf_dir).first()
        # theorem row always exists; the synthetic-payload test above pins
        # the recall semantics, the contract booleans must hold on testdata
        assert row is not None and row.n_identical_payload_pairs >= 0
        assert row.all_identical_pairs_emitted
        assert row.match_frac_within_bounds and row.pairs_canonical
