"""Multimodal column operators: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / frame-sample as Arrow-batched ``mapInPandas``
stages.

Design (engine extension beyond the reference — the reference is text-only):

- Media rides in a DataFrame as an opaque ``binary`` column plus typed
  metadata (``schemas.MEDIA_SCHEMA``): modality, mime, dims, duration. Spark
  never interprets the bytes except inside explicit decode stages, so scans,
  filters, joins and shuffles on metadata stay JVM-side and columnar.
- Decode / feature-extraction run as ``mapInPandas`` over Arrow record
  batches: bytes cross into Python once per batch (not per row), and the
  output schema is declared up front so downstream planning is unaffected.
- Real codec work (PIL/libav/ffmpeg) is NOT available in this environment;
  ``decode_payload`` is therefore a clearly-marked stub. The *deterministic
  fake* decoder (`_fake_decode_stats`) interprets the payload's raw bytes —
  shape-compatible with a real decoder's output, so swapping in a real
  implementation changes no plan, schema, or test plumbing.

Scale notes: payload batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB payloads set
it low (e.g. 64) so an Arrow batch stays within executor memory. Feature
extraction is embarrassingly parallel; no shuffle is introduced until the
caller aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MODALITIES = ("image", "audio", "video")
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

MEDIA_FEATURE_SCHEMA = (
    "media_id string, modality string, n_bytes bigint, "
    "byte_mean double, byte_std double, byte_min long, byte_max long, "
    "n_frames bigint"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Derive a MEDIA_SCHEMA-shaped table from the ``documents`` testdata
    table: payload = UTF-8 bytes of the text (a stand-in for encoded media),
    modality assigned deterministically by doc_id, dims derived from length.

    Pure Column expressions — stays in whole-stage codegen.
    """
    modality = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(modality == "image", F.lit(_MIME["image"]))
        .when(modality == "audio", F.lit(_MIME["audio"]))
        .otherwise(F.lit(_MIME["video"]))
    )
    n = F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long")
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        mime.alias("mime_type"),
        F.when(modality == "image", (n % 64) + 16).alias("width"),
        F.when(modality == "image", (n % 48) + 16).alias("height"),
        F.when(modality != "image", n * 10).alias("duration_ms"),
        F.when(modality == "audio", F.lit(16000).cast("long")).alias("sample_rate"),
    )


def decode_payload(payload: bytes, mime_type: str):
    """Decode encoded media bytes into a numpy array.

    STUB — real decoders (PIL for image, soundfile/libav for audio, ffmpeg
    frame extraction for video) are not installed in this environment. The
    Spark-side plumbing is exercised end-to-end with `_fake_decode_stats`;
    swap this function's body for the real thing in production.
    """
    raise NotImplementedError(
        f"real codec decode for {mime_type!r} requires PIL/libav/ffmpeg; "
        "use extract_media_features (deterministic byte-level fake) in tests"
    )


def _fake_decode_stats(payload: bytes, modality: str) -> tuple:
    """Deterministic stand-in for decode→stats: interpret raw payload bytes
    as the 'signal'. Same output shape as a real decoder's pixel/sample
    stats, so the mapInPandas contract is fully real."""
    import numpy as np

    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    # 'frame sampling': fixed 256-byte frames, matching a real video
    # frame-sample stage's output cardinality contract
    n_frames = int(np.ceil(arr.size / 256)) if modality == "video" else 1
    return (
        int(arr.size),
        float(arr.mean()),
        float(arr.std()),
        int(arr.min()),
        int(arr.max()),
        n_frames,
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over MEDIA_SCHEMA rows.

    One Python crossing per Arrow batch; output schema declared so Catalyst
    plans downstream ops normally. Columns pruned to exactly what the stage
    needs before the Python boundary.
    """

    def features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = [
                (mid, mod, *_fake_decode_stats(payload, mod))
                for mid, mod, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame(
                out,
                columns=["media_id", "modality", "n_bytes", "byte_mean",
                         "byte_std", "byte_min", "byte_max", "n_frames"],
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        features, schema=MEDIA_FEATURE_SCHEMA
    )
