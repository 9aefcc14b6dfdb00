"""Streaming throughput benchmark: the reference's whole dataflow
(Kafka-envelope JSON → parse → flatten → clean/score/ensemble →
watermarked dedup, SURVEY §3.2) as one Structured Streaming query, measured
end to end in rows/s.

The reference processes ~0.17–1.7 tweets/s by construction (single-threaded
consumer loop + two HTTP hops per tweet, BASELINE.md); this measures the
same semantics as a vectorized stream. Envelope payloads are derived from
the driver's documents table (text) — replicated with distinct ids to reach
a meaningful message count — serialized to JSONL files and consumed with a
file source + availableNow trigger (same micro-batch machinery as Kafka,
no broker needed).

Usage: python tools/stream_bench.py [sf_dir] [replication]
Prints one JSON line: {"rows_in":N,"rows_out":N,"sec":S,"rows_per_sec":R}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from social_media_sentiment_analysis_spark.session import get_spark  # noqa: E402
from social_media_sentiment_analysis_spark.streaming.pipeline import (  # noqa: E402
    enrich_tweet_stream,
    parse_envelopes,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPLICATION = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main() -> None:
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    try:
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        # replicate each doc into REPLICATION distinct tweet envelopes
        base = (
            docs.select("doc_id", "text")
            .select("doc_id", "text",
                    F.explode(F.sequence(
                        F.lit(0), F.lit(REPLICATION - 1))).alias("rep"))
            .select((F.col("doc_id") * REPLICATION + F.col("rep"))
                    .cast("string").alias("id"),
                    "text",
                    (F.col("doc_id") % 1000).cast("string").alias("author"))
        )
        envelope = F.to_json(F.struct(
            F.struct(
                F.col("id"),
                F.col("text"),
                F.lit("2026-01-01T00:00:00Z").alias("created_at"),
                F.col("author").alias("author_id"),
                F.lit("en").alias("lang"),
                F.struct(
                    (F.crc32(F.col("id")) % 100).alias("retweet_count"),
                    (F.crc32(F.col("id")) % 1000).alias("like_count"),
                    (F.crc32(F.col("id")) % 10).alias("reply_count"),
                    (F.crc32(F.col("id")) % 5).alias("quote_count"),
                ).alias("public_metrics"),
            ).alias("data"),
            F.struct(F.array(F.struct(
                F.col("author").alias("id"),
                F.concat(F.lit("user_"), F.col("author")).alias("username"),
            )).alias("users")).alias("includes"),
            # spread event-time over an hour so dedup state sees a range
            (F.lit(1767225600000)
             + (F.crc32(F.col("id")) % 3600) * 1000).alias("kafka_timestamp"),
        ))
        base.select(envelope.alias("value")) \
            .repartition(32).write.mode("overwrite").text(in_dir)
        rows_in = spark.read.text(in_dir).count()

        raw = spark.readStream.text(in_dir)
        good, _rejects = parse_envelopes(raw, value_col="value")
        enriched = enrich_tweet_stream(good)

        counts: list[int] = []

        def sink(batch, _bid) -> None:
            counts.append(batch.count())

        t0 = time.time()
        q = (enriched.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        sec = time.time() - t0
        rows_out = sum(counts)
        print(json.dumps({
            "rows_in": rows_in, "rows_out": rows_out,
            "sec": round(sec, 2),
            "rows_per_sec": round(rows_in / sec, 1),
            "sf": SF_DIR, "replication": REPLICATION,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
