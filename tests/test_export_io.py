"""IO-edge tests: CSV/JSON export writers (S8), DDL generation (S10), and
the streaming progress listener (A4). JDBC wrappers (S9) are
shape-checked only — no database/driver jar in this environment.
"""

from __future__ import annotations

import csv
import glob
import io
import time

from social_media_sentiment_analysis_spark.schemas import (
    SENTIMENT_SUMMARY_SCHEMA,
    TWEETS_TABLE_SCHEMA,
)
from social_media_sentiment_analysis_spark.sources.export import (
    ddl_for,
    export_csv,
    export_csv_string,
    export_json,
)
from social_media_sentiment_analysis_spark.queries.reference import q_export


def test_export_csv_roundtrip(spark, sf_dir, tmp_path):
    df = q_export(spark, sf_dir).limit(20)
    out = str(tmp_path / "csv")
    export_csv(df, out, single_file=True)
    parts = glob.glob(out + "/part-*.csv")
    assert len(parts) == 1
    with open(parts[0]) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 20
    assert set(rows[0]) == set(df.columns)


def test_export_csv_distributed_parts(spark, sf_dir, tmp_path):
    df = q_export(spark, sf_dir).repartition(4)
    out = str(tmp_path / "csv_many")
    export_csv(df, out)
    assert len(glob.glob(out + "/part-*.csv")) == 4  # no driver funnel


def test_export_json_roundtrip(spark, sf_dir, tmp_path):
    df = q_export(spark, sf_dir)
    out = str(tmp_path / "json")
    export_json(df, out)
    assert spark.read.json(out).count() == df.count()


def test_export_csv_string_matches_reference_contract(spark, sf_dir):
    df = q_export(spark, sf_dir).limit(5)
    s = export_csv_string(df)
    rows = list(csv.DictReader(io.StringIO(s)))
    assert len(rows) == 5 and set(rows[0]) == set(df.columns)


def test_ddl_generation(spark):
    ddl = ddl_for(TWEETS_TABLE_SCHEMA, "tweets", partitioned_by=("language",))
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS tweets")
    assert "tweet_id STRING" in ddl and "confidence_score DOUBLE" in ddl
    assert "PARTITIONED BY (language)" in ddl
    rollup_ddl = ddl_for(SENTIMENT_SUMMARY_SCHEMA, "sentiment_summary")
    assert "date_hour TIMESTAMP" in rollup_ddl
    # generated DDL must actually parse/execute in Spark SQL
    spark.sql("DROP TABLE IF EXISTS sentiment_summary")
    spark.sql(rollup_ddl)
    try:
        assert spark.table("sentiment_summary").columns == [
            f.name for f in SENTIMENT_SUMMARY_SCHEMA.fields]
    finally:
        spark.sql("DROP TABLE IF EXISTS sentiment_summary")


def test_progress_listener_counts(spark, tmp_path):
    import json as _json

    from social_media_sentiment_analysis_spark.streaming import (
        read_tweet_file_stream,
    )
    from social_media_sentiment_analysis_spark.streaming.observability import (
        ProgressCounter,
    )
    from tests.test_streaming import ENVELOPES

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "b.jsonl", "w") as f:
        for e in ENVELOPES:
            f.write(_json.dumps(e) + "\n")

    hits = []
    listener = ProgressCounter(log_every=2, on_every=hits.append)
    spark.streams.addListener(listener)
    try:
        q = (
            read_tweet_file_stream(spark, str(src))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        deadline = time.time() + 20   # listener bus is async
        while time.time() < deadline and listener.total() < len(ENVELOPES):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert listener.total() == len(ENVELOPES)
    assert hits and hits[-1] == len(ENVELOPES)  # fired at the 10s-analog cadence


def test_jdbc_roundtrip_embedded_derby(spark, sf_dir, tmp_path):
    """S9 as a real connector: write events to embedded Derby (driver jar
    ships with Spark) and read back with the partition-column quartet —
    the read plans N partition scans, not one connection."""
    from pyspark.sql import functions as F

    from social_media_sentiment_analysis_spark.sources.batch import load_table
    from social_media_sentiment_analysis_spark.sources.export import (
        read_jdbc,
        write_jdbc,
    )

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    events = (load_table(spark, sf_dir, "events")
              .select("event_id", "user_id", "value")
              .limit(200))
    write_jdbc(events, url, "events_t", mode="overwrite",
               driver="org.apache.derby.jdbc.EmbeddedDriver")

    back = read_jdbc(
        spark, url, "events_t",
        partition_column="event_id", lower_bound=0, upper_bound=10_000,
        num_partitions=4, driver="org.apache.derby.jdbc.EmbeddedDriver")
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == events.count()
    a = events.agg(F.sum("value").alias("s")).first().s
    b = back.agg(F.sum("value").alias("s")).first().s
    assert abs(a - b) < 1e-9

    # predicate pushdown: the filter reaches the remote SQL, not Spark
    filtered = read_jdbc(
        spark, url, "events_t",
        driver="org.apache.derby.jdbc.EmbeddedDriver").filter("user_id < 50")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "pushedFilters" in plan.lower()
    assert filtered.count() == events.filter("user_id < 50").count()


def test_observed_metrics_single_pass(spark, sf_dir):
    """observe(): metrics ride the action itself — no second job."""
    from pyspark.sql import functions as F

    from social_media_sentiment_analysis_spark.sources.batch import load_table
    from social_media_sentiment_analysis_spark.streaming.observability import (
        observed,
    )

    events = load_table(spark, sf_dir, "events")
    df, obs = observed(
        events.filter(F.col("event_type") == "purchase"),
        "purchases",
        F.round(F.sum("value"), 4).alias("total_value"),
        F.count_if(F.col("user_id").isNull()).alias("null_users"),
    )
    collected = df.count()
    got = obs.get
    assert got["rows"] == collected
    assert got["null_users"] == 0
    expected = events.filter("event_type = 'purchase'") \
        .agg(F.round(F.sum("value"), 4)).first()[0]
    assert got["total_value"] == expected


class TestSchemaEvolution:
    def test_read_evolving_merges_and_normalizes(self, spark, tmp_path):
        from pyspark.sql.types import (
            DoubleType, LongType, StringType, StructField, StructType,
        )

        from social_media_sentiment_analysis_spark.sources.batch import (
            read_evolving,
        )

        path = str(tmp_path / "t")
        # v1 writer: two columns
        spark.createDataFrame([(1, "a")], "id long, name string") \
            .write.mode("append").parquet(path)
        # v2 writer: adds a score column
        spark.createDataFrame([(2, "b", 0.5)],
                              "id long, name string, score double") \
            .write.mode("append").parquet(path)

        merged = read_evolving(spark, path)
        rows = {r.id: r for r in merged.collect()}
        assert rows[1].score is None and rows[2].score == 0.5

        # v3 target: adds a lang column not yet written; drops name
        target = StructType([
            StructField("id", LongType()),
            StructField("score", DoubleType()),
            StructField("lang", StringType()),
        ])
        norm = read_evolving(spark, path, target)
        assert norm.columns == ["id", "score", "lang"]
        got = {r.id: (r.score, r.lang) for r in norm.collect()}
        assert got == {1: (None, None), 2: (0.5, None)}


def test_orc_roundtrip_preserves_and_pushes_down(spark, sf_dir, tmp_path):
    """ORC export: lossless roundtrip and filter pushdown on read-back
    (the scan must report PushedFilters, same contract as parquet)."""
    from pyspark.sql import functions as F

    from social_media_sentiment_analysis_spark.plans.inspect import (
        formatted_plan,
    )
    from social_media_sentiment_analysis_spark.sources.batch import load_table
    from social_media_sentiment_analysis_spark.sources.export import (
        export_orc, read_orc,
    )

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    export_orc(orders, out)
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    assert back.agg(F.round(F.sum("o_totalprice"), 4)).first()[0] == \
        orders.agg(F.round(F.sum("o_totalprice"), 4)).first()[0]
    filtered = back.filter(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = formatted_plan(filtered)
    assert "PushedFilters" in plan and "o_orderkey" in plan.split(
        "PushedFilters")[1].split("\n")[0]


class TestShardSink:
    """Content-addressed shard writer (Python DataSource writer API):
    manifest-committed output, deterministic naming, exact read-back."""

    def test_write_commit_readback(self, spark, sf_dir, tmp_path):
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )
        from social_media_sentiment_analysis_spark.sources.shards import (
            ShardDataSource, load_shards, read_shard_manifest,
        )

        spark.dataSource.register(ShardDataSource)
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id", "text", "source")
        out = str(tmp_path / "shards")
        (docs.write.format("shards")
         .option("path", out).option("rows_per_shard", "64")
         .mode("append").save())

        manifest = read_shard_manifest(out)
        n = docs.count()
        assert manifest["n_rows"] == n
        assert manifest["n_shards"] >= 1
        # every shard is named by the sha256 of its bytes
        import hashlib
        import os as _os
        for name, n_rows, n_bytes in manifest["shards"]:
            p = _os.path.join(out, name)
            payload = open(p, "rb").read()
            assert len(payload) == n_bytes
            assert name == hashlib.sha256(payload).hexdigest()[:32] + ".jsonl"
        # read-back through the manifest matches the input exactly
        back = load_shards(spark, out,
                           schema="doc_id long, text string, source string")
        assert back.count() == n
        assert ({r.doc_id for r in back.select("doc_id").collect()}
                == {r.doc_id for r in docs.select("doc_id").collect()})

    def test_binary_and_nested_columns_roundtrip(self, spark, tmp_path):
        """Binary payloads go out as base64 and nested structs as real JSON
        objects — not the Python reprs a shallow asDict + default=str
        emits (which read back as irrecoverable garbage)."""
        import base64
        import json

        from social_media_sentiment_analysis_spark.sources.shards import (
            ShardDataSource, read_shard_manifest,
        )

        spark.dataSource.register(ShardDataSource)
        df = spark.createDataFrame(
            [("m1", b"\x89PNG\x00rawbytes", ("cap1", 7))],
            "media_id string, payload binary, "
            "meta struct<caption:string, n:long>")
        out = str(tmp_path / "bin_shards")
        (df.write.format("shards").option("path", out)
         .mode("append").save())

        name = read_shard_manifest(out)["shards"][0][0]
        rec = json.loads(open(f"{out}/{name}").read())
        assert base64.b64decode(rec["payload"]) == b"\x89PNG\x00rawbytes"
        assert rec["meta"] == {"caption": "cap1", "n": 7}   # real object

    def test_rewrite_is_idempotent_by_content(self, spark, sf_dir, tmp_path):
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )
        from social_media_sentiment_analysis_spark.sources.shards import (
            ShardDataSource, read_shard_manifest,
        )

        spark.dataSource.register(ShardDataSource)
        docs = (load_table(spark, sf_dir, "documents")
                .select("doc_id", "text").repartition(1).sortWithinPartitions(
                    "doc_id"))
        out = str(tmp_path / "shards")
        for _ in range(2):  # same content written twice
            (docs.write.format("shards")
             .option("path", out).option("rows_per_shard", "100")
             .mode("append").save())
        manifest = read_shard_manifest(out)
        import os as _os
        files = [f for f in _os.listdir(out) if f.endswith(".jsonl")]
        # content addressing: the second job re-produced the SAME shard
        # files — no duplicates on disk, manifest covers all of them
        assert sorted(files) == sorted(s[0] for s in manifest["shards"])

    def test_streaming_shards_per_epoch_manifests(self, spark, tmp_path):
        import json as _json

        from social_media_sentiment_analysis_spark.sources.shards import (
            ShardDataSource, read_stream_manifests,
        )

        spark.dataSource.register(ShardDataSource)
        src = tmp_path / "in"
        src.mkdir()
        import os as _os
        (src / "a.jsonl").write_text("\n".join(
            _json.dumps({"doc_id": i, "text": f"doc number {i}"})
            for i in range(10)) + "\n")
        (src / "b.jsonl").write_text("\n".join(
            _json.dumps({"doc_id": i, "text": f"doc number {i}"})
            for i in range(10, 25)) + "\n")
        _os.utime(src / "a.jsonl", (1_000_000, 1_000_000))
        _os.utime(src / "b.jsonl", (2_000_000, 2_000_000))
        out = str(tmp_path / "shards")
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (stream.writeStream.format("shards")
             .option("path", out).option("rows_per_shard", "8")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

        manifest = read_stream_manifests(out)
        assert manifest["n_rows"] == 25
        files = {f for f in _os.listdir(out) if f.endswith(".jsonl")}
        assert files == {s[0] for s in manifest["shards"]}
        # at least two epochs committed their own manifests
        epochs = [f for f in _os.listdir(out) if f.startswith("manifest-")]
        assert len(epochs) >= 2

    def test_append_merges_manifest_across_jobs(self, spark, sf_dir,
                                                tmp_path):
        from pyspark.sql import functions as F

        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )
        from social_media_sentiment_analysis_spark.sources.shards import (
            ShardDataSource, load_shards, read_shard_manifest,
        )

        spark.dataSource.register(ShardDataSource)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        first = docs.filter(F.col("doc_id") < 100)
        second = docs.filter(F.col("doc_id") >= 100)
        out = str(tmp_path / "shards")
        for part in (first, second):
            (part.write.format("shards")
             .option("path", out).option("rows_per_shard", "64")
             .mode("append").save())
        manifest = read_shard_manifest(out)
        assert manifest["n_rows"] == docs.count()  # both jobs visible
        back = load_shards(spark, out, schema="doc_id long, text string")
        assert back.count() == docs.count()
        # overwrite replaces the committed view with the new job only
        (first.write.format("shards")
         .option("path", out).option("rows_per_shard", "64")
         .mode("overwrite").save())
        assert read_shard_manifest(out)["n_rows"] == first.count()

    def test_abort_never_deletes_committed_shards(self, tmp_path):
        """abort() must not delete files a committed manifest references —
        identical content across jobs shares a filename, so a failed
        re-run's cleanup would otherwise destroy committed data."""
        import json as _json
        import os as _os

        from social_media_sentiment_analysis_spark.sources.shards import (
            ShardCommitMessage, ShardWriter,
        )

        path = str(tmp_path / "shards")
        _os.makedirs(path)
        committed = "c" * 32 + ".jsonl"
        orphan = "d" * 32 + ".jsonl"
        for name in (committed, orphan):
            open(_os.path.join(path, name), "w").write("{}\n")
        with open(_os.path.join(path, "manifest.json"), "w") as f:
            _json.dump({"n_shards": 1, "n_rows": 1, "n_bytes": 3,
                        "shards": [[committed, 1, 3]]}, f)
        w = ShardWriter({"path": path})
        # a failed job's tasks reported both names; only the orphan goes
        w.abort([ShardCommitMessage(shards=[(committed, 1, 3),
                                            (orphan, 1, 3)]), None])
        assert _os.path.exists(_os.path.join(path, committed))
        assert not _os.path.exists(_os.path.join(path, orphan))
