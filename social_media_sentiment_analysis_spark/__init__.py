"""social_media_sentiment_analysis_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Fratu223/Social-Media-Sentiment-Analysis``
(a Kafka → clean → sentiment-score → SQL-store/serve pipeline), plus the
large-scale training-data operators (dedup, similarity search, multimodal
columns, text analysis) such an engine needs at 100 TB scale.

Layout
------
- ``schemas``     — explicit StructType schemas (tweet envelope, enriched record,
                    store tables) replacing the reference's schema-on-read dicts.
- ``sources``     — batch parquet/JSON IO, Kafka source/sink builders, JDBC.
- ``functions``   — pure-Column scalar transforms: text cleaning, deterministic
                    lexicon sentiment, the ensemble combiner, vector math.
- ``operators``   — dedup family (exact / MinHash-LSH / SimHash / n-gram
                    Jaccard), similarity search, multimodal column plumbing.
- ``queries``     — the named query registry mirroring the reference's serving
                    surface (summary / recent / export / rollup) + star-schema
                    joins + LLM-data-pipeline queries, each paired with an
                    ANSI-SQL oracle string for DuckDB parity checking.
- ``streaming``   — Structured Streaming pipelines: watermarked dedup,
                    windowed rollups, idempotent foreachBatch sinks.

Everything is declarative DataFrame API so Catalyst handles pushdown, pruning,
join strategy and whole-stage codegen; Python UDFs appear only where a
third-party model genuinely requires them (and are Arrow-vectorized).
"""

__version__ = "0.1.0"
