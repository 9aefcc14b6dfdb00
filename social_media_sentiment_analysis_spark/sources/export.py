"""Export and external-storage edges: CSV/JSON export (S8), JDBC connectors
(S9), and DDL generation (S10).

Reference behavior: `GET /export?format=csv&hours=24` ran a time-filtered
SELECT, pulled all rows into pandas, and returned one CSV string with
attachment headers (sentiment_analysis.py:668-715). Storage was
SQLite/PostgreSQL via hand-rolled DDL (:87-216 — with the PG branch broken
by an `IF NOT EXIST` typo at :96).

Here exports are distributed writes: each partition streams straight to its
own CSV/JSON part file — no driver-side collect — so the same call exports a
100 TB result. ``export_csv_string`` keeps the reference's small-result
convenience (a single in-memory CSV for an API response) and is explicitly
NOT the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S8 CSV export as a distributed write (header per part file).
    ``single_file=True`` coalesces to one part — only for small results;
    at scale leave it False and let each task write its own part."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json(df: DataFrame, path: str) -> None:
    """S8 JSON export (one JSON object per line, the reference's JSONL)."""
    df.write.mode("overwrite").json(path)


def export_csv_string(df: DataFrame) -> str:
    """The reference's exact /export contract: one CSV string built via
    pandas (sentiment_analysis.py:695-707). Driver-side by construction —
    use only for bounded API responses, never in a data pipeline."""
    return df.toPandas().to_csv(index=False)


# ---------------------------------------------------------------------------
# S9: JDBC connectors — thin, partitioning-aware wrappers.
# ---------------------------------------------------------------------------

def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound=None, upper_bound=None,
              num_partitions: int | None = None,
              **options) -> DataFrame:
    """JDBC read (S9). Always pass the partition-column quartet for tables
    of any size — without it the whole table arrives through ONE connection
    on one task. Predicates on the result push down into the remote SQL."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batch_size: int = 10_000, **options) -> None:
    """JDBC write (S9): batched inserts per partition. For the idempotent
    keyed-table semantics (S6/D2) pair with the anti-join in
    streaming/sinks.py — plain JDBC append is at-least-once."""
    writer = (
        df.write.format("jdbc").mode(mode)
        .option("url", url).option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


# ---------------------------------------------------------------------------
# S10: DDL generation from StructType schemas.
# ---------------------------------------------------------------------------

_SQL_TYPES = {
    StringType(): "STRING",
    LongType(): "BIGINT",
    DoubleType(): "DOUBLE",
    TimestampType(): "TIMESTAMP",
}


def ddl_for(schema: StructType, table: str, using: str = "parquet",
            partitioned_by: tuple[str, ...] = ()) -> str:
    """Spark-SQL DDL from a StructType — the engine's form of the
    reference's CREATE TABLE blocks (sentiment_analysis.py:157-209),
    corrected (`IF NOT EXISTS`) and partition-aware."""
    cols = ",\n  ".join(
        f"{f.name} {_SQL_TYPES.get(f.dataType, f.dataType.simpleString().upper())}"
        for f in schema.fields
    )
    ddl = f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n) USING {using}"
    if partitioned_by:
        ddl += f"\nPARTITIONED BY ({', '.join(partitioned_by)})"
    return ddl


def export_orc(df: DataFrame, path: str,
               partition_by: tuple[str, ...] = ()) -> None:
    """ORC export (S8 family, columnar twin of the CSV/JSON paths) — the
    interchange format for Hive/Trino-adjacent consumers. Built into Spark
    (no extra package, unlike Avro); predicate pushdown and column pruning
    work on read-back exactly as with parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
