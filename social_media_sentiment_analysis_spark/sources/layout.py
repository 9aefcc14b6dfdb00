"""Table layout for scale: partitioned and bucketed writers.

Layout is the other half of every plan: partition columns give scans
partition *pruning* (a date filter reads only matching directories);
bucketing gives joins and aggregations a pre-shuffled layout — two tables
bucketed by the same key into the same bucket count join with NO exchange
on either side. At 100 TB that's the difference between a terabyte-scale
shuffle per join and none; the fact tables of a star schema should be
bucketed on their most-joined key at ingest.

Bucketing requires the table catalog (`saveAsTable`) — bucket metadata
lives in the metastore, not the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: tuple[str, ...],
                      fmt: str = "parquet") -> None:
    """Hive-style partitioned write: one directory per partition value —
    the unit of partition pruning for every later scan. Choose columns with
    bounded cardinality (date, hour, category); never a high-cardinality id
    (millions of tiny files kill the file index)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt) \
        .save(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 16,
                   sort_col: str | None = None) -> None:
    """Bucketed (and optionally sorted) catalog table. Joins/aggregations on
    ``bucket_col`` between tables with identical bucketing skip the shuffle;
    the sort additionally skips the sort phase of a sort-merge join."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_range_sorted(df: DataFrame, path: str, sort_col: str,
                       n_files: int = 8) -> None:
    """Write parquet clustered on ``sort_col``: range-repartition into
    ``n_files`` disjoint key ranges, sort within each, write one file per
    range. Result: every file's parquet min/max footer covers a disjoint
    slice of the key space, so a point or range filter on ``sort_col``
    skips all but the relevant files/row-groups — the poor man's Z-order,
    and the single highest-leverage layout decision for selective scans
    at 100 TB."""
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite").parquet(path)
    )
