"""Named query registry — the single source of truth consumed by
``__spark_entry__.py``, tests, and bench.py.

Each entry pairs a Spark DataFrame builder with its DuckDB oracle SQL
(None for genuinely non-SQL-expressible operators, which the driver checks
rows-only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from . import reference


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


_ALL: list[Query] = [
    Query("sentiment_summary", reference.q_sentiment_summary,
          reference.ORACLE_SENTIMENT_SUMMARY,
          "A1: GROUP BY final_sentiment count/avg/sum, ORDER BY count desc"),
    Query("sentiment_total", reference.q_sentiment_total,
          reference.ORACLE_SENTIMENT_TOTAL,
          "A2: grand-total aggregate"),
    Query("sentiment_enrich", reference.q_sentiment_enrich,
          reference.ORACLE_SENTIMENT_ENRICH,
          "U4/U6: full clean→score→ensemble enrichment projection"),
    Query("recent_tweets", reference.q_recent_tweets,
          reference.ORACLE_RECENT_TWEETS,
          "O1: top-k by recency (TakeOrderedAndProject)"),
    Query("recent_negative", reference.q_recent_negative,
          reference.ORACLE_RECENT_NEGATIVE,
          "O1+P4: top-k with sentiment equality filter"),
    Query("lang_filter", reference.q_lang_filter,
          reference.ORACLE_LANG_FILTER,
          "P2/P3: language + non-empty-text filters"),
    Query("trailing_window", reference.q_trailing_window,
          reference.ORACLE_TRAILING_WINDOW,
          "P5: trailing 24h predicate + agg (anchored to max ts)"),
    Query("hourly_rollup", reference.q_hourly_rollup,
          reference.ORACLE_HOURLY_ROLLUP,
          "A3: hour × type rollup (batch form of the streaming rollup)"),
    Query("export", reference.q_export,
          reference.ORACLE_EXPORT,
          "O3/S8: filtered, sorted export projection"),
]

QUERIES: dict[str, Query] = {q.name: q for q in _ALL}


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
