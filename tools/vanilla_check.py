"""Targeted vanilla-session oracle check: tools/driver_sim.py's session
and comparison (local[8], only shuffle.partitions=32 — the driver's
environment, not the tuned factory), but for an explicit query list
instead of the front-50 slice. The fast pre-commit probe for queries
changed this round; catches config/partitioning dependence (fitted
models, worker import path) that the tuned-session oracle_check masks.

Usage: python tools/vanilla_check.py <sf_dir> <query> [query ...]
Run from a NON-repo cwd to exercise the worker import path honestly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from social_media_sentiment_analysis_spark.schemas import (  # noqa: E402
    TESTDATA_TABLES,
)
from tools.oracle_check import value_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32").getOrCreate())
    entrymod._ship_package(spark)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in names:
        sdf = queries[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"ROWS {name} ({len(sdf)} rows, no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        ok = (len(sdf) == len(odf)
              and sorted(sdf.columns) == sorted(odf.columns)
              and value_hash(sdf) == value_hash(odf))
        print(("OK  " if ok else "FAIL"), f"{name} ({len(sdf)} rows)")
        failures += 0 if ok else 1
    print(f"vanilla-check: {failures} failures over {len(names)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
