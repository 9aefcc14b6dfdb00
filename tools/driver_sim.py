"""Simulate the driver's correctness gate EXACTLY: a vanilla SparkSession
(local[8], NO engine-tuned conf — whatever the driver builds is what the
queries must survive), the __spark_entry__ contract surface (entry(),
queries(), oracle_sql()), and the first-50 registry slice the real gate
verifies, compared against DuckDB with the same canonicalization.

Catches the failure class tools/oracle_check.py cannot: a query that only
works under the engine's tuned session (shuffle partitions, AQE flags,
Arrow settings, timezone).

Usage: python tools/driver_sim.py [sf_dir] [n_queries]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = (SparkSession.builder.master("local[8]")
             .appName("driver-sim").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    smoke = entrymod.entry(spark)
    rows = smoke.collect()
    print(f"entry(): {len(rows)} rows, schema {[f.name for f in smoke.schema]}")
    assert len(rows) >= 0 and smoke.schema

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in list(queries)[:n]:
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)})")
            continue
        odf = con.execute(oracles[name]).df()
        ok = (len(sdf) == len(odf)
              and sorted(sdf.columns) == sorted(odf.columns)
              and value_hash(sdf) == value_hash(odf))
        print(("OK  " if ok else "FAIL") + f" {name} ({len(sdf)} rows)")
        failures += 0 if ok else 1
    spark.stop()
    print(f"driver-sim: {failures} failures over first {n}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
