"""Sublinearity probe: inflate the sf0.1 facts 10x in place (~sf1) and
re-run the bench headline set against the inflated copy.

Method (same as the round-2 probe recorded in SCALE.md §7): each fact
table is unioned with key-offset copies so join keys stay unique and
cardinalities really grow — lineitem/orders shift orderkey (and custkey,
so the per-customer rollups see 10x customers — the input class the
round-3 distributed-ranking operators exist for), events shift event_id,
documents/embeddings shift their ids. Dim tables copy unchanged. Star
joins against fixed dims therefore match only the first copy — this is a
THROUGHPUT probe, not a correctness run (the oracle gate covers that).

Usage: python tools/scale_probe.py [factor] [out_dir]
Writes out_dir (default /tmp/scale_probe/sf1), runs bench.py against it,
prints the bench JSON line last.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.schemas import TESTDATA_TABLES
from social_media_sentiment_analysis_spark.session import get_spark
from social_media_sentiment_analysis_spark.sources.batch import load_table

SRC = "/root/testdata/sf0.1"

OFFSETS = {  # table -> columns to shift per copy (key-uniqueness)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def inflate(spark, table: str, factor: int, out_dir: str) -> None:
    df = load_table(spark, SRC, table)
    if table in OFFSETS:
        offs = {c: df.agg(F.max(c)).first()[0] + 1 for c in OFFSETS[table]}
        copies = [
            df.withColumns({c: F.col(c) + F.lit(off * i)
                            for c, off in offs.items()})
            for i in range(factor)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
    else:
        out = df
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe/sf1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TESTDATA_TABLES:
        inflate(spark, t, factor, out_dir)
        print(f"inflated {t}", file=sys.stderr)
    spark.stop()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out_dir)
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    out = subprocess.run([sys.executable, bench], env=env,
                         capture_output=True, text=True)
    print(out.stdout.strip().splitlines()[-1] if out.stdout.strip() else
          f"bench failed: {out.stderr[-500:]}")


if __name__ == "__main__":
    main()
