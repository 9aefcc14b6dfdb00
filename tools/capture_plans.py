"""Capture .explain("formatted") for bench queries into plans/r10/.

Usage: python tools/capture_plans.py <suffix> [query ...]
   e.g. python tools/capture_plans.py before          # all batch bench queries
        python tools/capture_plans.py after q1 q2     # just the named ones

Streaming drains (builders that RUN a stream and return the flag read-back)
are skipped by default: their interesting plans are the per-micro-batch
foreachBatch plans, which tests/test_plans.py pins separately — the
read-back explain would only show a parquet scan of the temp store.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_sentiment_analysis_spark.queries.registry import QUERIES  # noqa: E402
from social_media_sentiment_analysis_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

STREAMING = {n for n in bench.BENCH_QUERIES if n.startswith("streaming_")}


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or [n for n in bench.BENCH_QUERIES
                             if n not in STREAMING]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].builder(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
