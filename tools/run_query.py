"""Run a registry query from the command line.

    python tools/run_query.py <query> [--sf DIR] [--explain] [--oracle] [-n N]

Shows the result (first N rows), optionally the formatted physical plan,
and optionally the DuckDB oracle result side by side — the quickest way to
eyeball a single operator without writing a script.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_sentiment_analysis_spark.queries.registry import QUERIES  # noqa: E402
from social_media_sentiment_analysis_spark.schemas import TESTDATA_TABLES  # noqa: E402
from social_media_sentiment_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", choices=sorted(QUERIES), metavar="query")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the DuckDB oracle SQL")
    ap.add_argument("-n", type=int, default=20)
    args = ap.parse_args()

    q = QUERIES[args.query]
    print(f"# {args.query}: {q.doc}\n")
    spark = get_spark("run-query")
    df = q.builder(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=False)
    print(f"({df.count()} rows total)")
    if args.oracle:
        if q.oracle is None:
            print("no oracle (rows-only query)")
        else:
            import duckdb
            con = duckdb.connect()
            for t in TESTDATA_TABLES:
                con.execute(f"CREATE VIEW {t} AS "
                            f"SELECT * FROM '{args.sf}/{t}.parquet'")
            print("\n# DuckDB oracle:")
            print(con.execute(q.oracle).df().head(args.n).to_string())
    spark.stop()


if __name__ == "__main__":
    main()
