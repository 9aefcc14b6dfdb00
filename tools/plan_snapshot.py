"""Regenerate tests/plan_snapshot.json: the pinned shuffle-exchange count
per registry query (pre-execution physical plan, shuffle_partitions=8 — the
same conditions tests/test_plans.py compares under).

The snapshot is the exchange-count regression contract (r3 verdict #7):
``test_exchange_counts_do_not_regress`` fails any query whose current count
EXCEEDS its pinned value, so an accidental extra shuffle (a lost broadcast,
a lost partitioning reuse) fails CI even while correctness stays green.
Counts that DROP are improvements — rerun this tool to ratchet them in.

Usage: python tools/plan_snapshot.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_sentiment_analysis_spark.plans.inspect import (  # noqa: E402
    exchange_count,
)
from social_media_sentiment_analysis_spark.queries.registry import (  # noqa: E402
    QUERIES,
)
from social_media_sentiment_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-snapshot", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    counts: dict[str, int] = {}
    for name in sorted(QUERIES):
        try:
            counts[name] = exchange_count(QUERIES[name].builder(spark, sf_dir))
        except Exception as exc:  # pragma: no cover
            print(f"SKIP {name}: {exc}")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "plan_snapshot.json")
    with open(out, "w") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
    print(f"wrote {out} ({len(counts)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
