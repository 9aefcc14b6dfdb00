"""Isolated-protocol bench baseline (r6 verdict #3).

Cross-round wall-clock comparisons from the in-sweep bench are not
host-drift-proof: r6's delta flagged 29 "regressions" that a pure-Python
microbenchmark, plan-identity checks, and the judge's own rerun all
adjudicated as host throttling. The root cause is protocol asymmetry —
a flagged query's isolated rerun (fresh session, min of 3) was compared
against a BASELINE measured in-sweep (49 queries of cache/GC/JIT
contamination), so the two numbers never shared a protocol.

This tool records the isolated-protocol number for EVERY headline query
once per round (``bench._isolated_rerun``: fresh warmed session per
query, min of 3 passes) into ``BENCH_ISOLATED.json``. The next round's
``bench.py`` delta then adjudicates each flagged regression
isolated-vs-isolated — same protocol on both sides — so a host-throttled
round still yields a readable verdict.

Usage (end of round, after the last code change):

    python tools/bench_isolated.py            # all headline queries
    python tools/bench_isolated.py q1 q2 ...  # subset refresh

Cost is one fresh JVM per query (~15-25 s each); this is a builder-run
maintenance job, never part of the driver's per-round bench.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, SF_DIR, _isolated_rerun  # noqa: E402
from social_media_sentiment_analysis_spark.queries.registry import (  # noqa: E402
    QUERIES,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_ISOLATED.json")


def main() -> int:
    names = sys.argv[1:] or [n for n in BENCH_QUERIES if n in QUERIES]
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    prior: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
        if prior.get("sf") != sf:
            prior = {}           # never mix scale factors in one baseline
    queries = dict(prior.get("queries", {}))
    for i, name in enumerate(names):
        sec = _isolated_rerun(name)
        queries[name] = sec
        print(f"[{i + 1}/{len(names)}] {name}: {sec}s", flush=True)
    with open(OUT, "w") as f:
        json.dump({
            "protocol": "fresh-session min-of-3 (bench._isolated_rerun)",
            "sf": sf,
            "queries": queries,
        }, f, indent=2, sort_keys=True)
    print(f"wrote {OUT} ({len(queries)} queries, sf {sf})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
