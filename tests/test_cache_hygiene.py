"""Session-level cache hygiene: persisted/checkpointed blocks must not
ACCUMULATE across queries in one long-lived session.

The engine's rule (SCALE.md §1) is that every materialization barrier is a
``localCheckpoint`` (blocks freed by the ContextCleaner when the JVM RDD
object is garbage-collected) or an explicit persist/unpersist pair — a
leaked ``.persist()`` would grow executor storage with every query until
the session dies. This is the regression tripwire for that class (the
round-1 bench's "already cached" warning).

Measured JVM behavior this test encodes: dropping the Python handle makes
a checkpointed RDD collectable, but the cleaner only fires on JVM GC (the
default periodic GC is 30 min), so the probe forces ``System.gc()`` per
retry; additionally the driver JVM pins the single MOST RECENT query's
checkpoint in a last-execution slot (displaced by the next query, steady
state = 1), so the invariant is boundedness across repeated runs, not
zero."""

from __future__ import annotations

import gc
import time

from social_media_sentiment_analysis_spark.queries.registry import QUERIES

# The queries that use materialization barriers / iterative caching —
# the places a leaked persist would come from.
PERSIST_PRONE = [
    "bigram_logprob", "ccnet_buckets", "dedup_spans", "dedup_clusters",
    "rfm_segments", "customer_spend_quartiles", "important_stock",
    "media_phash", "incremental_dedup",
]


def _drain(spark, budget_s: float = 150.0) -> int:
    """Force Python+JVM GC until the persisted-RDD count reaches the
    steady-state slot (the ContextCleaner queue is async and bursty —
    measured: a few seconds per checkpointed RDD)."""
    deadline = time.time() + budget_s
    n = -1
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.5)
        n = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        if n <= 1:
            break
    return n


def test_no_cache_accumulation_across_queries(spark, sf_dir):
    counts = []
    for _ in range(2):
        for name in PERSIST_PRONE:
            df = QUERIES[name].builder(spark, sf_dir)
            df.collect()
            del df
        counts.append(_drain(spark))
    # steady state: at most the one JVM-pinned last-execution checkpoint,
    # and NO growth between identical runs (growth = a persist() leak)
    assert counts[1] <= max(counts[0], 1), counts
    assert counts[1] <= 1, counts
