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
zero.

De-flake contract (r3 verdict): the drain is PROGRESS-based, not a fixed
wall budget — under CPU contention (a co-running Spark session sharing the
cores) the async ContextCleaner drains slowly but steadily, so the drain
keeps waiting while the count is still falling and only gives up after a
no-progress window.

The LEAK signal is GROWTH between identical passes: a leaked persist()
adds the same blocks every run, so counts strictly increase. The strict
steady-state bound (≤1: the JVM's last-execution slot) is additionally
asserted, but when the drain stalls above it — observed bimodally under
pytest after the 194-query parity sweep: the SAME sequence drains to 0 in
one run and floors at a constant 6 in another, standalone scripts always
reach 0, and the survivors are always localCheckpoint RDDs whose Python
handles are long dead (a py4j finalizer-backlog artifact, not a reference
our code holds) — the test proves BOUNDEDNESS with a third identical pass
instead of failing on drain plumbing: a real leak still grows and still
fails.
"""

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


def _drain(spark, no_progress_s: float = 75.0, hard_cap_s: float = 600.0) -> int:
    """Force Python+JVM GC until the persisted-RDD count reaches the
    steady-state slot. The ContextCleaner queue is async and bursty, and
    under load each sweep can take tens of seconds — so the give-up rule
    is "no progress for ``no_progress_s``", which a loaded-but-healthy
    cleaner never trips, instead of a fixed wall budget (the r3 full-suite
    flake: 150 s was not enough with a second session contending for the
    cores)."""
    start = time.time()
    last_progress = start
    best = None
    while True:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.5)
        n = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        if n <= 1:
            return n
        if best is None or n < best:
            best, last_progress = n, time.time()
        now = time.time()
        if now - last_progress > no_progress_s or now - start > hard_cap_s:
            return n


def _one_pass(spark, sf_dir) -> int:
    for name in PERSIST_PRONE:
        df = QUERIES[name].builder(spark, sf_dir)
        df.collect()
        del df
    return _drain(spark)


def _survivors(spark) -> list[str]:
    """Callsite strings of the still-persisted RDDs — names the leak."""
    rdds = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = rdds.toList()
    return [str(it.apply(i)._2().toString())[:120]
            for i in range(min(rdds.size(), 16))]


def test_no_cache_accumulation_across_queries(spark, sf_dir):
    counts = [_one_pass(spark, sf_dir), _one_pass(spark, sf_dir)]
    # HARD invariant: no growth between identical passes — a leaked
    # persist() re-adds its blocks every run, so a leak strictly grows
    assert counts[1] <= max(counts[0], 1), (counts, _survivors(spark))
    if counts[1] > 1:
        # strict steady state (≤ the 1 JVM-pinned last-execution slot) not
        # reached — drain-plumbing stall (see module docstring) or a real
        # bounded pin. Prove boundedness with a third identical pass; a
        # genuine leak keeps growing and fails here.
        third = _one_pass(spark, sf_dir)
        assert third <= counts[1], (counts + [third], _survivors(spark))
