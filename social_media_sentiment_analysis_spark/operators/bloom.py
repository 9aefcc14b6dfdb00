"""Distributed Bloom filter as a relational operator — build a fixed-size
bitmap over a key set with ONE aggregation, probe any stream of keys with
map-side broadcast joins. The 100 TB membership-probe primitive: where the
exact approach broadcasts the full key SET (unbounded — the bug class
plans/lint.py forbids), the Bloom bitmap is CONSTANT-size by construction
(``num_bits``), whatever the key set grows to; false positives only cost
verify work downstream, and false negatives cannot occur.

Representation: the m-bit array lives as a DataFrame of (slot, mask) rows —
slot = bit-position div 64, mask = OR of the set bits in that 64-bit word —
at most m/64 rows (32k rows ≈ 256 KB for the default 2^21 bits), built by
``groupBy(slot).agg(bit_or(...))`` whose map-side partial combine bounds the
shuffle at m/64 rows PER PARTITION regardless of input size (the same
partial-agg argument as operators/cms.py). The k hash functions are
xxhash64 seeded by index — pure Column, no UDF anywhere.

Probing joins the bitmap k times on slot (broadcast — the bitmap is
bounded, so the hint is lint-legal) and keeps rows whose k probed bits are
all set: scan → k map-side joins → filter, ZERO exchanges on the probed
stream.

Spark note: the engine's own ``bloom_filter_agg`` / ``might_contain``
expressions exist only inside the runtime-filter optimizer rule — they are
not registered SQL routines (UNRESOLVED_ROUTINE in 4.1), and
``df.stat.bloomFilter`` materializes a driver-side JVM object that Python
cannot ship into Column expressions. This operator is the declarative
replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 21   # 2M bits = 32k slot rows = 256 KB bitmap
DEFAULT_K = 3                # hash functions


def _positions(col, num_bits: int, k: int) -> list:
    """The k bit positions for a key: xxhash64 seeded by hash index."""
    return [F.pmod(F.xxhash64(col, F.lit(j)), F.lit(num_bits))
            for j in range(k)]


def bloom_bitmap(df: DataFrame, key_col: str,
                 num_bits: int = DEFAULT_NUM_BITS,
                 k: int = DEFAULT_K) -> DataFrame:
    """(slot, mask): the Bloom bitmap of ``df[key_col]`` as 64-bit words.
    One aggregation; shuffle bounded at num_bits/64 rows per partition."""
    pos = df.select(F.explode(F.array(
        *_positions(F.col(key_col), num_bits, k))).alias("p"))
    return (pos
            .select(F.shiftright("p", 6).alias("slot"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pmod(p, 64) AS INT))").alias("bit"))
            .groupBy("slot")
            .agg(F.bit_or("bit").alias("mask")))


def bloom_probe(df: DataFrame, key_col: str, bitmap: DataFrame,
                num_bits: int = DEFAULT_NUM_BITS,
                k: int = DEFAULT_K) -> DataFrame:
    """Rows of ``df`` whose key is POSSIBLY in the bitmap's key set
    (guaranteed superset of the true members — no false negatives; ~1% fp
    at 10 bits/key). k broadcast joins + a filter: the probed stream never
    shuffles, so this composes as a map-side pre-filter in front of any
    exact verify join."""
    # the bitmap fans out to k join consumers — materialize it ONCE
    # (eager: a lazy checkpoint re-plans per consumer and leaks persisted
    # RDDs, see tests/test_cache_hygiene.py); it is ≤ num_bits/64 rows
    bitmap = bitmap.localCheckpoint()
    out = df
    conds = []
    for j, p in enumerate(_positions(F.col(key_col), num_bits, k)):
        out = (out
               .withColumn(f"__p{j}", p)
               .withColumn(f"__slot{j}", F.shiftright(f"__p{j}", 6))
               .withColumn(f"__bit{j}",
                           F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                                  f"CAST(pmod(__p{j}, 64) AS INT))")))
        bm = F.broadcast(bitmap.select(
            F.col("slot").alias(f"__slot{j}"),
            F.col("mask").alias(f"__mask{j}")))
        out = out.join(bm, f"__slot{j}", "left")
        conds.append(
            (F.coalesce(F.col(f"__mask{j}"), F.lit(0))
             .bitwiseAND(F.col(f"__bit{j}"))) != 0)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    drop = [c for j in range(k)
            for c in (f"__p{j}", f"__slot{j}", f"__bit{j}", f"__mask{j}")]
    return out.filter(cond).drop(*drop)
