"""Isolated A/B decomposition of the media_phash query (VERDICT r3 #2).

Runs in a FRESH session with nothing co-running, 3 passes per stage,
reports min + all passes, attributing wall time to:

  decode        attach_media + Arrow decode→dHash crossing (mapInPandas),
                materialized via localCheckpoint().count()
  join_verify   banded self-join + bit_count hamming filter over the
                ALREADY-MATERIALIZED hash table (no distinct)
  distinct      the full pair set incl. the distinct() shuffle
  rollup        per-modality aggregate over the pairs
  total         q_media_phash end to end (fresh lineage, its own checkpoint)

Usage: python tools/phash_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.operators.dedup import (
    banded_hamming_pairs,
)
from social_media_sentiment_analysis_spark.operators.multimodal import (
    attach_media,
    phash_media,
)
from social_media_sentiment_analysis_spark.queries.multimodal import (
    q_media_phash,
)
from social_media_sentiment_analysis_spark.session import get_spark
from social_media_sentiment_analysis_spark.sources.batch import load_table


def timed(fn, passes: int) -> list[float]:
    out = []
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("phash-ab")
    media = attach_media(load_table(spark, sf_dir, "documents"))

    results: dict[str, list[float]] = {}

    # stage A: decode — materialize the hash table once per pass
    fps = []

    def run_decode():
        fp = phash_media(media).localCheckpoint()
        fp.count()
        fps.append(fp)

    results["decode"] = timed(run_decode, passes)
    fp = fps[-1]  # reuse the last materialization for the downstream stages

    # stage B: banded join + hamming verify, NO distinct
    n_bands, mask = 4, (1 << 16) - 1
    banded = fp.select(
        "media_id", "modality", "phash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("phash"), b * 16).bitwiseAND(F.lit(mask))
            for b in range(n_bands)])).alias("band", "band_val"))
    left, right = banded.alias("l"), banded.alias("r")
    cond = ((F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.modality") == F.col("r.modality"))
            & (F.col("l.media_id") < F.col("r.media_id")))
    hamming = F.bit_count(F.col("l.phash").bitwiseXOR(F.col("r.phash")))
    verified = left.join(right, cond).filter(hamming <= 6)
    results["join_verify"] = timed(lambda: verified.count(), passes)

    # stage C: + distinct
    pairs = banded_hamming_pairs(fp, "media_id", "phash", 16, 6,
                                 block_cols=("modality",))
    results["distinct"] = timed(lambda: pairs.count(), passes)

    # stage D: + rollup
    rollup = (pairs.groupBy("modality")
              .agg(F.count(F.lit(1)).alias("dup_pairs"),
                   F.round(F.avg("hamming"), 4).alias("avg_hamming"))
              .orderBy("modality"))
    results["rollup"] = timed(lambda: rollup.collect(), passes)

    # stage E: the registry query end to end (own checkpoint + decode)
    results["total"] = timed(
        lambda: q_media_phash(spark, sf_dir).collect(), passes)

    print(json.dumps({
        "sf_dir": sf_dir, "passes": passes,
        "min": {k: min(v) for k, v in results.items()},
        "all": results,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
