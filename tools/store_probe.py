"""Per-micro-batch cost of the incremental dedup sinks as STORE HISTORY
grows (the r6 verdict's one scale flaw, now fixed — this probe is the
evidence). With the bucketed store layout (sources/layout.py), the ONLY
exchange in a probe join is the micro-batch side's, so a fixed-size
micro-batch must shuffle a FLAT number of rows no matter how much history
the store holds; under the old plain-parquet layout the full store
re-shuffled every batch, so shuffle rows grew ~linearly with history.

Method, per sink × history factor:

1. Seed the sink's store with H history docs through the SAME store
   writer the sink uses (``replace_store_partition`` into the
   ``batch_id=-1`` seed partition — the batch→stream handoff every real
   batch probes).
2. Drive ONE identical 200-doc micro-batch through the real sink (file
   source, fresh checkpoint, availableNow) and diff the Spark UI's
   completed stages around it: per-stage shuffle-WRITE records (exchange
   volume) plus wall time.
3. Verdict per sink: total probe shuffle rows at 30x history must stay
   within ``1 + slack`` of the 1x number (wall time may grow mildly —
   the bucketed store SCAN is linear in history by design; the exchange
   must not be).

History is the sf0.1 documents table inflated by key-offset copies with
per-copy alphabet-rotated text (the shuffle_probe recipe: structure
preserved, content distinct, no synthetic exact-dup cliques).

Factor caveat: the alphabet-rotation salt has period 26, so copies i and
i+26 are IDENTICAL rotations — factors above 26 plant extra genuine
near-dup mass whose candidate pairs legitimately grow the pair-aggregate
exchange (measured: winnow 7484 -> 10762 rows at x30, exactly flat 7484
at x26). Keep factors <= 26 to measure the PLAN, not the planted data.

Usage: python tools/store_probe.py [factors_csv] [sinks_csv]
Defaults: 1,10,26 and near_dedup,rewrite,winnow.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from social_media_sentiment_analysis_spark.operators.dedup import (  # noqa: E402
    band_keys, chunk_rows, minhash_signatures,
)
from social_media_sentiment_analysis_spark.queries.selection import (  # noqa: E402
    winnowing_window_minima,
)
from social_media_sentiment_analysis_spark.session import get_spark  # noqa: E402
from social_media_sentiment_analysis_spark.sources.batch import load_table  # noqa: E402
from social_media_sentiment_analysis_spark.sources.layout import (  # noqa: E402
    replace_store_partition,
)
from social_media_sentiment_analysis_spark.operators.similarity import (  # noqa: E402
    hyperplane_bucket,
)
from social_media_sentiment_analysis_spark.functions.vectors import (  # noqa: E402
    l2_norm,
)
from social_media_sentiment_analysis_spark.streaming.sinks import (  # noqa: E402
    embedding_dedup_multiband_sink, near_dedup_sink, rewrite_dedup_sink,
    winnow_containment_sink,
)

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/store_probe"
PROBE_DOCS = 200
SLACK = 0.15     # probe shuffle rows at 30x may exceed 1x by at most 15%


def history_docs(spark, factor: int):
    df = load_table(spark, SRC, "documents").select("doc_id", "text")
    if factor == 1:
        return df
    off = df.agg(F.max("doc_id")).first()[0] + 1
    alpha = string.ascii_lowercase
    copies = []
    for i in range(factor):
        c = df.withColumn("doc_id", F.col("doc_id") + F.lit(off * i))
        rot = alpha[i % 26:] + alpha[:i % 26]
        c = c.withColumn("text", F.translate(
            F.col("text"), alpha + alpha.upper(), rot + rot.upper()))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def seed_near_dedup(spark, hist, root: str) -> None:
    keys = band_keys(minhash_signatures(hist, "text", "doc_id"), "doc_id")
    replace_store_partition(spark, keys, f"{root}/bands", -1,
                            ["band", "band_hash"])


def seed_rewrite(spark, hist, root: str) -> None:
    fps = (chunk_rows(hist, "text", "doc_id", 6)
           .select(F.md5("txt").alias("h")).distinct())
    replace_store_partition(spark, fps, f"{root}/chunks", -1, "h")


def seed_winnow(spark, hist, root: str) -> None:
    w_doc = Window.partitionBy("doc_id")
    fps = (winnowing_window_minima(hist, "text", "doc_id", k=4, w=4)
           .select("doc_id", "fp").distinct()
           .withColumn("n_fps", F.count(F.lit(1)).over(w_doc))
           .localCheckpoint())
    replace_store_partition(spark, fps, f"{root}/fps", -1, "fp")
    replace_store_partition(
        spark, fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs")),
        f"{root}/fp_stats", -1, "fp")


def history_vecs(spark, factor: int):
    """Key-offset vector copies, each copy's components ROTATED by i
    positions (norm-preserving, direction-scrambling — the vector analog
    of the alphabet rotation: no planted exact dups, period 64 > the
    probe's max factor)."""
    df = load_table(spark, SRC, "embeddings").select("vec_id", "embedding")
    if factor == 1:
        return df
    off = df.agg(F.max("vec_id")).first()[0] + 1
    copies = []
    for i in range(factor):
        c = df.withColumn("vec_id", F.col("vec_id") + F.lit(off * i))
        if i % 64:
            rot = i % 64
            c = c.withColumn("embedding", F.concat(
                F.slice("embedding", rot + 1, 64 - rot),
                F.slice("embedding", 1, rot)))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def seed_multiband(spark, hist, root: str) -> None:
    """Seed both multiband stores through the sink's own layout: the
    (id, band, val) banded index bucketed by (band, val) and the
    (id, vec, norm) store bucketed by id."""
    base = hist.select(
        "vec_id", "embedding",
        l2_norm(F.col("embedding")).alias("__nrm")).localCheckpoint()
    bv = F.explode(F.array(*[
        F.struct(F.lit(j).alias("band"),
                 hyperplane_bucket(F.col("embedding"), 64, 2,
                                   plane_offset=j * 2).alias("val"))
        for j in range(8)])).alias("bv")
    bands = base.select("vec_id", bv).select("vec_id", "bv.band", "bv.val")
    replace_store_partition(spark, bands, f"{root}/bands", -1,
                            ["band", "val"])
    replace_store_partition(spark, base, f"{root}/vectors", -1, "vec_id")


def multiband_build(stream, root, ckpt):
    return embedding_dedup_multiband_sink(
        stream, root, ckpt, dim=64, bands=8, band_bits=2, threshold=0.35)


# name -> (probe kind, seed, build, expectation). "flat": probe shuffle
# rows must not grow with history (the bucketed-store contract).
# "linear": the sink's cross-band pair dedupe shuffles the CANDIDATE
# volume, which grows ~linearly with history at fixed r BY DESIGN
# (OR-of-bands economics — see embedding_dedup_multiband_sink); the
# probe instead verifies the growth MATCHES the linear model (consistent
# incremental slope), i.e. no superlinear plan defect hides behind the
# documented candidate growth.
SINKS = {
    "near_dedup": ("docs", seed_near_dedup, near_dedup_sink, "flat"),
    "rewrite": ("docs", seed_rewrite, rewrite_dedup_sink, "flat"),
    "winnow": ("docs", seed_winnow, winnow_containment_sink, "flat"),
    "multiband": ("vecs", seed_multiband, multiband_build, "linear"),
}


def completed_stages(ui: str, app_id: str) -> dict:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def main() -> int:
    factors = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                else "1,10,26").split(",")]
    names = (sys.argv[2] if len(sys.argv) > 2
             else "near_dedup,rewrite,winnow").split(",")
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark("store-probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "5000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # one fixed probe batch per kind: 200 brand-new rows (ids far above
    # any history copy)
    probe = (load_table(spark, SRC, "documents")
             .select("doc_id", "text").orderBy("doc_id")
             .limit(PROBE_DOCS)
             .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
    probe_dir = f"{BASE}/probe_in"
    os.makedirs(probe_dir, exist_ok=True)
    with open(f"{probe_dir}/batch.jsonl", "w") as f:
        for r in probe.collect():
            f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
    vprobe = (load_table(spark, SRC, "embeddings")
              .select("vec_id", "embedding").orderBy("vec_id")
              .limit(PROBE_DOCS)
              .withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000)))
    vprobe_dir = f"{BASE}/vprobe_in"
    os.makedirs(vprobe_dir, exist_ok=True)
    with open(f"{vprobe_dir}/batch.jsonl", "w") as f:
        for r in vprobe.collect():
            f.write(json.dumps({"vec_id": r.vec_id,
                                "embedding": [float(x)
                                              for x in r.embedding]}) + "\n")

    report: dict[str, dict] = {}
    for name in names:
        kind, seed, build, _expect = SINKS[name]
        report[name] = {}
        for factor in factors:
            root = f"{BASE}/{name}/x{factor}"
            maker = history_docs if kind == "docs" else history_vecs
            hist = maker(spark, factor).localCheckpoint()
            n_hist = hist.count()
            seed(spark, hist, root)
            before = set(completed_stages(ui, app_id))
            if kind == "docs":
                stream = (spark.readStream
                          .schema("doc_id long, text string")
                          .json(probe_dir))
            else:
                stream = (spark.readStream
                          .schema("vec_id long, embedding array<float>")
                          .json(vprobe_dir))
            t0 = time.perf_counter()
            q = (build(stream, root, f"{root}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            wall = round(time.perf_counter() - t0, 2)
            after = completed_stages(ui, app_id)
            new = [after[k] for k in set(after) - before]
            shuffle_rows = sum(s.get("shuffleWriteRecords", 0) for s in new)
            input_rows = sum(s.get("inputRecords", 0) for s in new)
            report[name][f"x{factor}"] = {
                "history_docs": n_hist,
                "probe_wall_sec": wall,
                "probe_shuffle_rows": shuffle_rows,
                "probe_input_rows": input_rows,
                "stages": len(new),
            }
            print(f"{name} x{factor}: hist={n_hist} wall={wall}s "
                  f"shuffle_rows={shuffle_rows} input_rows={input_rows}",
                  file=sys.stderr, flush=True)

    verdicts = {}
    ok = True
    for name in names:
        expect = SINKS[name][3]
        rows = [report[name][f"x{f}"]["probe_shuffle_rows"] for f in factors]
        hists = [report[name][f"x{f}"]["history_docs"] for f in factors]
        if expect == "flat":
            flat = all(r <= rows[0] * (1 + SLACK) for r in rows)
            verdicts[name] = "FLAT" if flat else "GROWS"
            ok = ok and flat
        else:
            # linear model check: incremental candidate rows per history
            # row must be CONSISTENT across growth steps (superlinear
            # plan defects show up as a rising slope; the documented
            # candidate growth itself is linear in history)
            slopes = [(rows[i] - rows[0]) / max(1, hists[i] - hists[0])
                      for i in range(1, len(factors))]
            lin = (len(slopes) < 2
                   or max(slopes) <= min(slopes) * 1.3)
            verdicts[name] = ("LINEAR_AS_MODELED" if lin
                              else "SUPERLINEAR")
            ok = ok and lin
    print(json.dumps({"report": report, "verdicts": verdicts,
                      "slack": SLACK}, indent=2, sort_keys=True))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
