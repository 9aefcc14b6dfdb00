"""Per-stage shuffle-row probe at 1x/10x/30x documents (VERDICT r4 #6).

The 10x wall-clock probes showed super-linear-ish growth for the three
corpus-explode queries (bigram_logprob, char_entropy, dedup_spans). Wall
clock conflates compute with shuffle; the scale-limiting quantity is ROWS
SHUFFLED PER STAGE — if a stage's shuffle grows faster than input rows,
the partial-agg/blocking design is broken and a 1000-executor run hits a
wall the local box hides. This probe measures it directly:

- inflates the sf0.1 documents table in place by key-offset copies
  (1x / 10x / 30x — ~5k / 50k / 150k docs);
- runs each query against each copy in ONE session with the Spark UI's
  REST API enabled, diffing the completed-stage set around each run;
- reports per-stage shuffle WRITE records (the exchange volume), input
  records, and the per-query total.

Pass/fail summary at the end: for each query and each 1x->10x->30x step,
total shuffle rows must grow no faster than input rows (ratio of growth
factors <= 1 + slack).

Round 6 (VERDICT r5 #4): the probe generalizes beyond documents-only
queries — each query declares its fact table(s) in TABLES_PER_QUERY
(default: documents) and every listed table is inflated by key-offset
copies (orders offsets o_orderkey AND o_custkey so customer cardinality
scales with order volume, the shape RFM actually faces at 100 TB).

Usage: python tools/shuffle_probe.py [factors_csv] [queries_csv]
Defaults: 1,10,30 and bigram_logprob,char_entropy,dedup_spans.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.queries.registry import QUERIES
from social_media_sentiment_analysis_spark.session import get_spark
from social_media_sentiment_analysis_spark.sources.batch import load_table

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/shuffle_probe"


# Fact table(s) each probed query scales with; every listed table gets
# key-offset copies. Queries not listed default to ("documents",).
TABLES_PER_QUERY = {
    "rfm_segments": ("orders",),
}

# id columns to offset per table, so copied rows are distinct entities
# (offsetting o_custkey too makes the CUSTOMER population scale with the
# order volume — the cardinality RFM's quintile ranks actually face)
ID_COLS = {
    "documents": ("doc_id",),
    "orders": ("o_orderkey", "o_custkey"),
}


def inflate_table(spark, factor: int, out_dir: str, table: str) -> int:
    """Key-offset copies; document TEXT is additionally salted per copy
    (alphabet rotated by copy-index — length/shingle structure preserved,
    content distinct). Without the salt every doc gains factor-1 exact
    twins, and any PAIRWISE query (containment, dup clustering) goes
    quadratic by test-data construction — measuring the synthetic
    copy-cliques, not the plan. Copies i and i+26 do collide at 30x,
    leaving a small real-duplicate mass, which is the realistic shape."""
    import string

    df = load_table(spark, SRC, table)
    if factor > 1:
        offs = {c: df.agg(F.max(c)).first()[0] + 1 for c in ID_COLS[table]}
        alpha = string.ascii_lowercase
        copies = []
        for i in range(factor):
            c = df
            for col, off in offs.items():
                c = c.withColumn(col, F.col(col) + F.lit(off * i))
            if table == "documents":
                rot = alpha[i % 26:] + alpha[:i % 26]
                c = c.withColumn(
                    "text", F.translate(
                        F.col("text"), alpha + alpha.upper(),
                        rot + rot.upper()))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
    else:
        out = df
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    return out.count()


def completed_stages(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def main() -> None:
    factors = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                else "1,10,30").split(",")]
    names = (sys.argv[2] if len(sys.argv) > 2
             else "bigram_logprob,char_entropy,dedup_spans").split(",")
    spark = get_spark("shuffle-probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "5000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    needed = sorted({t for n in names
                     for t in TABLES_PER_QUERY.get(n, ("documents",))})
    dirs: dict[int, tuple[str, dict[str, int]]] = {}
    for f in factors:
        d = f"{BASE}/x{f}"
        rows = {t: inflate_table(spark, f, d, t) for t in needed}
        dirs[f] = (d, rows)
        print(f"inflated x{f}: {rows}", file=sys.stderr)

    report: dict[str, dict] = {}
    for name in names:
        report[name] = {}
        q_tables = TABLES_PER_QUERY.get(name, ("documents",))
        for f in factors:
            d, all_rows = dirs[f]
            in_rows = sum(all_rows[t] for t in q_tables)
            before = set(completed_stages(ui, app_id))
            QUERIES[name].builder(spark, d) \
                .write.format("noop").mode("overwrite").save()
            after = completed_stages(ui, app_id)
            new = [after[k] for k in set(after) - before]
            new.sort(key=lambda s: s["stageId"])
            stages = [{
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "shuffle_write_rows": s.get("shuffleWriteRecords", 0),
                "input_rows": s.get("inputRecords", 0),
            } for s in new]
            report[name][f"x{f}"] = {
                "input_docs": in_rows,
                "total_shuffle_rows": sum(
                    s["shuffle_write_rows"] for s in stages),
                "stages": stages,
            }
            print(f"{name} x{f}: shuffle_rows="
                  f"{report[name][f'x{f}']['total_shuffle_rows']}",
                  file=sys.stderr)
    spark.stop()

    verdicts = {}
    slack = 1.25  # partial-agg floors (alphabet x partitions) add a
    # constant; small constants look like growth at tiny sizes
    for name in names:
        rows = [(f, report[name][f"x{f}"]["input_docs"],
                 report[name][f"x{f}"]["total_shuffle_rows"])
                for f in factors]
        ok = True
        for (f0, in0, sh0), (f1, in1, sh1) in zip(rows, rows[1:]):
            if sh0 > 0 and (sh1 / sh0) > (in1 / in0) * slack:
                ok = False
        verdicts[name] = "sublinear-or-linear" if ok else "SUPERLINEAR"
    print(json.dumps({"report": report, "verdicts": verdicts}, indent=2))


if __name__ == "__main__":
    main()
