"""Profile ONE registry query: per-job wall time + description, stage task
totals, and the builder/action split — the measure-first tool for the
optimization rounds (guide §1).

Usage: python tools/profile_query.py <query> [--sf DIR] [--passes N]

Runs the query `passes` times in one warmed session (min time wins, like
bench.py), with an event log enabled; then parses the event log into a
per-job table: wall ms, #tasks, executor-run ms, shuffle read/write bytes,
and the job group/description when present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_sentiment_analysis_spark.queries.registry import QUERIES  # noqa: E402
from social_media_sentiment_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="proflog_")
    spark = get_spark(f"profile-{args.query}", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for p in range(args.passes):
        t0 = time.perf_counter()
        df = QUERIES[args.query].builder(spark, args.sf)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"pass{p}:action")
        df.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        t2 = time.perf_counter()
        print(f"pass {p}: builder {t1-t0:.3f}s  action {t2-t1:.3f}s  "
              f"total {t2-t0:.3f}s")
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----------------------------------------
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):          # Spark 4 rolling event log layout
        d = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        parts = sorted(f for f in os.listdir(d) if f.startswith("events_"))
        lines: list[str] = []
        for p in parts:
            fp = os.path.join(d, p)
            if p.endswith(".zstd"):
                import subprocess
                text = subprocess.run(
                    ["zstd", "-dc", fp], capture_output=True,
                    check=True).stdout.decode()
                lines.extend(text.splitlines())
            else:
                with open(fp) as f:
                    lines.extend(f)
    else:
        with open(path) as f:
            lines = list(f)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:90],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0)
                           - si.get("Submission Time", 0)),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["run_ms"] = st.get("run_ms", 0) + m.get("Executor Run Time", 0)
                st["sr"] = st.get("sr", 0) + (
                    (m.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
                    + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0))
                st["sw"] = st.get("sw", 0) + (
                    (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0))

    print(f"\n{'job':>4} {'wall_ms':>8} {'desc'}")
    total = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        wall = j.get("end", j["start"]) - j["start"]
        total += wall
        print(f"{jid:>4} {wall:>8} {j['desc']}")
        for sid in sorted(j["stages"]):
            st = stages.get(sid)
            if st and st.get("ms") is not None and "name" in st:
                print(f"       stage {sid}: {st.get('ms', 0)} ms, "
                      f"{st.get('tasks', '?')} tasks, run {st.get('run_ms', 0)} ms, "
                      f"sr {st.get('sr', 0)} sw {st.get('sw', 0)}  {st['name']}")
    print(f"sum of job walls: {total} ms   (gaps = driver-side time)")
    print(f"event log: {path}")


if __name__ == "__main__":
    main()
