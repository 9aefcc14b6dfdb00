"""Isolated A/B decomposition of asof_latest_order (VERDICT r4 #2: 1.49x
min-of-passes regression on untouched code — attribute or recover it).

Runs in a FRESH tuned session with nothing co-running, N passes per stage
(min + all passes reported), attributing wall time to:

  scan_events    events load + project (noop write)
  preagg_orders  orders groupBy(custkey, orderdate) incl. max_by (noop)
  union_sort     the tagged union through the per-key window sort WITHOUT
                 the forward-fill projection (materializes the one
                 sort-exchange the as-of plan pays)
  total          q_asof_latest_order end to end (noop write)

plus `total_vanilla` on a second, VANILLA local[8] session (the judge's
bench environment differs from the tuned factory in AQE/partition conf —
if the regression only reproduces on one of the two, that's the
attribution).

Usage: python tools/asof_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.queries.temporal import (
    q_asof_latest_order,
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


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("asof-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    results: dict[str, list[float]] = {}

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    results["scan_events"] = timed(lambda: noop(events), passes)

    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_order_key"),
             F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    results["preagg_orders"] = timed(lambda: noop(orders), passes)

    # the sort-exchange alone: tagged union, per-key window sort, row_number
    # (forces the same partition+sort the as-of window needs, no fill logic)
    l2 = events.select(F.col("user_id").alias("__k"),
                       F.col("ts").alias("__ts"), F.lit(1).alias("__tag"))
    r2 = orders.select(F.col("user_id").alias("__k"),
                       F.col("o_orderdate").alias("__ts"),
                       F.lit(0).alias("__tag"))
    w = Window.partitionBy("__k").orderBy("__ts", "__tag")
    union_sorted = l2.unionByName(r2).withColumn(
        "__rn", F.row_number().over(w))
    results["union_sort"] = timed(lambda: noop(union_sorted), passes)

    results["total"] = timed(
        lambda: noop(q_asof_latest_order(spark, sf_dir)), passes)
    spark.stop()

    vanilla = (SparkSession.builder.master("local[8]")
               .appName("asof-ab-vanilla")
               .config("spark.sql.shuffle.partitions", "32").getOrCreate())
    vanilla.sparkContext.setLogLevel("ERROR")
    vanilla.range(1_000_000).selectExpr("sum(id)").collect()
    results["total_vanilla"] = timed(
        lambda: noop(q_asof_latest_order(vanilla, sf_dir)), passes)
    vanilla.stop()

    print(json.dumps({
        "sf_dir": sf_dir, "passes": passes,
        "min": {k: min(v) for k, v in results.items()},
        "all": results,
    }, indent=2))


if __name__ == "__main__":
    main()
