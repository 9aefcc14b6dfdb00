"""TPC-H-shape power run: execute all 22 adapted query shapes sequentially
(noop sink, warm JVM) and print one JSON line with per-query seconds.

Usage: python tools/tpch_power.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_sentiment_analysis_spark.queries.registry import QUERIES
from social_media_sentiment_analysis_spark.session import get_spark

# Q1..Q22 in order (COVERAGE.md "All 22 TPC-H query shapes")
TPCH_SHAPES = [
    "pricing_summary", "cheapest_parts", "shipping_priority",
    "late_orders_by_priority", "local_supplier_revenue",
    "forecast_revenue_change", "nation_trade_flows", "market_share",
    "nation_brand_profit", "returned_item_losses", "important_stock",
    "returnflag_priority_counts", "customer_order_distribution",
    "promo_revenue", "top_supplier", "parts_supplier_counts",
    "small_quantity_revenue", "big_orders", "brand_size_revenue",
    "excess_volume_suppliers", "sole_late_supplier",
    "wealthy_inactive_customers",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tpch-power")
    timings: dict[str, float] = {}
    for i, name in enumerate(TPCH_SHAPES, 1):
        QUERIES[name].builder(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()  # warm
        start = time.perf_counter()
        QUERIES[name].builder(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        timings[f"q{i}_{name}"] = round(time.perf_counter() - start, 3)
    print(json.dumps({
        "metric": "tpch_shapes_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
