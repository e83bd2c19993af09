"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side materialization cost). The headline set covers the reference-parity
marts plus the extension operators that are sub-quadratic at sf0.1; the
all-pairs fuzzy-dedup paths are excluded (the synthetic corpus is ~50%
self-similar at jaccard 0.6, which makes pair output size, not engine speed,
the bottleneck — they're correctness-gated instead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_ecommerce_data_spark.plans.queries import QUERIES
from etl_ecommerce_data_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "daily_sales",
    "customer_metrics",
    "product_performance",
    "supplier_performance",
    "order_status_delivery",
    "nation_revenue",
    "region_supplier_volume",
    "top_parts_per_brand",
    "churned_customers",
    "events_by_type_day",
    "events_tumbling_5min",
    "asof_events_orders",
    "range_join_view_purchase",
    "nation_daily_revenue_ma",
    "clean_lineitem",
    "dedup_exact_docs",
    "text_stats",
    "text_quality",
    "doc_fingerprints",
    "similarity_topk",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    df = QUERIES[name].builder(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("bench")
    # Warm the JVM/codegen path once so per-query numbers measure the engine,
    # not first-call class loading.
    QUERIES["pricing_summary"].builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_one(spark, name, sf_dir), 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
