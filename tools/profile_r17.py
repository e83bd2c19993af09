"""Per-query stage-level profiler for the round-17 optimization pass.

Runs the named headline queries exactly like bench.py (same session config,
same noop sink) with the Spark UI enabled, and after each query pulls the
completed-stage metrics from the UI REST API so the time can be attributed:
executor run time vs shuffle read/write vs task count vs GC, per stage.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_r17.py \
        dedup_minhash_docs dedup_cross_corpus

Each query runs twice (cold, warm) so one-time codegen/compile cost is
visible as the cold-warm delta. Output is one JSON line per query run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ecommerce_data_spark.plans.queries import QUERIES
from etl_ecommerce_data_spark.session import get_spark


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark("profile_r17")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warm like bench.py
    QUERIES["pricing_summary"].builder(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(32).repartition(32).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    for name in names:
        for attempt in ("cold", "warm"):
            seen = {s["stageId"] for s in _rest(f"{base}/stages")}
            df = QUERIES[name].builder(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            stages = [
                s
                for s in _rest(f"{base}/stages?status=complete")
                if s["stageId"] not in seen
            ]
            stages.sort(key=lambda s: -s.get("executorRunTime", 0))
            tot_run = sum(s.get("executorRunTime", 0) for s in stages)
            tot_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
            tot_sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
            tot_sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
            top = [
                {
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:60],
                    "runMs": s.get("executorRunTime", 0),
                    "cpuMs": s.get("executorCpuTime", 0) // 1_000_000,
                    "tasks": s.get("numCompleteTasks", 0),
                    "inRec": s.get("inputRecords", 0),
                    "outRec": s.get("outputRecords", 0),
                    "shWrMB": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "shRdMB": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "shWrRec": s.get("shuffleWriteRecords", 0),
                }
                for s in stages[:12]
            ]
            print(
                json.dumps(
                    {
                        "query": name,
                        "attempt": attempt,
                        "wall_s": round(wall, 3),
                        "n_stages": len(stages),
                        "n_tasks": tot_tasks,
                        "executor_run_s": round(tot_run / 1000, 2),
                        "shuffle_write_MB": round(tot_sw / 1e6, 1),
                        "shuffle_read_MB": round(tot_sr / 1e6, 1),
                        "top_stages": top,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
