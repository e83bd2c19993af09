"""One cold bench-style run of the named queries in a fresh session,
r18 methodology: builder() is timed TOO, and reported separately.

Replicates bench.py's r18 timing (same session factory, same warmup, same
noop sink) for a targeted subset, splitting each query's cost into
build_sec (plan construction + anything the build executes — under AQE a
lazy localCheckpoint materializes every upstream stage here) and
write_sec (the timed noop action). The split is the direct evidence for
the r17-ADVICE measurement bug: pre-r18 code shows large build_sec on the
checkpointed queries; r18 code should show build_sec ≈ plan-analysis time
only. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ecommerce_data_spark.plans.queries import QUERIES
from etl_ecommerce_data_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("coldrun_r18")
    QUERIES["pricing_summary"].builder(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(32).repartition(32).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"coldrun: {name}")
        if "setup_once" in QUERIES[name].tags:
            QUERIES[name].builder(spark, sf_dir)
        t0 = time.perf_counter()
        df = QUERIES[name].builder(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        timings[name] = {
            "build": round(t1 - t0, 3),
            "write": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
