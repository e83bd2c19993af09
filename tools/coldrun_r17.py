"""One cold bench-style run of the named queries in a fresh session.

Replicates bench.py's methodology (same session factory, same warmup, same
noop sink, one cold timed run per query) for a targeted subset, so an
optimization's effect can be measured without the full 70-query sweep.
Prints one JSON line.
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
    spark = get_spark("coldrun_r17")
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
        if "setup_once" in QUERIES[name].tags:
            QUERIES[name].builder(spark, sf_dir)
        df = QUERIES[name].builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
