"""Capture .explain("formatted") for headline queries into plans/r17/.

Usage:
    python tools/capture_plans_r17.py before [name ...]
    python tools/capture_plans_r17.py after  [name ...]

With no names, captures every bench.py HEADLINE query. Plans are built only
(never executed), so this is cheap and safe to run on a loaded machine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ecommerce_data_spark.plans.queries import QUERIES
from etl_ecommerce_data_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans_r17")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
