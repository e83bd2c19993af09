"""Local mimic of the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle at the given sf dir,
compares row counts and order-insensitive value hashes (columns sorted by
name, rows sorted by all columns, values stringified). Exit code 1 on any
mismatch.

Usage: python tools/verify_local.py [--bare] [--first N] [sf_dir] [query ...]

--bare     use a PLAIN SparkSession (local[8], none of the engine's tuned
           configs) — the driver's own session shape; a query that only
           passes under the engine session would slip through without this
--first N  restrict to the first N REGISTERED queries (the driver records
           rows for the first ~50) — `--bare --first 50` at sf0.01 is a
           full end-to-end rehearsal of CORRECTNESS_r{N}
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from etl_ecommerce_data_spark.plans.queries import QUERIES  # noqa: E402
from etl_ecommerce_data_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df) -> str:
    import pandas as pd

    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def cell(v):
        import datetime
        import decimal

        import numpy as np

        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        if isinstance(v, (float, np.floating)):
            return repr(float(v))
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in pdf.itertuples(index=False, name=None))
    return "\n".join("|".join(r) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    bare = "--bare" in args
    if bare:
        args.remove("--bare")
    first = None
    if "--first" in args:
        i = args.index("--first")
        first = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    picked = args[1:] or list(QUERIES)
    if first is not None:
        picked = picked[:first]
    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in picked:
        qd = QUERIES[name]
        t0 = time.time()
        try:
            sdf = qd.builder(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if qd.oracle is None:
            print(f"ok*   {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ns, no = normalize(sdf), normalize(odf)
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
        elif ns != no:
            print(f"FAIL  {name}: value mismatch (rows={len(sdf)})")
            sl, ol = ns.splitlines(), no.splitlines()
            shown = 0
            for i, (a, b) in enumerate(zip(sl, ol)):
                if a != b:
                    print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
                    shown += 1
                    if shown >= 3:
                        break
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(sdf)} hash-match [{time.time()-t0:.1f}s]")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print(f"\nall {len(picked)} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
