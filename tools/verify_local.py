"""Local mimic of the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle at the given sf dir,
compares row counts and order-insensitive canonical forms (columns sorted by
name, rows sorted by all columns, values stringified — the SHARED
canonicalization in etl_ecommerce_data_spark/testing.py, so this gate and
the pytest oracle-parity harness can never disagree about equality). Exit
code 1 on any mismatch.

Usage: python tools/verify_local.py [--bare] [--first N] [sf_dir] [query ...]

--bare     use a PLAIN SparkSession (local[8], none of the engine's tuned
           configs) — the driver's own session shape; a query that only
           passes under the engine session would slip through without this
--first N  restrict to the first N REGISTERED queries (the driver records
           rows for the first ~50) — `--bare --first 50` at sf0.01 is a
           full end-to-end rehearsal of CORRECTNESS_r{N}. Mutually
           exclusive with explicit query names (silently dropping the
           names would misreport what was verified).
"""

from __future__ import annotations

import os
import sys
import time

# derive the repo root from this file (a hardcoded absolute path would
# import a stale copy of the package when the repo is cloned elsewhere —
# verifying the wrong code while appearing green)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ecommerce_data_spark.plans.queries import QUERIES  # noqa: E402
from etl_ecommerce_data_spark.session import get_spark  # noqa: E402
from etl_ecommerce_data_spark.testing import (  # noqa: E402
    diff_rows,
    duckdb_connection,
    normalize,
)


def _diff_rows(s: list[tuple], o: list[tuple], limit: int = 3) -> list[str]:
    """Render testing.diff_rows (the one shared diff implementation —
    set-difference with a duplicate-multiplicity Counter fallback) as
    indented report lines."""
    only_s, only_o = diff_rows(s, o, limit)
    out = [f"    spark only : {r}" for r in only_s]
    out += [f"    oracle only: {r}" for r in only_o]
    return out


def main() -> int:
    args = sys.argv[1:]
    bare = "--bare" in args
    if bare:
        args.remove("--bare")
    first = None
    if "--first" in args:
        i = args.index("--first")
        try:
            first = int(args[i + 1])
        except (IndexError, ValueError):
            print("error: --first needs an integer value", file=sys.stderr)
            return 2
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    named = args[1:]
    unknown = sorted(set(named) - set(QUERIES))
    if unknown:
        # fail BEFORE the Spark session spins up — a typo'd name crashing
        # with KeyError after startup wastes the whole launch
        print(f"error: unknown query name(s): {unknown}", file=sys.stderr)
        return 2
    if first is not None and named:
        print(
            "error: --first and explicit query names are mutually exclusive "
            "(the slice would silently drop names)",
            file=sys.stderr,
        )
        return 2
    picked = named or list(QUERIES)
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
    con = duckdb_connection(sf_dir)
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
        if len(sdf) != len(odf):
            # before any normalization: the stringify+sort pass is wasted
            # work when cardinality already differs
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        ns, no = normalize(sdf), normalize(odf)
        if ns != no:
            print(f"FAIL  {name}: value mismatch (rows={len(sdf)})")
            for line in _diff_rows(ns, no):
                print(line)
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
