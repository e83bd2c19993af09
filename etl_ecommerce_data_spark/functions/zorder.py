"""Z-order (Morton) interleaving for multi-dimensional data layout.

At 100 TB the cheapest predicate is the one that never reads the file:
parquet readers skip row groups / files whose min-max stats exclude the
filter. Sorting by ONE column gives tight stats on that column only;
sorting by the MORTON KEY of two columns gives reasonably tight stats on
BOTH, so filters on either dimension skip most files (the Z-curve maps
2-D locality onto 1-D sort order). This is the same layout idea behind
Delta/Iceberg `ZORDER BY`, expressed as a plain column so any writer can
use it: ``df.repartitionByRange(N, morton_key(x, y)).sortWithinPartitions
(morton_key(x, y)).write.parquet(...)``.

The key is pure integer bit arithmetic — identical in Spark and DuckDB —
so the computation itself is oracle-checkable (`morton_key_sql` emits the
same expression in SQL, generated from the same loop to stay in lockstep).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. Callers bound the inputs
    (e.g. ``col % (1 << bits)``); higher bits are ignored by construction."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + (F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
    return acc.cast("long")


def morton_key_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """The DuckDB twin of ``morton_key``, generated from the same loop."""
    terms = [
        f"((({x_expr} >> {i}) & 1) * {1 << (2 * i)})"
        f" + ((({y_expr} >> {i}) & 1) * {1 << (2 * i + 1)})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"
