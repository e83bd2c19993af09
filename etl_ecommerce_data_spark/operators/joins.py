"""Join operators: broadcast/salted equi-joins and a scalable as-of join.

The reference's seven joins (SURVEY §2.3) are all single-key equi-joins via the
USING-column form, with no strategy hints and no skew handling. Here:

- ``broadcast_join`` — explicit broadcast of a dim side; at 100 TB this is the
  difference between a map-side join and a full fact-table shuffle.
- ``salted_join`` — skew mitigation when one key dominates (AQE's skew-join
  handles sort-merge skew; salting also covers aggregations and older plans).
- ``asof_join`` — an operator Spark lacks natively, built as a composition of
  union + window (single shuffle + sort, no per-row Python): for each left row,
  the most recent right row with ``right_time <= left_time`` per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Equi-join with the dim side broadcast (USING-form → key deduped)."""
    keys = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), keys, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side with a random
    bucket, replicate the right side across all buckets, join on (key, salt).

    Use when one key's row count dwarfs the rest and AQE's skew splitting
    isn't available (e.g. broadcast not possible and the plan is shuffle-hash).
    Cost: right side is duplicated ``salt_buckets``× — keep buckets modest.
    """
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    buckets = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_right = right.select("*", buckets)
    out = salted_left.join(salted_right, [on, "__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    tolerance_expr: str | None = None,
) -> DataFrame:
    """As-of (backward) join, Spark-first.

    For each left row, attach the right row with the greatest
    ``right_time <= left_time`` for the same ``key`` (time ties broken by the
    greatest ``right_cols[0]`` — deterministic).

    Implementation: tag and union both inputs on a common schema, then a single
    ``Window.partitionBy(key).orderBy(time, is_left, tiebreak)`` with
    ``last_value(..., ignoreNulls)`` carries the latest right-side values
    forward onto each left row. One shuffle + one sort total, fully
    distributed — the naive alternative (range join) is O(n·m) per key and the
    per-group ``merge_asof`` Pandas path ships data through Python.

    ``right_cols`` must not collide with left column names.
    """
    lcols = left.columns
    tiebreak = right_cols[0]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal time (asof is inclusive);
    # among right rows at the same time the greatest tiebreak wins.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    if tolerance_expr:
        carried = carried.filter(F.expr(tolerance_expr))
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__asof_{c}").alias(c) for c in right_cols],
    )
