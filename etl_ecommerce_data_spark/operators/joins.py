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
- ``range_join`` — interval/band join (right_time within [left_time+lo,
  left_time+hi]) via time bucketing: the naive formulation is a non-equi join
  Catalyst can only plan as BroadcastNestedLoop/cartesian-per-key; bucketing
  turns it into an equi-join on (keys, bucket) with a cheap exact filter after.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    spread_identical: bool = False,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side with a random
    bucket, replicate the right side across all buckets, join on (key, salt).

    Use when one key's row count dwarfs the rest and AQE's skew splitting
    isn't available (e.g. broadcast not possible and the plan is shuffle-hash).
    Cost: right side is duplicated ``salt_buckets``× — keep buckets modest.

    The salt is ``pmod(xxhash64(hashable left columns), buckets)`` — bit-
    deterministic for a given row regardless of partitioning (a random salt
    would spread rows identically but make any debugging repro partition-
    dependent). Map-typed columns are excluded (xxhash64 rejects them).
    Salt choice never affects results (dropped post-join).

    LIMITATION: byte-identical left rows hash to one salt bucket, so a hot
    key whose payload is also identical (deduplicate it first — that's the
    real fix) does not spread. ``spread_identical=True`` mixes a per-row
    sequence id into the salt to force the spread, at the cost of the
    repro-determinism above (row numbering follows the input partitioning).
    """
    # The RIGHT side is replicated per salt bucket, so only joins preserved
    # from the LEFT are sound: each left row meets exactly one copy of each
    # matching right row (its own salt). Right/full-preserving joins would
    # emit every unmatched right key salt_buckets times (null-extended
    # duplicates) — silently wrong multisets, so they are rejected.
    # 'semi'/'anti' are Spark's own aliases of left_semi/left_anti (both
    # left-preserving), so they pass too (ADVICE r11)
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti",
    ):
        raise ValueError(
            f"salted_join supports left-preserving joins only (got "
            f"how={how!r}): the replicated right side would duplicate "
            "unmatched right rows once per salt bucket"
        )
    hashable = [
        f.name for f in left.schema.fields if not isinstance(f.dataType, T.MapType)
    ]
    salt_src = F.xxhash64(*[F.col(c) for c in hashable]) if hashable else F.lit(0)
    if spread_identical:
        # mix, don't add: raw `+` on two longs overflows (and throws under
        # Spark 4's default ANSI mode) once partition ids grow —
        # monotonically_increasing_id packs partitionId<<33, so at real
        # task counts the sum exceeds Long.MAX with high probability
        salt_src = F.xxhash64(salt_src, F.monotonically_increasing_id())
    salted_left = left.withColumn(
        "__salt", F.pmod(salt_src, F.lit(salt_buckets)).cast("int")
    )
    buckets = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_right = right.select("*", buckets)
    out = salted_left.join(salted_right, [on, "__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    on: str | Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Band join: pair rows where ``left_time + lower <= right_time <=
    left_time + upper`` (closed interval, seconds) and the equi-keys match.

    Scale strategy: a raw range predicate is non-equi, so Catalyst would plan a
    broadcast-nested-loop (or, with keys, a sort-merge join whose range filter
    runs post-join on the full per-key cross product). Instead both sides are
    bucketed by time with bucket width = interval length: the left row keeps
    its single bucket, the right row is exploded into the (at most 2) buckets
    its admissible left-times span, and the join becomes a plain shuffled
    equi-join on (keys..., bucket) — each matching pair meets in exactly one
    bucket, so no post-join dedup is needed, only the exact range filter.

    ``left_time``/``right_time`` must not collide (rename before a self-join).

    Only ``how='inner'`` is supported: the exact range predicate runs AFTER
    the bucketed equi-join, so null-extended rows of an outer join would fail
    it and silently degrade the result to inner. For a left-outer range join,
    range-join inner then left-join the pair counts back onto the left side
    (the pattern in plans/queries.py q_range_join_view_purchase).
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only; for outer semantics join "
            f"the inner result back onto the preserved side (got how={how!r})"
        )
    if lower_seconds > upper_seconds:
        # a reversed band would make the right-side bucket sequence
        # DESCENDING over the whole interval at microsecond granularity —
        # hundreds of millions of exploded elements per row — when the
        # correct answer is trivially empty; swapped bounds are a caller
        # bug worth a message, not an executor OOM
        raise ValueError(
            f"range_join band is reversed: lower_seconds ({lower_seconds}) "
            f"> upper_seconds ({upper_seconds})"
        )
    keys = [on] if isinstance(on, str) else list(on)
    w_us = max(int((upper_seconds - lower_seconds) * 1_000_000), 1)
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))
    l_b = left.withColumn("__bucket", F.floor(lt / F.lit(w_us)))
    # Right row at time t matches left times in [t-hi, t-lo] → that interval's
    # bucket ids (width == interval ⇒ it spans ≤ 2 buckets).
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((rt - F.lit(hi_us)) / F.lit(w_us)),
                F.floor((rt - F.lit(lo_us)) / F.lit(w_us)),
            )
        ),
    )
    joined = l_b.join(r_b, [*keys, "__bucket"], how)
    in_range = (rt >= lt + F.lit(lo_us)) & (rt <= lt + F.lit(hi_us))
    return joined.filter(in_range).drop("__bucket")


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

    NULL hygiene, matching SQL as-of semantics (``ON l.key = r.key AND
    r.t <= l.t``): right rows with a NULL key or NULL time are dropped —
    ``NULL = NULL`` never matches an equi-join, and a NULL time would sort
    FIRST under the window's ascending order, carrying its payload onto
    every left row as a phantom "earliest" match. Left rows always pass
    through (NULL-key/time left rows simply match nothing).
    """
    lcols = left.columns
    tiebreak = right_cols[0]
    right = right.filter(F.col(key).isNotNull() & F.col(right_time).isNotNull())
    # The whole matched right row travels as ONE struct: a single
    # last(ignorenulls) then picks an entire row, so a NULL in one right
    # column can't be papered over with a stale value from an older row, and
    # ties at equal right_time can't mix columns from different rows.
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(payload_t).alias("__payload"),
        *[F.col(c) for c in lcols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__tb"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal time (asof is inclusive);
    # among right rows at the same time the greatest tiebreak wins.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__asof", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__asof.{c}").alias(c) for c in right_cols],
    )
    if tolerance_expr:
        # Evaluated on the OUTPUT columns (left cols + matched right cols).
        out = out.filter(F.expr(tolerance_expr))
    return out
