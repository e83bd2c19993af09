"""Silver-zone cleaning operators.

The reference's entire cleaning repertoire (``to_silver.py:44-103``) as named,
composable ``DataFrame → DataFrame`` transforms: timestamp parsing, full-row
and by-key dedup, null fill/drop policies, string normalization, money casts
with positivity filters. Each preserves the reference's semantics (SURVEY §2.6,
§2.7) but adds what it lacked — a *deterministic* survivor rule for key dedup
(``dropDuplicates([k])`` at ``to_silver.py:60,84,91,101`` keeps an arbitrary
row; partition-order-dependent, so irreproducible at scale).

Scale notes: every operator here is pure DataFrame API — whole-stage-codegen'd
expressions, no Python row path. ``dedup_exact_rows``/``dedup_by_key`` are the
only shuffling ops (hash-partition on the dedup key); Catalyst plans partial
aggregation map-side first, so at 100 TB the shuffle carries only distinct
survivors per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_timestamps(df: DataFrame, columns: Sequence[str], fmt: str | None = None) -> DataFrame:
    """String→timestamp on each named column (to_silver.py:48-52 semantics:
    invalid strings become NULL). The reference ran Spark 3.x with ANSI off
    where ``to_timestamp`` NULLs malformed input; Spark 4 is ANSI-on and
    throws, so ``try_to_timestamp`` is the semantics-preserving expression."""
    for c in columns:
        df = df.withColumn(
            c,
            F.try_to_timestamp(F.col(c), F.lit(fmt)) if fmt else F.try_to_timestamp(F.col(c)),
        )
    return df


def dedup_exact_rows(df: DataFrame) -> DataFrame:
    """Full-row dedup (to_silver.py:53). Planned as a hash aggregate over all
    columns with map-side partial dedup — shuffle carries unique rows only."""
    return df.dropDuplicates()


def dedup_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
    keep: str = "first",
) -> DataFrame:
    """Key dedup with a deterministic survivor.

    The reference's ``dropDuplicates(["customer_id"])`` (to_silver.py:60) keeps
    whichever row a partition happens to deliver first. Here: if ``order_by``
    is given, survivors are chosen by ``row_number()`` over (keys, order_by,
    full-row tiebreak) — reproducible on any cluster at any parallelism,
    INCLUDING rows that tie on every order_by column (without the final
    full-row total order, such ties reintroduced the partition-order
    survivor this function exists to remove; same tiebreak device as
    ``sources/incremental.merge_dataframes``). With no ``order_by`` we fall
    back to Spark's native ``dropDuplicates`` (cheaper: no sort) — only
    valid for ``keep='first'``, since without an ordering "last" is
    meaningless and would silently degrade to an arbitrary survivor.
    """
    if keep not in ("first", "last"):
        raise ValueError("keep must be 'first' or 'last'")
    if not order_by:
        if keep == "last":
            raise ValueError(
                "keep='last' requires order_by: with no ordering the "
                "dropDuplicates fallback keeps an arbitrary row, not a last"
            )
        return df.dropDuplicates(list(keys))
    if "__rn" in df.columns:
        raise ValueError(
            "dedup_by_key reserves column name '__rn'; rename it in the "
            "input (it would be silently overwritten and dropped)"
        )
    cols = [F.col(c) for c in order_by]
    tiebreak = F.to_json(F.struct(*df.columns))
    if keep == "last":
        cols = [c.desc() for c in cols]
        cols.append(tiebreak.desc())
    else:
        cols.append(tiebreak.asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fill_nulls(df: DataFrame, fills: dict[str, object]) -> DataFrame:
    """Per-column null fill (to_silver.py:54,85,102). Same typing rule as
    ``df.na.fill``: a value is applied only to columns of a compatible type."""
    return df.na.fill(dict(fills)) if fills else df


def drop_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop rows with any NULL (to_silver.py:61), optionally on a subset."""
    return df.na.drop(subset=list(subset) if subset else None)


def normalize_strings(
    df: DataFrame,
    lower: Sequence[str] = (),
    upper: Sequence[str] = (),
    trim: Sequence[str] = (),
) -> DataFrame:
    """lower/upper/trim normalization (to_silver.py:62-63,92-93). Columns in
    both ``trim`` and a casing list are trimmed first, as the reference does."""
    for c in trim:
        df = df.withColumn(c, F.trim(F.col(c)))
    for c in lower:
        df = df.withColumn(c, F.lower(F.col(c)))
    for c in upper:
        df = df.withColumn(c, F.upper(F.col(c)))
    return df


def cast_money(df: DataFrame, columns: Sequence[str], precision: int = 10, scale: int = 2) -> DataFrame:
    """Decimal cast for money columns (to_silver.py:70-71 uses DECIMAL(10,2))."""
    for c in columns:
        df = df.withColumn(c, F.col(c).cast(f"decimal({precision},{scale})"))
    return df


def filter_positive(df: DataFrame, column: str) -> DataFrame:
    """``col > 0`` predicate (to_silver.py:72); pushed to the scan by Catalyst."""
    return df.filter(F.col(column) > 0)


def filter_non_negative(df: DataFrame, column: str) -> DataFrame:
    """``col >= 0`` predicate (to_silver.py:73)."""
    return df.filter(F.col(column) >= 0)


def translate_with_fallback(
    df: DataFrame,
    translation: DataFrame,
    key: str,
    translated_col: str,
    fallback_col: str,
    output_col: str | None = None,
    fill_value: str = "unknown",
) -> DataFrame:
    """Left-join a small translation dim and coalesce to the original value
    (to_silver.py:81-85: products ⟕ category_translation, coalesce, fill).

    The dim side is broadcast explicitly — at 100 TB the fact side never
    shuffles for this join.
    """
    out = output_col or translated_col
    joined = df.join(F.broadcast(translation), key, "left")
    joined = joined.withColumn(out, F.coalesce(F.col(translated_col), F.col(fallback_col)))
    return joined.na.fill({out: fill_value})
