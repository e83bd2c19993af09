"""Data validation stage — the real version of the reference's echo stub.

The reference's "validation" is ``BashOperator(bash_command='echo "Validating
data in Gold layer"')`` (``dags/dag.py:73-77``) — it validates nothing. And
its scripts print-and-continue on error (``to_silver.py:105-106``), so a
half-written zone still "succeeds". This module is the fail-fast replacement:
declarative expectations evaluated in ONE aggregation pass per table (no
per-check jobs), raising ``ValidationError`` with every violation listed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ValidationError(Exception):
    """Raised when any expectation fails; carries all violations."""

    def __init__(self, violations: list[str]):
        self.violations = violations
        super().__init__("; ".join(violations))


@dataclass(frozen=True)
class Expectations:
    """Declarative per-table contract."""

    min_rows: int = 1
    schema: T.StructType | None = None
    not_null: tuple[str, ...] = ()
    unique_key: tuple[str, ...] = ()
    max_null_rate: dict[str, float] | None = None  # column -> allowed fraction
    positive: tuple[str, ...] = ()


def _schema_violation(df: DataFrame, exp: Expectations, table: str) -> list[str]:
    if exp.schema is not None and df.schema != exp.schema:
        return [
            f"{table}: schema mismatch: got {df.schema.simpleString()}, "
            f"want {exp.schema.simpleString()}"
        ]
    return []


def _metric_aggs(exp: Expectations) -> list:
    """The expectation metrics as plain aggregate expressions (shared by the
    standalone agg job and the write-observed variant). Every ``sum`` is
    coalesced to 0: Spark's sum over ZERO rows (or an all-NULL input) is
    NULL, and an un-coalesced metric would crash the comparison with a
    TypeError instead of reporting the actual violation (e.g. an empty
    table failing min_rows). ``unique_key``'s count_distinct is NOT here
    (not a legal Observation metric — it stays a dedicated aggregation
    where requested), but its null-key counter IS: a plain sum, so it
    rides the write observation for free.

    ``positive`` counts strictly ``<= 0`` values and IGNORES NULLs (the
    comparison is NULL for them): "positive" means "positive when
    present" — list the column in ``not_null`` too to forbid absence."""

    def _sum(col):
        return F.coalesce(F.sum(col.cast("long")), F.lit(0))

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in exp.not_null:
        aggs.append(_sum(F.col(c).isNull()).alias(f"__null_{c}"))
    for c in exp.max_null_rate or {}:
        if c not in exp.not_null:
            aggs.append(_sum(F.col(c).isNull()).alias(f"__null_{c}"))
    for c in exp.positive:
        aggs.append(_sum(F.col(c) <= 0).alias(f"__nonpos_{c}"))
    if exp.unique_key:
        any_null = None
        for k in exp.unique_key:
            cond = F.col(k).isNull()
            any_null = cond if any_null is None else (any_null | cond)
        aggs.append(_sum(any_null).alias("__nullkey"))
    return aggs


def _metric_violations(row: dict, exp: Expectations, table: str) -> list[str]:
    violations: list[str] = []
    n = row["__n"]
    if n < exp.min_rows:
        violations.append(f"{table}: rows {n} < min_rows {exp.min_rows}")
    for c in exp.not_null:
        if row[f"__null_{c}"] > 0:
            violations.append(f"{table}: column {c} has {row[f'__null_{c}']} NULLs")
    for c, rate in (exp.max_null_rate or {}).items():
        nulls = row[f"__null_{c}"]
        if n > 0 and nulls / n > rate:
            violations.append(f"{table}: null rate of {c} = {nulls / n:.4f} > {rate}")
    for c in exp.positive:
        if row[f"__nonpos_{c}"] > 0:
            violations.append(f"{table}: column {c} has {row[f'__nonpos_{c}']} non-positive values")
    return violations


def _unique_key_violations(
    row: dict, distinct: int, exp: Expectations, table: str
) -> list[str]:
    """Diagnose the unique-key check in actionable terms: count_distinct
    EXCLUDES tuples with a NULL component, so comparing it against the raw
    row count would report null-keyed rows as 'duplicates' and send the
    operator chasing the wrong defect. NULL keys and genuine duplicates
    are reported as separate violations."""
    violations: list[str] = []
    nullkey = row["__nullkey"]
    if nullkey > 0:
        violations.append(
            f"{table}: key {exp.unique_key} has {nullkey} row(s) with NULL "
            "key component(s)"
        )
    non_null = row["__n"] - nullkey
    if distinct != non_null:
        violations.append(
            f"{table}: key {exp.unique_key} not unique: {distinct} distinct "
            f"of {non_null} non-null-keyed rows"
        )
    return violations


def validate(df: DataFrame, exp: Expectations, table: str = "<table>") -> None:
    """Evaluate all expectations in a single aggregation job; raise on any
    violation. Schema check is plan-only (no job)."""
    violations = _schema_violation(df, exp, table)

    aggs = _metric_aggs(exp)
    if exp.unique_key:
        aggs.append(F.count_distinct(*[F.col(k) for k in exp.unique_key]).alias("__distinct_key"))

    row = df.agg(*aggs).collect()[0].asDict()
    violations += _metric_violations(row, exp, table)
    if exp.unique_key:
        violations += _unique_key_violations(
            row, row["__distinct_key"], exp, table
        )

    if violations:
        raise ValidationError(violations)


def validate_on_write(
    df, exp: Expectations, write_fn, table: str = "<table>", read_back=None
) -> None:
    """Validate WHILE writing: the expectation metrics ride the write job as
    Observation metrics, so at 100 TB validation costs zero extra scans —
    ``validate`` after a write re-reads the table (one extra full pass per
    zone). ``write_fn`` receives the observed DataFrame and must execute one
    action (the write). ``unique_key`` is the one check the Observation API
    cannot express (count_distinct is not a valid observed metric); it runs
    as one follow-up aggregation job only when declared.

    ``read_back`` (zero-arg callable returning a DataFrame over the
    JUST-WRITTEN output) is where that follow-up should run: without it the
    distinct count re-executes ``df``'s ENTIRE upstream plan — a second
    full gold build at scale, and a plan whose non-determinism (dedup
    ties, source files changing between the two jobs) can disagree with
    the write the observation measured, yielding a spurious — or masked —
    uniqueness failure. Callers that know the output path should always
    pass it; the ``df`` fallback remains for opaque sinks.

    Raises ``ValidationError`` AFTER the write completes — callers treating
    a zone as atomic should write to a staging path and promote on success
    (the snapshot-dir pattern of sources/incremental.py).
    """
    from pyspark.sql import Observation

    violations = _schema_violation(df, exp, table)
    obs = Observation()
    write_fn(df.observe(obs, *_metric_aggs(exp)))
    row = obs.get
    violations += _metric_violations(row, exp, table)
    if exp.unique_key:
        side = read_back() if read_back is not None else df
        d = side.agg(
            F.count_distinct(*[F.col(k) for k in exp.unique_key]).alias("d")
        ).collect()[0]["d"]
        violations += _unique_key_violations(row, d, exp, table)

    if violations:
        raise ValidationError(violations)
