"""Shared test/verification helpers: DuckDB oracle setup + canonical result
normalization (used by tests/ and tools/verify_local.py)."""

from __future__ import annotations

import datetime
import decimal

import duckdb
import numpy as np
import pandas as pd

SYNTHETIC_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every synthetic table registered as a view (mirrors
    the driver's pre-registered views)."""
    con = duckdb.connect()
    for t in SYNTHETIC_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def normalize(df) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name, every value
    stringified, rows sorted. Two engines agree iff their normalized forms
    are equal."""
    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(tuple(_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None))


def diff_rows(
    s: list[tuple], o: list[tuple], limit: int = 3
) -> tuple[list, list]:
    """Rows present on only one side of two NORMALIZED row lists, capped at
    ``limit`` per side. Set-difference, not positional zip: two
    independently-sorted lists misalign from the first divergent row
    onward, so a zip shows up to ``limit`` unrelated pairs instead of the
    one actual regression. Each side's set is built ONCE (an
    in-comprehension ``set(o)`` is O(rows²) stringify work on sf0.1-sized
    frames), and when the frames differ only in duplicate-row MULTIPLICITY
    both set-differences are empty — a Counter fallback reports the rows
    whose counts disagree as pre-formatted ``'{row} xN vs xM'`` STRINGS so
    the diff is never silently empty. Strings, not ``(row, 'xN vs xM')``
    tuples: a genuine data row that happens to be a 2-tuple whose second
    element starts with 'x' would be ambiguous with a multiplicity entry
    in the rendered diff (ADVICE r12). Shared by assert_frames_match and
    tools/verify_local._diff_rows (one contract, one implementation)."""
    o_set, s_set = set(o), set(s)
    only_s = [r for r in s if r not in o_set][:limit]
    only_o = [r for r in o if r not in s_set][:limit]
    if not only_s and not only_o:
        from collections import Counter

        cs, co = Counter(s), Counter(o)
        only_s = [f"{r} x{cs[r]} vs x{co[r]}" for r in cs if cs[r] > co[r]][:limit]
        only_o = [f"{r} x{co[r]} vs x{cs[r]}" for r in co if co[r] > cs[r]][:limit]
    return only_s, only_o


def assert_frames_match(spark_df, oracle_df, name: str = "query") -> None:
    s, o = normalize(spark_df), normalize(oracle_df)
    assert len(s) == len(o), f"{name}: rowcount spark={len(s)} oracle={len(o)}"
    if s != o:
        only_s, only_o = diff_rows(s, o)
        raise AssertionError(
            f"{name}: value mismatch; spark-only rows: {only_s}; "
            f"oracle-only rows: {only_o}"
        )
