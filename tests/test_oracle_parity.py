"""Golden gate: every oracle-backed registry query hash-matches DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from etl_ecommerce_data_spark.plans.queries import QUERIES
from etl_ecommerce_data_spark.testing import assert_frames_match

from tests.conftest import SF_SMOKE

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
NO_ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    qd = QUERIES[name]
    sdf = qd.builder(spark, SF_SMOKE).toPandas()
    odf = oracle_con.execute(qd.oracle).fetchdf()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_frame_diff_reports_multiplicity_only_mismatches():
    """Frames differing only in duplicate-row MULTIPLICITY have empty
    set-differences; the assertion message must still name the offending
    rows (Counter fallback) instead of showing an empty diff (ADVICE r11).
    Same contract for tools/verify_local.py's _diff_rows."""
    import pandas as pd

    a = pd.DataFrame({"k": [1, 1, 2]})
    b = pd.DataFrame({"k": [1, 2, 2]})
    with pytest.raises(AssertionError) as exc:
        assert_frames_match(a, b, "dupes")
    msg = str(exc.value)
    assert "x2 vs x1" in msg and "('1',)" in msg and "('2',)" in msg

    import tools.verify_local as vl

    lines = vl._diff_rows([("1",), ("1",), ("2",)], [("1",), ("2",), ("2",)])
    assert any("x2 vs x1" in ln for ln in lines)
    assert any("spark only" in ln for ln in lines)
    assert any("oracle only" in ln for ln in lines)


def test_driver_contract():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25
    assert "pricing_summary" in qs


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
