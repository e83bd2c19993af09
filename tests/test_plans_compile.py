"""DAG-integrity analog (SURVEY §5): every registry query must compile to a
physical plan without execution; SQL views register for all tables."""

from __future__ import annotations

import pytest

from etl_ecommerce_data_spark.plans.queries import QUERIES
from etl_ecommerce_data_spark.plans.sql_api import register_views

from tests.conftest import SF_SMOKE

# Streaming builders drive a query to completion and iterative builders run
# actions inside the build — both EXECUTE, so they're covered by their own
# tests/oracle entries instead of the compile sweep.
_EXECUTING = {"stream_events_windowed", "stream_user_stats_stateful",
              "stream_dedup_events", "dedup_clusters"}


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in _EXECUTING])
def test_query_compiles_to_physical_plan(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan  # analyzable + plannable without running


def test_register_views_covers_all_tables(spark):
    names = register_views(spark, SF_SMOKE)
    got = {r["viewName"] for r in spark.sql("SHOW VIEWS").collect()}
    assert set(names) <= got


# Plans allowed to contain a BroadcastNestedLoopJoin: the brute-force scorers
# broadcast a small query/total side by design (documented baselines).
_BNLJ_OK = {"priority_revenue_share", "similarity_topk", "similarity_topk_ivf",
            "embedding_near_dup"}
# Plans allowed to contain Python nodes: the declared Arrow-batched paths.
_PYTHON_OK = {"user_value_ewma", "multimodal_meta"}


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in _EXECUTING])
def test_plan_has_no_scale_red_flags(spark, name):
    plan = (
        QUERIES[name]
        .builder(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: unplanned cartesian"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    if name not in _PYTHON_OK:
        for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in plan, f"{name}: unexpected Python node {node}"
    assert "PartitionBy: []" not in plan, f"{name}: unpartitioned window"
