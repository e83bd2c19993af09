"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_ecommerce_data_spark`` — this module only
adapts the engine's query registry (plans/queries.py) to the driver's
callable/SQL dict shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_ecommerce_data_spark.plans.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return {name: qd.builder for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops
    (LSH banding paths) → driver records rows-only checks for those."""
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
