"""SQL entry point: the engine's tables as temp views + ``spark.sql`` queries.

The reference's only query language is the DataFrame API (SURVEY §3: no SQL
string anywhere). Exposing the same tables through ``spark.sql`` is free in
Spark — identical Catalyst plans, one more surface users expect. Queries
written here in ANSI SQL double as their own DuckDB oracle text (same table
names, same semantics), which pins Spark SQL's dialect behavior against an
independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_ecommerce_data_spark.sources.registry import SYNTHETIC_SCHEMAS, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every engine table as a temp view named exactly like the
    table, so ``spark.sql`` queries read the same data as the DataFrame API."""
    for name in SYNTHETIC_SCHEMAS:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(SYNTHETIC_SCHEMAS)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
