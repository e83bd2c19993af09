"""SQL entry point: the engine's tables as temp views + ``spark.sql`` queries.

The reference's only query language is the DataFrame API (SURVEY §3: no SQL
string anywhere). Exposing the same tables through ``spark.sql`` is free in
Spark — identical Catalyst plans, one more surface users expect. Queries
written here in ANSI SQL double as their own DuckDB oracle text (same table
names, same semantics), which pins Spark SQL's dialect behavior against an
independent engine.

Concurrency contract: temp views are SESSION-global, so one SparkSession
serves ONE sf_dir at a time — concurrent ``run_sql`` calls with different
sf_dirs on a shared session would race on the view names (last registration
wins mid-query). Use separate sessions (``spark.newSession()``) for
concurrent multi-dataset SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_ecommerce_data_spark.sources.registry import SYNTHETIC_SCHEMAS, load_table

# last sf_dir registered per live session (keyed by object id): repeat
# run_sql calls on the same dataset skip the 11-table re-registration —
# including the events ts-kind probe — instead of paying it per query. The
# key MUST NOT be (id, sf_dir): that cache would serve STALE views when
# calls alternate between datasets (dirA, dirB, dirA would leave dirB's
# views live on the third call).
_LAST_SFDIR: dict[int, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every PRESENT engine table as a temp view named exactly like
    the table, so ``spark.sql`` queries read the same data as the DataFrame
    API. Tables whose parquet file is absent from ``sf_dir`` are skipped —
    eagerly loading all of them would make a pure-lineitem query fail on a
    fixture subset that never references the missing table (a query that
    DOES reference it fails loudly with TABLE_OR_VIEW_NOT_FOUND)."""
    registered = []
    for name in SYNTHETIC_SCHEMAS:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    _LAST_SFDIR[id(spark)] = sf_dir
    return registered


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    if _LAST_SFDIR.get(id(spark)) != sf_dir:
        register_views(spark, sf_dir)
    return spark.sql(query)
