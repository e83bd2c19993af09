"""JDBC connector integration test against a REAL in-process database.

The reference's storage layer is Postgres over JDBC (to_bronze.py:41-50,
to_silver.py:22-30); the sandbox has no network/Postgres, but Spark bundles
Apache Derby (its Hive-metastore dependency), whose embedded driver hosts a
full SQL database inside the JVM — so the partitioned-read + batched-write
paths in sources/readers.py are exercised end-to-end, not just code-complete.

In local mode executors share the driver JVM, so `jdbc:derby:memory:` is
visible to every task. On a real cluster the same code points at a networked
database; only the URL/driver change.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_ecommerce_data_spark.sources.readers import read_jdbc_table, write_jdbc_table

URL = "jdbc:derby:memory:etl_it;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _sample(spark, n=1000):
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("double").alias("v"),
            F.concat(F.lit("name_"), F.col("id")).alias("s"),
            (F.lit(dt.datetime(2024, 1, 1)) + F.make_interval(secs=F.col("id"))).alias("ts"),
        )
    )


def test_jdbc_write_then_partitioned_read_roundtrip(spark):
    df = _sample(spark)
    write_jdbc_table(
        df, URL, "t_roundtrip", user="app", password="app", driver=DRIVER,
        batchsize=200,
    )
    back = read_jdbc_table(
        spark, URL, "t_roundtrip", user="app", password="app", driver=DRIVER,
        partition_column="k", lower_bound=0, upper_bound=1000, num_partitions=8,
    )
    # the partitioned read actually fans out (the reference's 1-task bug,
    # to_silver.py:22-30, is what this option set fixes)
    assert back.rdd.getNumPartitions() == 8
    got = sorted(
        (r["k"], r["v"], r["s"], r["ts"]) for r in back.collect()
    )
    want = sorted(
        (r["k"], r["v"], r["s"], r["ts"]) for r in df.collect()
    )
    assert got == want


def test_jdbc_overwrite_replaces_rows(spark):
    write_jdbc_table(
        _sample(spark, 50), URL, "t_overwrite", user="app", password="app",
        driver=DRIVER,
    )
    write_jdbc_table(
        _sample(spark, 20), URL, "t_overwrite", user="app", password="app",
        driver=DRIVER, mode="overwrite",
    )
    back = read_jdbc_table(
        spark, URL, "t_overwrite", user="app", password="app", driver=DRIVER
    )
    assert back.count() == 20


def test_jdbc_unpartitioned_read_is_single_task(spark):
    # Documents the hazard the reference shipped: no partition options → one
    # task regardless of table size.
    write_jdbc_table(
        _sample(spark, 100), URL, "t_single", user="app", password="app",
        driver=DRIVER,
    )
    back = read_jdbc_table(
        spark, URL, "t_single", user="app", password="app", driver=DRIVER
    )
    assert back.rdd.getNumPartitions() == 1
