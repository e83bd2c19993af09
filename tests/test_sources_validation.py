"""Source registry, CSV connector, and the validation stage."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_ecommerce_data_spark.sources.readers import read_csv_table, write_parquet_table
from etl_ecommerce_data_spark.sources.registry import (
    OLIST_SCHEMAS,
    SYNTHETIC_SCHEMAS,
    load_table,
)
from etl_ecommerce_data_spark.validation import Expectations, ValidationError, validate

from tests.conftest import SF_SMOKE


def test_all_synthetic_tables_load_with_declared_schema(spark):
    for name in SYNTHETIC_SCHEMAS:
        df = load_table(spark, SF_SMOKE, name)
        assert df.limit(1).count() in (0, 1)
        if name == "events":  # ts converted long→timestamp post-read
            assert df.schema["ts"].dataType == T.TimestampType()


def test_unknown_table_raises(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF_SMOKE, "nope")


def test_olist_schema_registry_complete():
    assert set(OLIST_SCHEMAS) == {
        "orders", "customers", "order_items", "products", "sellers",
        "order_reviews", "product_category_name_translation",
        "geolocation", "order_payments",
    }


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text("order_id,customer_id,order_status\no1,c1,delivered\no2,c2,\n")
    schema = T.StructType(
        [
            T.StructField("order_id", T.StringType()),
            T.StructField("customer_id", T.StringType()),
            T.StructField("order_status", T.StringType()),
        ]
    )
    df = read_csv_table(spark, str(p), schema)
    assert df.schema == schema
    assert df.count() == 2
    out = tmp_path / "pq"
    write_parquet_table(df, str(out))
    assert spark.read.parquet(str(out)).count() == 2


def test_validate_passes_on_clean_table(spark):
    df = load_table(spark, SF_SMOKE, "customer")
    validate(
        df,
        Expectations(
            min_rows=100,
            not_null=("c_custkey", "c_name"),
            unique_key=("c_custkey",),
        ),
        "customer",
    )


def test_validate_collects_all_violations(spark):
    df = spark.createDataFrame(
        [(1, None, -5.0), (1, "b", 2.0)], "k long, name string, amount double"
    )
    with pytest.raises(ValidationError) as e:
        validate(
            df,
            Expectations(
                min_rows=10, not_null=("name",), unique_key=("k",), positive=("amount",)
            ),
            "t",
        )
    msgs = "".join(e.value.violations)
    assert "min_rows" in msgs and "NULL" in msgs and "not unique" in msgs and "non-positive" in msgs
