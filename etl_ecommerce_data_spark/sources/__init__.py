from etl_ecommerce_data_spark.sources.registry import (
    OLIST_SCHEMAS,
    SYNTHETIC_SCHEMAS,
    load_table,
    load_tables,
)
from etl_ecommerce_data_spark.sources.readers import (
    read_csv_table,
    read_jdbc_table,
    read_parquet_table,
    write_jdbc_table,
    write_parquet_table,
)

__all__ = [
    "OLIST_SCHEMAS",
    "SYNTHETIC_SCHEMAS",
    "load_table",
    "load_tables",
    "read_csv_table",
    "read_jdbc_table",
    "read_parquet_table",
    "write_jdbc_table",
    "write_parquet_table",
]
