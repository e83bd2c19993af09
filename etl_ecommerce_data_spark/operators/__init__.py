from etl_ecommerce_data_spark.operators.cleaning import (
    cast_money,
    dedup_by_key,
    dedup_exact_rows,
    drop_null_rows,
    fill_nulls,
    filter_non_negative,
    filter_positive,
    normalize_strings,
    parse_timestamps,
)
from etl_ecommerce_data_spark.operators.joins import asof_join, broadcast_join, salted_join

__all__ = [
    "cast_money",
    "dedup_by_key",
    "dedup_exact_rows",
    "drop_null_rows",
    "fill_nulls",
    "filter_non_negative",
    "filter_positive",
    "normalize_strings",
    "parse_timestamps",
    "asof_join",
    "broadcast_join",
    "salted_join",
]
