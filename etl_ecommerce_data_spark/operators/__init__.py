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
from etl_ecommerce_data_spark.operators.dedup import (
    boilerplate_removal,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_lsh_pairs_cross,
    simhash_pairs,
)
from etl_ecommerce_data_spark.operators.joins import asof_join, broadcast_join, salted_join
from etl_ecommerce_data_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    gram_upper_arrow,
    gram_upper_quantized,
    ivf_topk,
    lsh_topk,
)

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
    "boilerplate_removal",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_cross",
    "simhash_pairs",
    "asof_join",
    "broadcast_join",
    "salted_join",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "gram_upper_arrow",
    "gram_upper_quantized",
    "ivf_topk",
    "lsh_topk",
]
