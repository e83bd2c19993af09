from etl_ecommerce_data_spark.functions import text, vectors

__all__ = ["text", "vectors"]
