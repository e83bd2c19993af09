from etl_ecommerce_data_spark.plans.queries import QUERIES, QueryDef

__all__ = ["QUERIES", "QueryDef"]
