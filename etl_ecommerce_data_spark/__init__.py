"""etl_ecommerce_data_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference repo ``FA3001/ETL-Ecommerce-data`` (a medallion
bronze→silver→gold e-commerce ETL pipeline; see SURVEY.md), re-expressed
Spark-first and extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns), all designed for 100 TB scale.

Layout:
    session     — SparkSession factory with scale-tuned defaults
    sources     — explicit schema registry + parquet/CSV/JDBC readers
    operators   — cleaning, joins (incl. as-of), dedup (exact/MinHash/SimHash),
                  similarity search
    functions   — column-expression libraries (text analysis, vector math)
    plans       — the declared query registry (name → builder + DuckDB oracle)
    streaming   — Structured Streaming operators over the events table
"""

from etl_ecommerce_data_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
