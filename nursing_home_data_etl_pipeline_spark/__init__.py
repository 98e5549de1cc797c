"""PySpark-native analytics/ETL engine with the capabilities of
Jayboy628/Nursing-Home-Data-ETL-Pipeline (a 3-job AWS Glue pipeline: CSV
-> cleaned Parquet -> dimension Parquet -> Snowflake star), re-designed
Spark-first: pure ``DataFrame -> DataFrame`` operators + a driver
pipeline, extended with the query surface the reference lacks and
large-scale training-data operators (dedup, similarity, text, multimodal).
Public Spark DataFrame/SQL API only; Catalyst optimizes."""

__version__ = "0.1.0"
