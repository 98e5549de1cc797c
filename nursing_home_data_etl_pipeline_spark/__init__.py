"""PySpark-native analytics/ETL engine with the capabilities of
Jayboy628/Nursing-Home-Data-ETL-Pipeline, re-designed Spark-first.

The reference is a 3-job AWS Glue pipeline (CSV -> cleaned Parquet staging ->
dimension-shaped Parquet -> Snowflake star schema). This package re-expresses
that surface as a library of pure ``DataFrame -> DataFrame`` operators plus a
driver pipeline, and extends it with the query surface the reference lacks
(filters, aggregations, windows, set ops) and large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is built on the public Apache Spark DataFrame/SQL API; Catalyst
does the optimization. No custom execution engine code.
"""

__version__ = "0.1.0"
