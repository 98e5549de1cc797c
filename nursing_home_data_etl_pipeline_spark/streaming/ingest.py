"""Streaming ingest: the reference's manifest-dedup incremental ingest
(``sync-drive-to-s3.py:108-131``) is natively Spark's file stream source
(checkpointed seen-file state, exactly-once). ``Trigger.AvailableNow``
drains pending files and stops — a batch run with streaming's ledger, so
the daily pipeline adopts it without a 24/7 driver."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.cleaning import clean_table


def stream_csv_landing(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
) -> DataFrame:
    """Streaming CSV scan of a landing directory (header rows skipped via
    the declared schema; all-string schemas mirror the untyped batch
    ingest)."""
    return (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 64)
        .csv(landing_dir)
    )


def start_clean_to_staging(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    staging_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """landing CSVs -> universal cleaning -> staging Parquet, exactly-once.

    The checkpoint directory holds the file ledger (the engine never
    re-reads a processed file across restarts — the reference's manifest
    semantics with crash safety for free).
    """
    cleaned = clean_table(stream_csv_landing(spark, landing_dir, schema))
    writer = (
        cleaned.writeStream.format("parquet")
        .option("path", staging_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
