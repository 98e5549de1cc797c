from __future__ import annotations

from pyspark.sql import types as T

from nursing_home_data_etl_pipeline_spark.streaming.ingest import (
    start_clean_to_staging,
)

CSV_SCHEMA = T.StructType(
    [
        T.StructField("CMS Certification Number (CCN)", T.StringType()),
        T.StructField("Provider Name", T.StringType()),
    ]
)


def test_streaming_ingest_exactly_once(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text(
        "CMS Certification Number (CCN),Provider Name\n 1 , Alpha \n"
    )
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    q = start_clean_to_staging(spark, str(landing), CSV_SCHEMA, staging, ckpt)
    q.awaitTermination(60)

    out = spark.read.parquet(staging)
    assert out.columns == ["facility_number", "facility_name"]
    rows = out.collect()
    assert rows[0].facility_name == "Alpha"  # trimmed

    # second file lands; restart drains ONLY the new file (checkpoint ledger)
    (landing / "b.csv").write_text(
        "CMS Certification Number (CCN),Provider Name\n2,Beta\n"
    )
    q2 = start_clean_to_staging(spark, str(landing), CSV_SCHEMA, staging, ckpt)
    q2.awaitTermination(60)
    names = sorted(r.facility_name for r in spark.read.parquet(staging).collect())
    assert names == ["Alpha", "Beta"]  # no duplicate Alpha

    # third restart with nothing new: still exactly-once
    q3 = start_clean_to_staging(spark, str(landing), CSV_SCHEMA, staging, ckpt)
    q3.awaitTermination(60)
    assert spark.read.parquet(staging).count() == 2


def test_streaming_catalog_queries_registered():
    from nursing_home_data_etl_pipeline_spark.plans import catalog

    names = set(catalog.entries())
    assert {
        "streaming_windowed_agg",
        "streaming_session_counts",
        "streaming_stateful_totals",
    } <= names


def test_streaming_dropduplicates_with_watermark(spark, tmp_path):
    """Streaming dedup: dropDuplicates over (event_id) with a watermark -
    exactly-once event delivery across micro-batches with bounded state."""
    import uuid as _uuid

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = tmp_path / "ev"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("event_id", T.LongType()), T.StructField("sec", T.LongType())]
    )
    spark.createDataFrame([(1, 100), (2, 200), (1, 100)], schema).write.mode(
        "append"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .select("event_id", F.timestamp_seconds("sec").alias("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
    )
    name = f"sdd_{_uuid.uuid4().hex[:8]}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r.event_id for r in spark.table(name).collect()) == [1, 2]
