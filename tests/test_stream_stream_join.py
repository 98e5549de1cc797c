"""Stream-stream join coverage: clicks joined to purchases within a time
bound, both sides watermarked (Spark buffers bounded state on each side)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_stream_stream_interval_join(spark, tmp_path):
    # two event streams from parquet dirs
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks = spark.createDataFrame(
        [(1, 100, 1000), (2, 100, 5000), (3, 200, 1000)],
        ["click_id", "user_id", "sec"],
    ).select("click_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    buys = spark.createDataFrame(
        [(10, 100, 1500), (11, 200, 9999)], ["buy_id", "user_id", "sec"]
    ).select("buy_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    clicks.write.parquet(str(clicks_dir))
    buys.write.parquet(str(buys_dir))

    sc = (
        spark.readStream.schema(clicks.schema).parquet(str(clicks_dir))
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    sb = (
        spark.readStream.schema(buys.schema).parquet(str(buys_dir))
        .withWatermark("ts", "1 hour")
        .alias("b")
    )
    # purchase within 10 minutes AFTER the click, same user
    joined = sc.join(
        sb,
        F.expr(
            "c.user_id = b.user_id AND b.ts >= c.ts AND b.ts <= c.ts + interval 10 minutes"
        ),
    ).select("click_id", "buy_id")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r.click_id, r.buy_id) for r in spark.table(name).collect()}
    # click1@1000s matches buy10@1500s (same user, within 10 min);
    # click2@5000s too late for buy10; click3 user 200 buy@9999 too late
    assert rows == {(1, 10)}


def _events_fixture(spark, path, hot_share):
    n = 400
    rows = [
        (i,
         1000 + i,
         0 if (t == "purchase" and i % 100 < hot_share * 100) else i,
         t,
         1.0,
         None)
        for i in range(n)
        for t in (("purchase",) if i % 2 else ("click",))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, event_type string, "
              "value double, props string"
    ).select("event_id", F.timestamp_seconds("sec").alias("ts"), "user_id",
             "event_type", "value", "props")
    df.write.parquet(str(path / "events.parquet"))
    return str(path)


def test_state_skew_warning_fires_on_skew_not_uniform(spark, tmp_path, caplog):
    """round-15 #3: unsalted stream-join state with one key above the
    share threshold logs a warning; uniform keys stay silent; salted
    runs stay silent regardless."""
    import logging

    from nursing_home_data_etl_pipeline_spark.plans.queries_streaming import (
        _warn_if_state_skewed,
    )

    skew = _events_fixture(spark, tmp_path / "skew", hot_share=0.5)
    uni = _events_fixture(spark, tmp_path / "uni", hot_share=0.0)
    logger = "nursing_home_data_etl_pipeline_spark.plans.queries_streaming"
    with caplog.at_level(logging.WARNING, logger=logger):
        _warn_if_state_skewed(spark, uni, n_salt=1, min_bytes=0)
        assert not caplog.records
        _warn_if_state_skewed(spark, skew, n_salt=4, min_bytes=0)
        assert not caplog.records  # salted: state already split
        # default size gate: below _SKEW_PROBE_MIN_BYTES even total
        # concentration fits one task — probe (and warning) skipped
        _warn_if_state_skewed(spark, skew, n_salt=1)
        assert not caplog.records
        _warn_if_state_skewed(spark, skew, n_salt=1, min_bytes=0)
    assert any("SPARK_GRAFT_STREAM_SALT" in r.message for r in caplog.records)
