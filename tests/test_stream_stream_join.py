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
