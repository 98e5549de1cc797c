from __future__ import annotations

from pyspark.sql import types as T

from nursing_home_data_etl_pipeline_spark.streaming.upsert import start_upsert_sink

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ver", T.LongType()),
    ]
)


def test_streaming_upsert_scd1(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = start_upsert_sink(stream, target, ["pk"], ckpt, order_col="ver")
        q.awaitTermination(120)

    # batch 1: bootstrap, including an intra-batch double update to key a
    spark.createDataFrame(
        [("a", 1, 1), ("a", 5, 2), ("b", 2, 1)], SCHEMA
    ).write.mode("append").parquet(str(src))
    drain()
    state = {r.pk: r.v for r in spark.read.parquet(target).collect()}
    assert state == {"a": 5, "b": 2}  # latest ver wins within the batch

    # batch 2: update a, insert c; b untouched
    spark.createDataFrame([("a", 9, 3), ("c", 7, 1)], SCHEMA).write.mode(
        "append"
    ).parquet(str(src))
    drain()
    state = {r.pk: r.v for r in spark.read.parquet(target).collect()}
    assert state == {"a": 9, "b": 2, "c": 7}

    # restart with nothing new: checkpoint ledger -> no reprocessing, state stable
    drain()
    assert {r.pk: r.v for r in spark.read.parquet(target).collect()} == state


def test_streaming_upsert_no_order_col_dedups_batch(spark, tmp_path):
    """order_col=None with an intra-batch double update: the struct-max row
    per key wins and the dim holds ONE row per key (feeding the raw batch
    to merge_scd1 violated its unique-source precondition and left both
    rows in the dim forever)."""
    src = tmp_path / "src3"
    src.mkdir()
    target = str(tmp_path / "dim3")
    ckpt = str(tmp_path / "ckpt3")

    spark.createDataFrame(
        [("a", 1, 1), ("a", 5, 2), ("b", 2, 1)], SCHEMA
    ).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = start_upsert_sink(stream, target, ["pk"], ckpt, order_col=None)
    q.awaitTermination(120)
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 2  # one row per key, not three
    state = {r.pk: (r.v, r.ver) for r in rows}
    assert state["b"] == (2, 1)
    assert state["a"] == (5, 2)  # struct-max (v, ver) — deterministic


def test_streaming_incremental_agg_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-applied epoch
    (here: a fresh checkpoint replaying the whole source at epoch 0 against
    a target whose _meta.json records epoch 1) must NOT re-merge — count/sum
    merging is not idempotent and double-counted before the epoch guard."""
    from nursing_home_data_etl_pipeline_spark.streaming.upsert import (
        start_incremental_agg,
    )

    src = tmp_path / "rsrc"
    src.mkdir()
    target = str(tmp_path / "raggs")

    def drain(ckpt: str):
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = start_incremental_agg(stream, target, ["pk"], "v", str(ckpt))
        q.awaitTermination(120)

    spark.createDataFrame([("a", 1, 1)], SCHEMA).write.mode("append").parquet(str(src))
    drain(str(tmp_path / "rckpt"))
    spark.createDataFrame([("a", 2, 2)], SCHEMA).write.mode("append").parquet(str(src))
    drain(str(tmp_path / "rckpt"))  # epoch 1 -> meta epoch = 1
    before = {r.pk: (r.cnt, r.total) for r in spark.read.parquet(target).collect()}
    assert before == {"a": (2, 3)}

    # replay everything at epoch 0 via a fresh checkpoint: guard skips it
    drain(str(tmp_path / "rckpt_fresh"))
    after = {r.pk: (r.cnt, r.total) for r in spark.read.parquet(target).collect()}
    assert after == before  # unchanged — not double-counted


def test_streaming_upsert_merge_error_fails_query_not_wipes_dim(spark, tmp_path):
    """ADVICE round-1 regression: a merge-time failure on a later micro-batch
    must FAIL the streaming query (checkpoint replays it safely), not be
    treated as first-batch bootstrap — which would silently wipe the
    maintained dim down to that batch's rows."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "src2"
    src.mkdir()
    target = str(tmp_path / "dim2")
    ckpt = str(tmp_path / "ckpt2")

    spark.createDataFrame([("a", 1, 1)], SCHEMA).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = start_upsert_sink(stream, target, ["pk"], ckpt, order_col="ver")
    q.awaitTermination(120)
    before = {r.pk: r.v for r in spark.read.parquet(target).collect()}
    assert before == {"a": 1}

    # Drift the target: add a column the stream cannot supply, so the merge's
    # source.select(*target.columns) raises inside foreachBatch.
    drifted = spark.read.parquet(target).withColumnRenamed("v", "renamed_v")
    drifted.write.mode("overwrite").parquet(str(tmp_path / "dim2_drift"))
    spark.read.parquet(str(tmp_path / "dim2_drift")).write.mode("overwrite").parquet(target)

    spark.createDataFrame([("b", 2, 1)], SCHEMA).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema(SCHEMA).parquet(str(src))
    q2 = start_upsert_sink(stream2, target, ["pk"], ckpt, order_col="ver")
    with pytest.raises(StreamingQueryException):
        q2.awaitTermination(120)
        q2.processAllAvailable()

    # The dim was NOT wiped to the new batch's rows.
    after = {r.pk for r in spark.read.parquet(target).collect()}
    assert after == {"a"}


def test_streaming_incremental_agg_matches_batch_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from nursing_home_data_etl_pipeline_spark.streaming.upsert import (
        start_incremental_agg,
    )

    src = tmp_path / "asrc"
    src.mkdir()
    target = str(tmp_path / "aggs")
    ckpt = str(tmp_path / "ackpt")

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = start_incremental_agg(stream, target, ["pk"], "v", ckpt)
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", 1, 1), ("a", 5, 2), ("b", 2, 1)], SCHEMA
    ).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(
        [("a", 9, 3), ("c", 7, 1), ("b", -4, 2)], SCHEMA
    ).write.mode("append").parquet(str(src))
    drain()

    got = {
        r.pk: (r.cnt, r.total, r.vmin, r.vmax)
        for r in spark.read.parquet(target).collect()
    }
    truth = {
        r.pk: (r.cnt, r.total, r.vmin, r.vmax)
        for r in spark.read.parquet(str(src))
        .groupBy("pk")
        .agg(
            F.count("v").alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert got == truth == {
        "a": (3, 15, 1, 9),
        "b": (2, -2, -4, 2),
        "c": (1, 7, 7, 7),
    }
    # idle drain: checkpoint prevents double counting
    drain()
    assert {
        r.pk: (r.cnt, r.total, r.vmin, r.vmax)
        for r in spark.read.parquet(target).collect()
    } == truth
