"""Scale levers: bucketed co-located joins, partitioned writes with
partition pruning, broadcast behavior — asserted on the physical plan, not
just the result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.sources.writers import (
    write_bucketed,
    write_parquet,
)


def _physical_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    # warehouse.dir is a static conf; isolate via a database LOCATION instead
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS buckets_test LOCATION '{tmp_path / 'wh'}'"
    )
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "buckets_test.ta", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(b, "buckets_test.tb", ["k"], num_buckets=8, sort_cols=["k"])
    yield "buckets_test.ta", "buckets_test.tb"
    spark.sql("DROP DATABASE buckets_test CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        # co-located buckets: no Exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(100)],
        ["id", "part", "v"],
    )
    out = str(tmp_path / "pt")
    write_parquet(df, out, partition_by=["part"])
    back = spark.read.parquet(out).filter(F.col("part") == "a")
    plan = _physical_plan(back)
    # partition filter applied at scan: only the matching directory is read
    assert back.count() == 50
    assert "PartitionFilters: [isnotnull(part" in plan or "part#" in plan
    files = back.select(F.input_file_name()).distinct().collect()
    assert all("part=a" in r[0] for r in files)


def test_broadcast_join_in_enrich_plan(spark, sf_dir):
    from nursing_home_data_etl_pipeline_spark.plans import catalog

    df = catalog.entries()["left_join_enrich"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from nursing_home_data_etl_pipeline_spark.plans import catalog

    df = catalog.entries()["filter_name_projection"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "PushedFilters" in plan and "GreaterThan(l_discount,0.05)" in plan


def test_aqe_coalesces_shuffle_partitions(spark):
    # 32 configured shuffle partitions on tiny data: AQE must coalesce the
    # post-shuffle partition count way down (proves runtime re-planning on).
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    from pyspark.sql import functions as F

    out = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    out.collect()
    assert out.rdd.getNumPartitions() < int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
