"""Hypertable-style time rollup: one expanded aggregate must equal the
per-level groupBys, tag rows correctly, and plan a single shuffle."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.operators.aggregates import time_rollup


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (i, dt.datetime(2024, 1 + (i * 7) % 3, 1 + (i * 5) % 27, (i * 3) % 24),
         float(i % 10), f"u{i % 4}")
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, v double, u string")


def _expected(df, level, extra=()):
    return {
        tuple(r)
        for r in df.groupBy(
            F.date_trunc(level, "ts").alias("b"), *extra
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv"))
        .collect()
    }


def test_matches_per_level_groupbys(spark, events):
    out = time_rollup(
        events,
        "ts",
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")],
        levels=("hour", "day", "month"),
    )
    rows = out.collect()
    assert {r.resolution for r in rows} == {"hour", "day", "month"}
    for lv in ("hour", "day", "month"):
        got = {
            (r.bucket_start, r.n, r.sv) for r in rows if r.resolution == lv
        }
        assert got == _expected(events, lv)


def test_extra_keys(spark, events):
    out = time_rollup(
        events,
        "ts",
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")],
        levels=("day",),
        extra_keys=("u",),
    )
    got = {(r.bucket_start, r.u, r.n, r.sv) for r in out.collect()}
    assert got == _expected(events, "day", extra=("u",))


def test_single_shuffle(spark, events):
    out = time_rollup(
        events, "ts", [F.count(F.lit(1)).alias("n")], levels=("hour", "day")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" in plan


def test_rejects_empty_levels(spark, events):
    with pytest.raises(ValueError, match="at least one"):
        time_rollup(events, "ts", [F.count(F.lit(1)).alias("n")], levels=())


def test_null_timestamps_grouped_not_mistagged(spark):
    rows = [(1, None, 1.0), (2, None, 2.0), (3, dt.datetime(2024, 3, 5, 7), 4.0)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    out = time_rollup(
        df, "ts", [F.count(F.lit(1)).alias("n")], levels=("hour", "day")
    ).collect()
    # null ts rows form their own (null) bucket at EVERY level — tagged by
    # grouping_id, never leaking into another level or dropping out.
    for lv in ("hour", "day"):
        buckets = {r.bucket_start: r.n for r in out if r.resolution == lv}
        assert buckets[None] == 2
        assert buckets[dt.datetime(2024, 3, 5, 7 if lv == "hour" else 0)] == 1
    assert len(out) == 4
