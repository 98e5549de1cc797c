"""Range (interval) join: bucketized rewrite must exactly match the naive
theta join, including boundary and left-outer semantics, and must plan as a
hash join on the bucket — not a BroadcastNestedLoopJoin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.operators.ranges import range_join_points


def _naive(points, intervals, on_keys):
    cond = (
        (points["x"] >= intervals["lo"])
        & (points["x"] < intervals["hi"])
    )
    for k in on_keys:
        cond = cond & (points[k] == intervals[k])
    return points.join(intervals, cond, "inner").select(
        points["pid"], intervals["iid"]
    )


@pytest.fixture(scope="module")
def data(spark):
    # Deterministic pseudo-random points and (often overlapping) intervals,
    # spans from sub-bucket to multi-bucket so explode fan-out varies.
    points = spark.range(400).select(
        F.col("id").alias("pid"),
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 137) % 1000).cast("long").alias("x"),
    )
    intervals = spark.range(60).select(
        F.col("id").alias("iid"),
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 241) % 900).cast("long").alias("lo"),
        (((F.col("id") * 241) % 900) + 10 + (F.col("id") % 5) * 120)
        .cast("long")
        .alias("hi"),
    )
    return points, intervals


@pytest.mark.parametrize("width", [50, 100, 1000])
def test_matches_naive_theta_join(spark, data, width):
    points, intervals = data
    got = (
        range_join_points(
            points, intervals, "x", "lo", "hi", on="k", bucket_width=width
        )
        .select("pid", "iid")
        .collect()
    )
    want = _naive(points, intervals, ["k"]).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0


def test_boundary_semantics_half_open(spark):
    points = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 19)], "pid long, x long"
    )
    intervals = spark.createDataFrame([(7, 10, 20)], "iid long, lo long, hi long")
    got = {
        (r.pid, r.iid)
        for r in range_join_points(
            points, intervals, "x", "lo", "hi", bucket_width=8
        ).collect()
    }
    # lo inclusive, hi exclusive: x=10 in, x=20 out, x=19 in.
    assert got == {(1, 7), (3, 7)}


def test_left_outer_keeps_unmatched_points_once(spark, data):
    points, intervals = data
    out = range_join_points(
        points, intervals, "x", "lo", "hi", on="k", bucket_width=60, how="left"
    )
    matched = {r.pid for r in _naive(points, intervals, ["k"]).collect()}
    rows = out.collect()
    unmatched = [r for r in rows if r.iid is None]
    assert {r.pid for r in unmatched} == {
        r.pid for r in points.collect()
    } - matched
    # Exactly one null row per unmatched point (no bucket-explosion dups).
    assert len(unmatched) == len({r.pid for r in unmatched})


def test_rejects_outer_and_bad_width(spark, data):
    points, intervals = data
    with pytest.raises(ValueError, match="inner.*left"):
        range_join_points(points, intervals, "x", "lo", "hi", how="full")
    with pytest.raises(ValueError, match="positive"):
        range_join_points(points, intervals, "x", "lo", "hi", bucket_width=0)


def test_plans_hash_join_not_nested_loop(spark, data):
    points, intervals = data
    plan = (
        range_join_points(
            points, intervals, "x", "lo", "hi", on="k", bucket_width=60
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_shared_non_key_columns_rejected(spark):
    import pytest

    from nursing_home_data_etl_pipeline_spark.operators.ranges import (
        range_join_points,
    )

    pts = spark.createDataFrame([(1, 5, "x")], "k long, x long, ts string")
    ivs = spark.createDataFrame([(1, 0, 10, "y")], "k long, lo long, hi long, ts string")
    with pytest.raises(ValueError, match="share non-key columns"):
        range_join_points(pts, ivs, "x", "lo", "hi", on="k")


def test_unbounded_interval_fails_fast(spark):
    """An open-ended sentinel interval must fail with an actionable message
    instead of exploding to tens of millions of bucket rows (or dying in
    sequence() past 2^31)."""
    import pytest

    from nursing_home_data_etl_pipeline_spark.operators.ranges import (
        range_join_points,
    )

    pts = spark.createDataFrame([(1, 5)], "k long, x long")
    ivs = spark.createDataFrame(
        [(1, 0, 253_402_300_800_000_000)], "k long, lo long, hi long"  # 9999-12-31
    )
    out = range_join_points(pts, ivs, "x", "lo", "hi", on="k", bucket_width=3_600_000_000)
    with pytest.raises(Exception, match="explodes to more than"):
        out.collect()


def test_inverted_interval_matches_nothing_without_fanout(spark):
    """hi < lo is theta-unsatisfiable (x >= lo AND x < hi) — the bucketized
    rewrite must emit ZERO rows, not a descending sequence() fan-out of
    |span|+1 rows. Before the round-8 fix a negative span BYPASSED the
    fan-out guard (n_buckets <= 0 is never > the cap) and a swapped pair
    like (lo=3e9, hi=0) at width 1 crashed the whole job with
    COLLECTION_SIZE_LIMIT_EXCEEDED."""
    pts = spark.createDataFrame([(5,), (0,)], "x long").withColumn(
        "pid", F.col("x")
    )
    ivs = spark.createDataFrame(
        [(1, 10_000, 0), (2, 3_000_000_000, 0), (3, 0, 10)],
        "iid long, lo long, hi long",
    )
    out = range_join_points(
        pts, ivs, "x", "lo", "hi", bucket_width=10,
        max_buckets_per_interval=5,
    )
    rows = {(r.pid, r.iid) for r in out.collect()}
    assert rows == {(5, 3), (0, 3)}  # only the well-formed interval matches

    # left outer: every point survives, the inverted intervals match none
    left = range_join_points(
        pts, ivs, "x", "lo", "hi", how="left", bucket_width=10,
        max_buckets_per_interval=5,
    )
    assert left.count() == 2


def test_nonfinite_bounds_hit_the_actionable_guard(spark):
    """floor(±inf / width) saturates to ±Long.{Max,Min}Value; the old LONG
    span arithmetic overflowed with an opaque ANSI ARITHMETIC_OVERFLOW
    before the guard could fire. The double-measured span routes an
    infinite bound into the same actionable raise as any open-ended
    sentinel; a NaN bound satisfies neither theta comparison and matches
    nothing."""
    pts = spark.createDataFrame([(5.0,)], "x double").withColumn(
        "pid", F.lit(1)
    )
    inf, nan = float("inf"), float("nan")

    ivs = spark.createDataFrame([(1, -inf, 10.0)], "iid long, lo double, hi double")
    out = range_join_points(pts, ivs, "x", "lo", "hi", bucket_width=10)
    with pytest.raises(Exception, match="explodes to more than"):
        out.collect()

    ivs = spark.createDataFrame([(1, 0.0, inf)], "iid long, lo double, hi double")
    out = range_join_points(pts, ivs, "x", "lo", "hi", bucket_width=10)
    with pytest.raises(Exception, match="explodes to more than"):
        out.collect()

    ivs = spark.createDataFrame(
        [(1, nan, 10.0), (2, 0.0, nan), (3, 0.0, 10.0)],
        "iid long, lo double, hi double",
    )
    out = range_join_points(pts, ivs, "x", "lo", "hi", bucket_width=10)
    assert [r.iid for r in out.collect()] == [3]
