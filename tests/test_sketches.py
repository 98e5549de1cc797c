"""Count-Min Sketch invariants: overestimate-only, exact for wide sketches,
merge == build-on-union, broadcast probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)


@pytest.fixture(scope="module")
def tokens(spark):
    # zipf-ish: token t_i appears (40 - i) times for i in 0..39
    rows = [(f"t_{i}",) for i in range(40) for _ in range(40 - i)]
    return spark.createDataFrame(rows, "tok string")


def _truth(tokens):
    return {
        r.tok: r.n
        for r in tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_overestimate_only_and_tight_when_wide(spark, tokens):
    truth = _truth(tokens)
    items = tokens.select("tok").distinct()
    for width, exact_expected in ((2048, True), (16, False)):
        cms = cms_build(tokens, "tok", depth=4, width=width)
        est = {
            r.tok: r.est
            for r in cms_estimate(cms, items, "tok", depth=4, width=width).collect()
        }
        assert all(est[t] >= truth[t] for t in truth)  # CMS never undercounts
        if exact_expected:
            # 40 distinct items in 4x2048 counters: collisions in all 4 rows
            # are overwhelmingly unlikely, so every estimate is exact
            assert est == truth


def test_merge_equals_union_build(spark, tokens):
    half_a = tokens.limit(400)
    half_b = tokens.exceptAll(half_a)
    merged = cms_merge(
        cms_build(half_a, "tok", width=64), cms_build(half_b, "tok", width=64)
    )
    direct = cms_build(tokens, "tok", width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_sketch_size_bounded(spark, tokens):
    cms = cms_build(tokens, "tok", depth=3, width=8)
    assert cms.count() <= 3 * 8


def test_probe_plan_broadcasts_sketch(spark, tokens):
    cms = cms_build(tokens, "tok", depth=2, width=32)
    plan = (
        cms_estimate(cms, tokens.select("tok").distinct(), "tok", depth=2, width=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
