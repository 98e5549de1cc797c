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


def test_probe_absent_item_estimates_zero(spark, tokens):
    # Pins the r16 internals rewrite (left-join NULL counter -> 0 now via
    # min(coalesce(cnt, 0)) instead of fillna): an item absent from the
    # build whose buckets nobody else hit must estimate exactly 0, and the
    # est column must stay a non-null LONG.
    cms = cms_build(tokens, "tok", depth=4, width=4096)
    probes = spark.createDataFrame([("never-inserted-item",)], "tok string")
    out = cms_estimate(cms, probes, "tok", depth=4, width=4096)
    rows = out.collect()
    assert out.schema["est"].dataType.simpleString() == "bigint"
    assert [(r.tok, r.est) for r in rows] == [("never-inserted-item", 0)]


def test_probe_plan_broadcasts_sketch(spark, tokens):
    cms = cms_build(tokens, "tok", depth=2, width=32)
    plan = (
        cms_estimate(cms, tokens.select("tok").distinct(), "tok", depth=2, width=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Mergeable Datasketches wrappers (HLL / KLL / theta)
# ---------------------------------------------------------------------------

from nursing_home_data_etl_pipeline_spark.functions.sketches import (  # noqa: E402
    hll_partial,
    hll_rollup,
    kll_partial,
    kll_rollup_quantiles,
    theta_partial,
    theta_rollup,
    theta_set_estimates,
)


@pytest.fixture(scope="module")
def cohorts(spark):
    # two groups x three shards; group a holds users 0..199, group b 100..349
    # (overlap 100..199), values are the user ids themselves
    rows = [("a", u % 3, u) for u in range(200)] + [
        ("b", u % 3, u) for u in range(100, 350)
    ]
    return spark.createDataFrame(rows, "g string, shard int, user long")


def test_hll_partial_rollup_matches_exact(spark, cohorts):
    partials = hll_partial(cohorts, ["g", "shard"], "user")
    assert partials.count() == 6  # one sketch row per (group, shard)
    got = {
        r.g: r.distinct_est for r in hll_rollup(partials, ["g"]).collect()
    }
    # lgk=12 -> ~1.6% rsd; at n=200/250 the estimate is exact or off by ~1
    assert abs(got["a"] - 200) <= 4 and abs(got["b"] - 250) <= 5


def test_theta_rollup_and_set_algebra_match_exact(spark, cohorts):
    partials = theta_partial(cohorts, ["g", "shard"], "user")
    rolled = theta_rollup(partials, ["g"])
    est = {r.g: r.distinct_est for r in rolled.collect()}
    assert abs(est["a"] - 200) <= 4 and abs(est["b"] - 250) <= 5
    piv = rolled.groupBy().pivot("g", ["a", "b"]).agg(F.first("theta_sketch"))
    sets = piv.select(*theta_set_estimates(F.col("a"), F.col("b"))).collect()[0]
    # below the 4096 nominal entries a theta sketch is exact
    assert sets.union_est == 350
    assert sets.intersection_est == 100
    assert sets.a_minus_b_est == 100


def test_kll_merged_quantiles_within_rank_error(spark, cohorts):
    partials = kll_partial(cohorts, ["g", "shard"], "user")
    got = {
        r.g: (r.q_5, r.q_95)
        for r in kll_rollup_quantiles(partials, ["g"], [0.5, 0.95]).collect()
    }
    # group a = uniform 0..199: true p50=99.5, p95=189.5; k=200 -> ~2% rank
    # error means the returned value sits within +-8 ranks of truth
    assert abs(got["a"][0] - 99.5) <= 8 and abs(got["a"][1] - 189.5) <= 8
    assert abs(got["b"][0] - 224.5) <= 10 and abs(got["b"][1] - 337.0) <= 10


def test_sketch_state_is_small(spark, cohorts):
    partials = theta_partial(cohorts, ["g", "shard"], "user")
    sizes = partials.select(F.octet_length("theta_sketch").alias("n")).collect()
    assert all(r.n < 64 * 1024 for r in sizes)  # KBs of state per shard


# ---------------------------------------------------------------------------
# Bloom filter (word-bitmap DataFrame)
# ---------------------------------------------------------------------------

from nursing_home_data_etl_pipeline_spark.functions.sketches import (  # noqa: E402
    bloom_build,
    bloom_might_contain,
)


def test_bloom_no_false_negatives_and_low_fpp(spark):
    members = spark.range(2000).select(F.concat(F.lit("m"), "id").alias("key"))
    others = spark.range(2000).select(F.concat(F.lit("x"), "id").alias("key"))
    bloom = bloom_build(members, "key", n_bits=1 << 16, k=5)
    assert bloom.count() <= (1 << 16) // 64  # bitmap rows bounded by words
    got_m = bloom_might_contain(bloom, members, "key", n_bits=1 << 16, k=5)
    assert got_m.filter(~F.col("might_contain")).count() == 0  # no false negs
    got_x = bloom_might_contain(bloom, others, "key", n_bits=1 << 16, k=5)
    fp = got_x.filter(F.col("might_contain")).count()
    # 65536 bits / 2000 items / k=5 -> theoretical fpp ~0.3%; allow 4x slack
    assert fp <= 2000 * 0.012


def test_bloom_null_items_unprobeable(spark):
    """The documented NULL contract: NULL items never match — neither as a
    build item nor as a probe. (xxhash64 ignores NULL args and hashes the
    bare seed, so without the explicit NULL handling a NULL item both
    inserted a stable bit pattern AND probed as a hit.)"""
    members = spark.createDataFrame([("x",), (None,)], "key string")
    bloom = bloom_build(members, "key", n_bits=1 << 12, k=3)
    probed = {
        r.key: r.might_contain
        for r in bloom_might_contain(
            bloom, members, "key", n_bits=1 << 12, k=3
        ).collect()
    }
    assert probed["x"] is True
    assert probed[None] is False  # NULL probe is false, not "maybe"


def test_bloom_probe_local_matches_dataframe_probe(spark):
    """bloom_probe_local (round 15: literal-array row-local probe, zero
    probed-side joins) must agree with bloom_might_contain on every row —
    members, non-members, and NULL — for the same collected bitmap."""
    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        bloom_probe_local,
    )

    members = spark.range(2000).select(F.concat(F.lit("m"), "id").alias("key"))
    probe_df = (
        spark.range(3000)
        .select(F.concat(F.lit("m"), (F.col("id") * 2)).alias("key"))
        .unionByName(spark.createDataFrame([(None,)], "key string"))
    )
    bloom = bloom_build(members, "key", n_bits=1 << 16, k=5)
    via_df = bloom_might_contain(bloom, probe_df, "key", n_bits=1 << 16, k=5)
    via_local = bloom_probe_local(
        bloom.collect(), probe_df, "key", n_bits=1 << 16, k=5
    )
    assert via_df.exceptAll(via_local).isEmpty()
    assert via_local.exceptAll(via_df).isEmpty()
    # and the local plan really is join-free on the probed side
    assert "Join" not in via_local._jdf.queryExecution().executedPlan().toString()


def test_bloom_prefilter_preserves_anti_join(spark):
    corpus = spark.range(5000).select(F.concat(F.lit("d"), "id").alias("key"))
    bench = spark.range(0, 5000, 7).select(F.concat(F.lit("d"), "id").alias("key"))
    bloom = bloom_build(bench, "key", n_bits=1 << 16, k=5)
    flagged = bloom_might_contain(bloom, corpus, "key", n_bits=1 << 16, k=5)
    # pre-filter: anything the bloom rules out is definitively clean; the
    # exact anti-join over the surviving (tiny) slice gives identical output
    survivors = flagged.filter(F.col("might_contain")).select("key")
    cleaned_fast = flagged.filter(~F.col("might_contain")).select("key").unionByName(
        survivors.join(bench, "key", "left_anti")
    )
    cleaned_exact = corpus.join(bench, "key", "left_anti")
    assert sorted(r.key for r in cleaned_fast.collect()) == sorted(
        r.key for r in cleaned_exact.collect()
    )


def test_cms_null_keys_never_undercount(spark):
    # NULL items used to hash to a NULL bucket: build-side counts landed in
    # an unreachable cell while NULL probes missed the join and estimated 0
    # — violating the estimate >= true-count guarantee. NULL is now a
    # countable key (SQL GROUP BY semantics).
    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [(None,)] * 100 + [("a",)] * 3, "k string"
    )
    cms = cms_build(df, "k", depth=4, width=64)
    probes = spark.createDataFrame([(None,), ("a",), ("zzz",)], "k string")
    est = {r.k: r.est for r in cms_estimate(cms, probes, "k", depth=4, width=64).collect()}
    assert est[None] >= 100
    assert est["a"] >= 3


def test_kll_fold_all_null_sketch_group_yields_null(spark):
    """Round-8 hunt: collect_list skips NULLs, so a group whose sketches
    are all NULL folds an EMPTY list — and under ANSI (Spark 4 default)
    ``list[0]`` RAISES INVALID_ARRAY_INDEX instead of seeding NULL. The
    try_element_at seed keeps quantile-of-nothing = NULL."""
    nullgrp = spark.sql("SELECT 'g1' AS g, CAST(NULL AS BINARY) AS kll_sketch")
    out = kll_rollup_quantiles(nullgrp, ["g"], [0.5]).collect()
    assert [(r.g, r.q_5) for r in out] == [("g1", None)]


def test_cms_estimate_geometry_mismatch_raises(spark):
    """Round-8 hunt: probing with a different width than the build
    addresses counters the item never incremented, so the min can
    UNDER-estimate — silently breaking the overestimate-only guarantee.
    The build embeds (depth, width) as column metadata; estimate resolves
    omitted params from it and rejects conflicting explicit ones."""
    import pytest

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "tok string")
    cms = cms_build(df, "tok", depth=3, width=2048)
    items = df.select("tok").distinct()
    # omitted params resolve from metadata (no stale 4/1024 defaults)
    est = {r.tok: r.est for r in cms_estimate(cms, items, "tok").collect()}
    assert est["a"] >= 2 and est["b"] >= 1
    with pytest.raises(ValueError, match="UNDER-estimate"):
        cms_estimate(cms, items, "tok", depth=3, width=1024)
    with pytest.raises(ValueError, match="geometry mismatch"):
        cms_merge(cms, cms_build(df, "tok", depth=3, width=64))


def test_cms_partial_metadata_raises_not_skips(spark):
    """Round-9 ADVICE: a sketch carrying only ONE of (cms_depth, cms_width)
    — reachable via a hand-built sketch propagated through cms_merge's
    per-key metadata copy — used to skip the conflict check entirely when
    only cms_width was present (a disagreeing caller depth sailed through),
    and to raise SPURIOUSLY (width != None) when only cms_depth was. The
    pair is now validated atomically: partial metadata is an error."""
    import pytest

    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a",), ("b",)], "tok string")
    cms = cms_build(df, "tok", depth=3, width=64)
    items = df.select("tok").distinct()
    for partial in ({"cms_depth": 3}, {"cms_width": 64}):
        crippled = cms.select(
            "row", "bucket", F.col("cnt").alias("cnt", metadata=partial)
        )
        with pytest.raises(ValueError, match="partial"):
            cms_estimate(crippled, items, "tok", depth=3, width=64)


def test_bloom_geometry_mismatch_raises_and_metadata_resolves(spark):
    """bloom_build embeds (n_bits, k) as column metadata (round-9 review):
    a probe with conflicting explicit geometry raises — a silent mismatch
    moves probe positions and turns true members into FALSE NEGATIVES, the
    one error a Bloom filter promises never to make — and an omitted
    geometry resolves from the metadata instead of stale defaults."""
    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    df = spark.createDataFrame([("a",), ("b",)], ["x"])
    bloom = bloom_build(df, "x", n_bits=1 << 10, k=3)
    with pytest.raises(ValueError, match="FALSE NEGATIVES"):
        bloom_might_contain(bloom, df, "x", n_bits=1 << 23, k=3)
    # metadata-resolved probe: every built member must hit
    probed = bloom_might_contain(bloom, df, "x")
    assert all(r.might_contain for r in probed.collect())


def test_cms_merge_partial_metadata_raises_atomically(spark):
    """A sketch carrying only ONE of (cms_depth, cms_width) must fail AT
    THE MERGE, not propagate into the merged sketch and fail at a later
    estimate far from the cause (round-9 review)."""
    from pyspark.sql import functions as F

    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        cms_build,
        cms_merge,
    )

    df = spark.createDataFrame([("a",)], ["x"])
    good = cms_build(df, "x", depth=2, width=8)
    partial = good.select(
        "row", "bucket", F.col("cnt").alias("cnt", metadata={"cms_depth": 2})
    )
    with pytest.raises(ValueError, match="partial"):
        cms_merge(good, partial)


def test_theta_rollup_lgk_mismatch_raises_and_metadata_resolves(spark):
    """theta_partial embeds lg_nom_entries; a rollup with a SMALLER value
    would silently cap precision the partials paid state for — explicit
    conflicts raise, omitted values resolve from metadata (round-9
    review)."""
    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        theta_partial,
        theta_rollup,
    )

    df = spark.createDataFrame([("g", i) for i in range(50)], ["g", "u"])
    partials = theta_partial(df, ["g"], "u", lg_nom_entries=14)
    with pytest.raises(ValueError, match="lg_nom_entries=14"):
        theta_rollup(partials, ["g"], lg_nom_entries=12)
    est = theta_rollup(partials, ["g"]).collect()[0].distinct_est
    assert abs(est - 50) <= 2


def test_kll_rollup_handles_quoted_column_names(spark):
    """_fold_binary backtick-quotes the sketch identifier: a column name
    with a space previously failed to parse inside the reduce() expr while
    the surrounding DataFrame API accepted it (round-9 review)."""
    from pyspark.sql import functions as F

    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        kll_partial,
        kll_rollup_quantiles,
    )

    df = spark.createDataFrame([("g", float(i)) for i in range(100)], ["g", "v"])
    partials = kll_partial(df, ["g"], "v").select(
        "g", F.col("kll_sketch").alias("kll sketch")
    )
    out = kll_rollup_quantiles(partials, ["g"], [0.5], sketch_col="kll sketch")
    assert 30 <= out.collect()[0].q_5 <= 70
