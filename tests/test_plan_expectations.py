"""Physical-plan regression tests: each family's representative query must
keep its scale-critical plan property (see docs/EXPLAIN_AUDIT.md). A
regression here is a performance bug even when results stay correct."""

from __future__ import annotations

import pytest

from nursing_home_data_etl_pipeline_spark.plans import catalog


def _plan(spark, name, sf_dir) -> str:
    """Operator tree only (formatted explain repeats each node in the
    details section, which would double node counts) + scan details."""
    df = catalog.entries()[name].spark(spark, sf_dir)
    jvm = spark._jvm
    full = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = full.split("\n\n")[0]
    details = "\n".join(
        line for line in full.splitlines() if "PushedFilters" in line
    )
    return tree + "\n" + details


EXPECTATIONS = [
    ("filter_name_projection", lambda p: "GreaterThan(l_discount,0.05)" in p and "PushedFilters" in p),
    ("left_join_enrich", lambda p: p.count("BroadcastHashJoin") == 2 and "SortMergeJoin" not in p),
    ("pricing_summary", lambda p: p.count("HashAggregate") == 2),
    ("topk_global_grouped", lambda p: "WindowGroupLimit" in p and "TakeOrderedAndProject" in p),
    ("manifest_anti_join", lambda p: "LeftAnti" in p and "Broadcast" in p),
    ("similarity_topk", lambda p: "Broadcast" in p),
    ("shipping_priority_q3", lambda p: "TakeOrderedAndProject" in p),
    ("chunk_documents", lambda p: "Exchange" not in p),
    # The ntile offset join and the ranks join both broadcast their tiny
    # side (r11 #3: offs aliased _bk2 so neither degrades to SortMergeJoin
    # via an ambiguous self-join condition).
    ("window_rank_values", lambda p: p.count("BroadcastHashJoin") == 2 and "SortMergeJoin" not in p),
]


@pytest.mark.parametrize("name,check", EXPECTATIONS, ids=[n for n, _ in EXPECTATIONS])
def test_plan_property(spark, sf_dir, name, check):
    assert check(_plan(spark, name, sf_dir)), f"plan property regressed for {name}"


# ---------------------------------------------------------------------------
# Round-6 pinned shapes (previously prose-only in docs/EXPLAIN_AUDIT.md)
# ---------------------------------------------------------------------------

from _plan_utils import (  # noqa: E402
    full_plan_of as _full_plan_of,
    single_partition_exchanges_fed_by_aggregate as _single_partition_exchanges_fed_by_aggregate,
)


def test_packing_no_global_window(spark, sf_dir):
    """pack_training_sequences: the corpus-sized prefix-sum window hash-
    partitions by _shard; the only single-partition stage is the shard-count
    cumsum downstream of the tiny aggregate."""
    from nursing_home_data_etl_pipeline_spark.plans import catalog

    full = _full_plan_of(
        catalog.entries()["pack_training_sequences"].spark(spark, sf_dir)
    )
    assert "windowspecdefinition(_shard" in full
    assert _single_partition_exchanges_fed_by_aggregate(full), full.split("\n\n")[0]


def test_q18_big_key_semi_join_broadcasts(spark, sf_dir):
    """tpch_shapes: Q18's big-order key set rides a broadcast LEFT SEMI into
    orders (the only explicit broadcast hint in that branch)."""
    from nursing_home_data_etl_pipeline_spark.plans import catalog

    full = _full_plan_of(
        catalog.entries()["tpch_shapes_q4_q13_q18"].spark(spark, sf_dir)
    )
    assert "BroadcastHashJoin LeftSemi BuildRight" in full


#: Queries whose physical plan legitimately contains a
#: BroadcastNestedLoopJoin: each broadcasts a BOUNDED tiny side (the 20-row
#: query batch in brute-force top-k / IVF cell scoring at similarity.py:92,
#: 444 and the IVF cell scoring in plans/queries_tail.py, the 1-row
#: corpus count in TF-IDF there too, the quantile boundary row set in
#: quantile_bands, the 1-row ntile bucket-boundary array in
#: window_rank_values), so the "nested loop" is a map-side constant join —
#: the intended physical op, not a scale risk.
_BNLJ_ALLOWED = {
    "quantile_bands",
    "similarity_topk",
    "tfidf_terms",
    "similarity_ann_ivf",
    "window_rank_values",
}


def test_no_unbounded_join_strategies_anywhere(spark, sf_dir):
    """Blanket scale-safety invariant over EVERY batch catalog entry: no
    CartesianProduct in any physical plan, and BroadcastNestedLoopJoin only
    in the documented bounded-broadcast cases above. Catches a join
    condition silently degrading out of the equi-join path (e.g. a refactor
    turning a key equality into an expression Spark can't hash on) — a
    correctness-invisible change that becomes a corpus x corpus product at
    scale. Streaming entries are excluded: executing them drains real
    streams, and their returned frame is a drained in-memory table whose
    plan is a LocalTableScan anyway."""
    offenders = {}
    for name, e in catalog.entries().items():
        if name.startswith("streaming"):
            continue
        plan = e.spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [
            n
            for n in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if n in plan
        ]
        if "CartesianProduct" in hits or (hits and name not in _BNLJ_ALLOWED):
            offenders[name] = hits
    assert not offenders, f"unbounded join strategies appeared: {offenders}"


def test_bloom_probe_chain_has_no_probed_side_exchange(spark, sf_dir):
    """The Bloom probe path (decontaminate_corpus's bloom branch): k chained
    BroadcastHashJoins of the bitmap against the corpus, ZERO hash-partition
    exchange of the probed side anywhere."""
    from pyspark.sql import functions as F

    from nursing_home_data_etl_pipeline_spark.functions.sketches import (
        bloom_might_contain,
    )
    from nursing_home_data_etl_pipeline_spark.functions.text import fingerprint
    from nursing_home_data_etl_pipeline_spark.sources.readers import read_table

    k = 5
    corpus = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", fingerprint(F.col("text")).alias("_fp")
    )
    bitmap = spark.createDataFrame(
        [(i, (1 << (i % 60)) | 1) for i in range(1024)], "word long, bits long"
    )
    probed = bloom_might_contain(bitmap, corpus, "_fp", n_bits=1 << 16, k=k)
    full = _full_plan_of(probed.filter(~F.col("might_contain")))
    assert "Exchange hashpartitioning" not in full, full.split("\n\n")[0]
    tree = full.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == k


def test_q5_scans_are_column_pruned(spark, sf_dir):
    """regional_revenue_q5: the one unavoidable large-large join must
    exchange projections, not tables — the q5 branch's lineitem scan reads
    exactly its 3 needed columns and orders exactly its 2 join keys (the
    pre-reorder shape joined full lineitem x full orders before the
    broadcast reduction ever applied)."""
    from nursing_home_data_etl_pipeline_spark.plans import catalog

    df = catalog.entries()["regional_revenue_q5"].spark(spark, sf_dir)
    jvm = spark._jvm
    full = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    schemas = [
        line.split("ReadSchema:")[1].strip()
        for line in full.splitlines()
        if "ReadSchema" in line
    ]
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in schemas
    assert "struct<o_orderkey:bigint,o_custkey:bigint>" in schemas


def test_segmented_windows_have_no_per_key_flat_window(spark, sf_dir, monkeypatch):
    """round-13 #1: above the size threshold, the window-family queries'
    per-key sequential windows are rewritten two-level — every window over
    the hot key must also partition by the segment column, so no single
    task ever holds one key's whole history. (The _pb_*-partitioned
    windows scan only the keys x segments totals table.)"""
    import re

    from nursing_home_data_etl_pipeline_spark.operators import ids

    monkeypatch.setattr(ids, "_estimated_size_bytes", lambda df: 1 << 60)
    p = _full_plan_of(catalog.entries()["window_running_sum"].spark(spark, sf_dir))
    assert "_seg" in p
    assert not re.findall(r"windowspecdefinition\(l_suppkey#\d+L?, (?!_seg)", p)
    p = _full_plan_of(catalog.entries()["events_lag_debounce"].spark(spark, sf_dir))
    assert not re.findall(
        r"windowspecdefinition\(user_id#\d+L?, (?!event_type#\d+, _seg|_seg)", p
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
