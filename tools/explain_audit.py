"""Generate docs/EXPLAIN_AUDIT.md: formatted physical plans per family +
the scale property each must exhibit. Re-run after plan-affecting
changes: python tools/explain_audit.py [sf_dir]"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

#: query -> the property a reviewer should find in the plan.
AUDITED = {
    "filter_name_projection": "All predicates in PushedFilters; ReadSchema pruned to the union of filter + projection columns.",
    "left_join_enrich": "Both dimension hops are BroadcastHashJoin — the fact side never shuffles.",
    "pricing_summary": "Partial HashAggregate -> single Exchange -> final HashAggregate under AQE.",
    "topk_global_grouped": "WindowGroupLimit below the shuffle prunes the grouped branch to k rows per partition; global branch is TakeOrderedAndProject (per-partition heaps, no full sort).",
    "manifest_anti_join": "LeftAnti broadcast join: ledger side broadcast, fact side streams.",
    "dedup_near_pairs": "simhash branch: signature build is one explode + one 60-column hash aggregate (conv()-based token hash); band self-join reuses the signature exchange; bit_count verify is row-local. jaccard branch: shingle explode is map-side; the only wide ops are the inverted-index self-join (hot-shingle capped) and the pair aggregate.",
    "similarity_topk": "brute branch: query batch broadcast (BroadcastNestedLoopJoin); corpus side never shuffles. lsh branch: bucket equi-join replaces the cross join.",
    "shipping_priority_q3": "Selective dim filters pushed to scans; filtered customer side broadcast; TakeOrderedAndProject for the top-10.",
    "events_lag_debounce": "At audit scale (below the size threshold) both lag windows hash-partition by the user key; JSON extraction is row-local. Above the threshold (round-13 #1) every window also partitions by the order-consistent _seg column — boundary rows exchange via a keys-x-segments table — pinned in test_segmented_windows_have_no_per_key_flat_window.",
    "chunk_documents": "Map-only: project + generate (explode) with no Exchange anywhere.",
    "asof_join_events": "asof variant: ONE key-shuffle (window over the tagged union); range variant: interval side exploded per bucket then SortMergeJoin/ShuffledHashJoin on (user_id, bucket) — no BroadcastNestedLoopJoin anywhere despite the range predicate.",
    "similarity_ann_ivf": "The only BroadcastNestedLoopJoins are the deliberate 8-row centroid cross products (corpus x cells / queries x cells); the corpus is touched by one hash aggregate (cell assignment) and one BroadcastHashJoin against the nprobe-ranked query batch — never a corpus self-shuffle or corpus-sized nested loop.",
    "pack_training_sequences": "Two-level prefix sum: the corpus-sized window hash-partitions by _shard; the second Window runs over the shard-count aggregate only (tiny single partition); placement comes back via one BroadcastHashJoin — no corpus-sized single-partition Window anywhere.",
    "decontaminate_corpus": "bloom branch: the probed corpus path has ZERO Exchange hashpartitioning — k chained BroadcastHashJoins of the local-relation bitmap, then a broadcast semi/anti refine. lsh branch: benchmark bucket table broadcasts; the training corpus never shuffles.",
    "rollup_cube_summary": "Each grouping branch (rollup/cube/gsets/time rollup) is one scan + one Expand + partial/final HashAggregate pair — a single shuffle per branch; the time branch serves all three resolutions from ONE events scan, no per-level rescan.",
    "approx_stats_events": "cms_hh branch: sketch and candidate list are BroadcastExchanges; the corpus is touched by the one-pass sketch build aggregate and the exact-refine aggregate over the semi-joined sliver — never a corpus self-join.",
    "tpch_shapes_q4_q13_q18": "q4: EXISTS plans as LEFT SEMI with the correlated date bound in the join condition. q13: left outer + two key-sized aggregates. q18: only the tiny big-order key set carries a broadcast hint; AQE picks the orders/customer strategies.",
    # --- round-11 #4 additions: the remaining scale-critical families ---
    "window_rank_values": "No window partitioned by the 3-value status key anywhere: rank/dense_rank/percent_rank come from the ~15-row (status, priority) aggregate broadcast back (BroadcastHashJoin); ntile is the two-level shape — bucket from a broadcast 1-row percentile-bounds array (the one allowed 1-row BroadcastNestedLoopJoin), per-(bucket, status) row_number, offsets re-attached via BroadcastHashJoin on the aliased _bk2 (no SortMergeJoin).",
    "regional_revenue_q5": "The one unavoidable large-large join exchanges projections, not tables: the lineitem scan reads exactly its 3 needed columns (ReadSchema, pinned in test_q5_scans_are_column_pruned); dimension hops are BroadcastHashJoins. The lineitem-orders strategy is AQE's call — broadcast at audit scale, projection exchange at 100 TB.",
    "quantile_bands": "The KLL/exact boundary row set is a broadcast 1-row aggregate (bounded BroadcastNestedLoopJoin); the scored corpus side is touched once and never re-shuffles on a quantile key.",
    "tfidf_terms": "df aggregates the (doc, term)-sized tf relation — no Expand node and no second token-sized shuffle (the round-10 rewrite); the corpus count is a broadcast 1-row aggregate, not a driver count.",
    "dedup_exact": "One aggregate family on the fingerprint — partial + final around a single Exchange, over the union of the text branch and the NULL-text sentinel branch; no self-join of the corpus anywhere.",
    "dedup_clusters": "Pair generation is the banded LSH self-join (only colliding buckets materialize); min-label propagation is a bounded sequence of hash joins over the edge set — no CartesianProduct, no corpus x corpus.",
    "embedding_near_dup": "RHP-LSH: plane count derived from an occupancy aggregate (broadcast), candidate pairs come from the bucket equi-join — the corpus is never nested-loop joined with itself.",
    "stats_aggregates": "Two branches (round-11 split of the sf10 super-linear scaler): the 12 exact-decimal moment sums run as codegen HashAggregate pairs with NO percentile riding along; the exact percentiles run frequency-weighted over a (flag, col, value) HISTOGRAM aggregate — ObjectHashAggregate ingests distinct grid values, not 60M rows — and rejoin via one BroadcastHashJoin.",
    "window_running_sum": "At audit scale: one hash-partitioned running-sum window. Above the size threshold (round-13 #1) the two-level segmented plan runs — local RANGE sums per (key, _seg) plus an exclusive scan of segment totals — so no task ever holds one key's whole history (pinned in test_segmented_windows_have_no_per_key_flat_window).",
    "training_corpus": "End-to-end pipeline keeps each stage's own bound: quality gate is map-only on the scan, LSH dedup is the banded self-join, the representative re-join is key-hashed — no stage shuffles the corpus more than once.",
    "set_ops_all": "Group-count-compare form (round-14 #7): each branch is ONE scan per table and ONE partial/final HashAggregate pair around a single key Exchange — no Generate row replication, no semi/anti chain re-scanning customer 4x and orders 3x, no multiset-sized repeated exchanges like the literal INTERSECT ALL/EXCEPT ALL operators plan.",
    # streaming queries are excluded: entries() drains them, so the returned
    # frame is the memory sink's LocalTableScan, not the streaming plan.
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from nursing_home_data_etl_pipeline_spark.plans import catalog
    from nursing_home_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("explain_audit")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = [
        "# Explain audit",
        "",
        "Formatted physical plans for one representative query per family,",
        f"generated by `python tools/explain_audit.py {sf_dir}`. The line",
        "above each plan states the scale property the plan must exhibit;",
        "regressions here are performance bugs even when results stay correct.",
        "",
    ]
    for name, expectation in AUDITED.items():
        df = catalog.entries()[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        # keep the operator tree + scan details; drop the verbose footer refs
        tree = plan.split("\n\n")[0]
        details = "\n".join(
            line
            for line in plan.splitlines()
            if any(k in line for k in ("PushedFilters", "ReadSchema", "PartitionFilters"))
        )
        out += [
            f"## {name}",
            "",
            f"**Expected:** {expectation}",
            "",
            "```",
            tree.strip(),
            *( [details.strip()] if details.strip() else [] ),
            "```",
            "",
        ]
    import os

    os.makedirs("docs", exist_ok=True)
    with open("docs/EXPLAIN_AUDIT.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/EXPLAIN_AUDIT.md ({len(AUDITED)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
