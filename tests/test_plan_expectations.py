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
]


@pytest.mark.parametrize("name,check", EXPECTATIONS, ids=[n for n, _ in EXPECTATIONS])
def test_plan_property(spark, sf_dir, name, check):
    assert check(_plan(spark, name, sf_dir)), f"plan property regressed for {name}"
