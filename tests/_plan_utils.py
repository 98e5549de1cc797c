"""Shared formatted-physical-plan parsing for plan-shape tests (one copy:
the explainString format is fragile, so every test parses it through here)."""

from __future__ import annotations

import re


def full_plan_of(df) -> str:
    """Formatted explain string: operator tree + per-node details."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def single_partition_exchanges_fed_by_aggregate(full: str) -> bool:
    """Every SinglePartition exchange must sit directly on an aggregate (a
    key-cardinality-sized frame) — never on a corpus-sized stage."""
    tree = full.split("\n\n")[0]
    nodes = re.findall(
        r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", full
    )
    lines = tree.splitlines()
    for node in nodes:
        for i, ln in enumerate(lines):
            if f"Exchange ({node})" in ln and "HashAggregate" not in lines[i + 1]:
                return False
    return True
