"""Adversarial-input oracle gate: the driver fixture is benign (no NULL
keys, no blank/unicode text, no zero-norm vectors, no tied or NULL
timestamps), and every latent round-5/6 defect lived in exactly those input
classes. tools/adversarial_fixture.py manufactures them; this test re-runs
the oracle comparison over the mutated fixture for the queries that class
of input can reach.

The streaming drains and the heaviest batch queries are exercised by the
same gate via ``python tools/adversarial_fixture.py && python
tools/check_correctness.py /tmp/advdata`` (kept out of the suite for
runtime); this in-suite subset pins the cheap, formerly-failing ones.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nursing_home_data_etl_pipeline_spark.plans import catalog  # noqa: E402
from nursing_home_data_etl_pipeline_spark.plans.verify import (  # noqa: E402
    compare_query,
    duckdb_connection,
)


def _load_builder():
    spec = importlib.util.spec_from_file_location(
        "adversarial_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools", "adversarial_fixture.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from conftest import SF_SMOKE

    dest = str(tmp_path_factory.mktemp("advdata"))
    _load_builder().build(SF_SMOKE, dest)
    return dest


# Queries that adversarial rows can reach, cheap enough for the suite.
# Each was RED on this gate before the round-6 hardening: zero-norm
# crashes, NULL-ordering divergence, blank-text semantics, byte-vs-char
# slicing, '' vs NULL concat keys.
ADV_QUERIES = [
    "similarity_ann_ivf",
    "embedding_near_dup",
    "text_profile",
    "chunk_documents",
    "set_ops_all",
    "window_running_sum",
    "events_lag_debounce",
    "asof_join_events",
    "multimodal_decode",
    "cms_penalty_transform",
    "pack_training_sequences",
]


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_adversarial_oracle_gate(spark, adv_dir, name):
    con = duckdb_connection(adv_dir)
    entry = catalog.entries()[name]
    problems = compare_query(spark, con, entry.spark, entry.oracle, adv_dir)
    assert not problems, f"{name} on adversarial fixture: {problems}"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    """Zero-row twin of every table, schemas byte-identical — the
    empty-input axis: a first run, a fully-filtered source, or an empty
    partition must yield empty results, not crashes (log2(0) in the LSH
    plane derivation and Spark's no-grand-total-row grouping-set behavior
    on empty input were both caught here)."""
    import pyarrow.parquet as pq

    from conftest import SF_SMOKE

    dest = tmp_path_factory.mktemp("emptydata")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        tbl = pq.read_table(f"{SF_SMOKE}/{t}.parquet").slice(0, 0)
        pq.write_table(tbl, str(dest / f"{t}.parquet"))
    return str(dest)


EMPTY_QUERIES = [
    "rollup_cube_summary",   # Spark emits no grand-total row on empty input
    "embedding_near_dup",    # log2(0) guard in the derived plane count
    "similarity_topk",
    "dedup_exact",
    "text_profile",
    "pricing_summary",
    "quantile_bands",
    "pack_training_sequences",
    "training_corpus",
    "asof_join_events",
]


@pytest.mark.parametrize("name", EMPTY_QUERIES)
def test_empty_input_oracle_gate(spark, empty_dir, name):
    con = duckdb_connection(empty_dir)
    entry = catalog.entries()[name]
    problems = compare_query(spark, con, entry.spark, entry.oracle, empty_dir)
    assert not problems, f"{name} on empty fixture: {problems}"


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """Hot-key axis: half of events on one user and half of orders on one
    customer — the shape that breaks at 100 TB (one giant window partition,
    one giant group, a skewed join side) and, in round 7, surfaced Spark's
    double->string scientific notation at a >=1e7 fine total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from conftest import SF_SMOKE

    dest = tmp_path_factory.mktemp("skewdata")
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    hot_cols = {"events": "user_id", "orders": "o_custkey"}
    for t in tables:
        tbl = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        col_name = hot_cols.get(t)
        if col_name and tbl.num_rows:
            col = tbl.column(col_name)
            n = tbl.num_rows
            hot = col[0].as_py()
            vals = [hot] * (n // 2) + col.to_pylist()[n // 2:]
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col_name),
                col_name,
                pa.array(vals, col.type),
            )
        pq.write_table(tbl, str(dest / f"{t}.parquet"))
    return str(dest)


#: Queries whose group/window/join keys the hot keys reach, cheap enough
#: for the suite (the full 50-query skew gate runs out-of-suite per round).
SKEW_QUERIES = [
    "cms_penalty_transform",   # >=1e7 fine total: decimal-rendered strings
    "pricing_summary",
    "window_running_sum",
    "topk_global_grouped",
    "events_lag_debounce",
    "tpch_shapes_q4_q13_q18",  # Q13: order counts under customer skew
]


@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_skew_axis_oracle_gate(spark, skew_dir, name):
    con = duckdb_connection(skew_dir)
    entry = catalog.entries()[name]
    problems = compare_query(spark, con, entry.spark, entry.oracle, skew_dir)
    assert not problems, f"{name} on skew fixture: {problems}"
