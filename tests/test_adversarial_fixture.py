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
    """Zero-row twin of every table (adversarial_fixture.derive_empty) —
    a first run, a fully-filtered source, or an empty partition must yield
    empty results, not crashes (log2(0) in the LSH plane derivation and
    Spark's no-grand-total-row grouping-set behavior were caught here)."""
    from conftest import SF_SMOKE

    dest = str(tmp_path_factory.mktemp("emptydata"))
    _load_builder().derive_empty(SF_SMOKE, dest)
    return dest


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
    """Hot-key axis (adversarial_fixture.derive_skew): half of events on
    one user and half of orders on one customer — the shape that breaks at
    100 TB (one giant window partition, one giant group, a skewed join
    side); surfaced Spark's double->string scientific notation (round 7)."""
    from conftest import SF_SMOKE

    dest = str(tmp_path_factory.mktemp("skewdata"))
    _load_builder().derive_skew(SF_SMOKE, dest)
    return dest


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


def test_derived_axis_builders(tmp_path):
    """The single-row / all-duplicates / row-order-reversed axes are now
    derived by code, not hand-run steps (round-7 VERDICT #1) — pin each
    builder's defining property so the matrix runner can't silently run a
    no-op axis."""
    import pyarrow.parquet as pq

    from conftest import SF_SMOKE

    b = _load_builder()
    one = str(tmp_path / "one")
    b.derive_single_row(SF_SMOKE, one)
    assert all(
        pq.read_table(f"{one}/{t}.parquet").num_rows == 1 for t in b.TABLES
    )

    dup = str(tmp_path / "dup")
    b.derive_all_duplicates(SF_SMOKE, dup)
    docs = pq.read_table(f"{dup}/documents.parquet")
    embs = pq.read_table(f"{dup}/embeddings.parquet")
    assert len(set(docs.column("text").to_pylist())) == 1
    assert len({tuple(v) for v in embs.column("embedding").to_pylist()}) == 1
    # ids untouched: still the quadratic-pair shape, not one collapsed row
    assert docs.num_rows == pq.read_table(f"{SF_SMOKE}/documents.parquet").num_rows

    rev = str(tmp_path / "rev")
    b.derive_reversed(SF_SMOKE, rev)
    orig = pq.read_table(f"{SF_SMOKE}/orders.parquet").column("o_orderkey").to_pylist()
    got = pq.read_table(f"{rev}/orders.parquet").column("o_orderkey").to_pylist()
    assert got == orig[::-1]


def test_scale_fixture_replica_decorrelation():
    """Round 11 replaced the period-25 Caesar shift with per-replica
    substitution permutations (sf10 needs 100 replicas): the permutations
    must be pairwise distinct AND non-identity over the sf10 range, and
    the embedding sign masks must differ for replicas sharing a rotation
    (r and r+64) so no two replicas carry identical vectors."""
    spec = importlib.util.spec_from_file_location(
        "scale_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools", "scale_fixture.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    perms = [mod._perm(r) for r in range(1, 100)]
    assert len(set(perms)) == 99 and mod._LO not in perms
    s0, s64 = mod._signs(0 + 1, 64), mod._signs(64 + 1, 64)
    assert s0 != s64 and all(mod._signs(r, 64)[0] == -1.0 for r in (1, 64))


def test_corr_fuzz_builder_properties(tmp_path):
    """--corr (round 10) must produce at least one of its referential
    shapes and keep every pinned policy: verbatim-only duplicate parents,
    no re-pointed protected ids, events/embeddings never duplicated."""
    import importlib.util

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "fuzz_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools", "fuzz_fixture.py"),
    )
    ff = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ff)

    from conftest import SF_SMOKE

    def read(d, t):
        p = f"{d}/{t}.parquet"
        return (pq.read_table(p) if os.path.isfile(p)
                else pq.ParquetDataset(p).read())

    saw_shape = 0
    for seed in (9001, 9002, 9003, 9004):
        d = str(tmp_path / f"s{seed}")
        ff.build(SF_SMOKE, d, seed, corr=True)
        ev = read(d, "events")
        rows = list(zip(ev.column("ts").to_pylist(),
                        ev.column("event_id").to_pylist()))
        assert len(rows) == len(set(rows))  # (ts, event_id) total order kept
        base_custs = set(
            pq.read_table(f"{SF_SMOKE}/customer.parquet")
            .column("c_custkey").to_pylist())
        got_custs = read(d, "customer").column("c_custkey").to_pylist()
        assert set(x for x in got_custs if x is not None) <= base_custs
        ords = read(d, "orders").column("o_custkey").to_pylist()
        from collections import Counter

        top = Counter(x for x in ords if x is not None).most_common(1)
        if top and top[0][1] >= len(ords) * 0.4:
            saw_shape += 1  # fanout fired
        if len(got_custs) != len(set(got_custs)):
            saw_shape += 1  # dup parent fired
    assert saw_shape >= 1
