"""Sequence packing invariants: exact-budget sequences, token conservation,
straddling spans, and partitioning-independence of the distributed scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "n_tok"])


def test_budget_exact_and_tokens_conserved(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    out = pack_sequences(_docs(spark, rows), "n_tok", budget=128).cache()

    per_doc = {r["doc_id"]: r["s"] for r in
               out.groupBy("doc_id").agg(F.sum("n_tokens").alias("s")).collect()}
    assert per_doc == dict(rows)  # every token placed exactly once

    per_seq = out.groupBy("seq_id").agg(F.sum("n_tokens").alias("s")).collect()
    last = max(r["seq_id"] for r in per_seq)
    for r in per_seq:
        if r["seq_id"] != last:
            assert r["s"] == 128  # every sequence but the last is full
    # sequences are contiguous from 0
    assert sorted(r["seq_id"] for r in per_seq) == list(range(last + 1))
    out.unpersist()


def test_long_doc_straddles_sequences(spark):
    # one 300-token document alone must span ceil(300/128)=3 sequences
    out = pack_sequences(_docs(spark, [(1, 300)]), "n_tok", budget=128)
    spans = sorted(
        (r["seq_id"], r["seq_offset"], r["n_tokens"], r["is_head"])
        for r in out.collect()
    )
    assert spans == [(0, 0, 128, True), (1, 0, 128, False), (2, 0, 44, False)]


def test_offsets_tile_each_sequence(spark):
    rows = [(i, 1 + (i * 13) % 40) for i in range(300)]
    out = pack_sequences(_docs(spark, rows), "n_tok", budget=64)
    # within a sequence, spans tile [0, fill) with no gaps or overlaps
    for seq, spans in (
        out.groupBy("seq_id")
        .agg(F.sort_array(F.collect_list(F.struct("seq_offset", "n_tokens"))).alias("sp"))
        .collect()
    ):
        pos = 0
        for s in spans:
            assert s["seq_offset"] == pos
            pos += s["n_tokens"]
        assert pos <= 64


def test_partitioning_independent(spark):
    rows = [(i, 5 + i % 23) for i in range(500)]
    df = _docs(spark, rows)
    a = pack_sequences(df.repartition(1), "n_tok", budget=100)
    b = pack_sequences(df.repartition(17, "doc_id"), "n_tok", budget=100)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zero_and_negative_budget_rejected(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, 5)]), "n_tok", budget=0)


def test_empty_and_zero_token_docs_dropped(spark):
    out = pack_sequences(_docs(spark, [(1, 0), (2, 10)]), "n_tok", budget=8)
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_is_head_once_per_doc(spark):
    rows = [(i, 50 + i) for i in range(100)]
    out = pack_sequences(_docs(spark, rows), "n_tok", budget=64)
    heads = out.filter("is_head").groupBy("doc_id").count().collect()
    assert len(heads) == 100 and all(r["count"] == 1 for r in heads)


# ---------------------------------------------------------------------------
# Property: packing invariants under arbitrary token multisets
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_tok_lists = st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(toks=_tok_lists, budget=st.integers(min_value=1, max_value=97))
def test_packing_properties(spark, toks, budget):
    rows = [(i, t) for i, t in enumerate(toks)]
    out = pack_sequences(_docs(spark, rows), "n_tok", budget=budget).collect()
    total = sum(t for _, t in rows if t > 0)
    # token conservation
    assert sum(r["n_tokens"] for r in out) == total
    # per-sequence fill: exactly budget everywhere except possibly the last
    fill: dict[int, int] = {}
    for r in out:
        assert 0 < r["n_tokens"] <= budget
        assert 0 <= r["seq_offset"] < budget
        fill[r["seq_id"]] = fill.get(r["seq_id"], 0) + r["n_tokens"]
    if fill:
        last = max(fill)
        assert sorted(fill) == list(range(last + 1))
        assert all(v == budget for s, v in fill.items() if s != last)
        assert fill[last] == total - budget * last


def test_packing_null_id_rows_not_lost(spark):
    # NULL doc_id used to hash to a NULL shard: its tokens shifted every
    # offset but the inner offset join dropped the row — silent token loss
    # plus a hole in the packed stream.
    rows = spark.createDataFrame(
        [(None, 10), (1, 10), (2, 5)], "doc_id long, n_tok long"
    )
    out = pack_sequences(rows, "n_tok", budget=8).collect()
    assert sum(r["n_tokens"] for r in out) == 25  # token conservation incl. NULL
    fill: dict[int, int] = {}
    for r in out:
        fill[r["seq_id"]] = fill.get(r["seq_id"], 0) + r["n_tokens"]
    last = max(fill)
    assert sorted(fill) == list(range(last + 1))  # no holes
    assert all(v == 8 for s, v in fill.items() if s != last)
