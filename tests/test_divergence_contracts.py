"""Regression gates for the round-7 confirmed engine/oracle divergences:
each test mutates ONE table of the smoke fixture into the exact input class
that used to diverge (reviewer-confirmed by execution) and re-runs the
oracle comparison for the affected query only, so the blast radius of the
crafted input stays local to the pinned contract.
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_SMOKE  # noqa: E402

from nursing_home_data_etl_pipeline_spark.plans import catalog  # noqa: E402
from nursing_home_data_etl_pipeline_spark.plans.verify import (  # noqa: E402
    compare_query,
    duckdb_connection,
)

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _derive(tmp_path, mutate_table: str, mutate):
    """Copy the smoke fixture, applying ``mutate`` to one table."""
    dest = str(tmp_path / "fix")
    os.makedirs(dest)
    for t in _TABLES:
        src = f"{SF_SMOKE}/{t}.parquet"
        if t == mutate_table:
            pq.write_table(mutate(pq.read_table(src)), f"{dest}/{t}.parquet")
        else:
            shutil.copy(src, f"{dest}/{t}.parquet")
    return dest


def _check(spark, sf_dir, name):
    con = duckdb_connection(sf_dir)
    entry = catalog.entries()[name]
    problems = compare_query(spark, con, entry.spark, entry.oracle, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_ivf_null_element_centroid_seed(spark, tmp_path):
    """A NULL element inside a SEED vector (vec_id < 8, correct length)
    previously NULLed the engine's whole-fold d2 against every vector —
    min_by sorted the NULL struct first and the entire corpus collapsed
    into the broken cell — while the oracle's NULL-skipping SUM assigned
    cells by partial distance. Contract: seed slots are valid vectors."""

    def poison_seed(tbl):
        idx = tbl.column("vec_id").to_pylist().index(2)
        emb = tbl.column("embedding").to_pylist()
        emb[idx] = [None if i == 5 else v for i, v in enumerate(emb[idx])]
        return tbl.set_column(
            tbl.schema.get_field_index("embedding"),
            "embedding",
            pa.array(emb, tbl.schema.field("embedding").type),
        )

    d = _derive(tmp_path, "embeddings", poison_seed)
    _check(spark, d, "similarity_ann_ivf")


def test_dedup_null_doc_id_excluded_both_sides(spark, tmp_path):
    """A NULL doc_id row previously made Spark's min_by emit a NULL
    survivor (min_by skips NULL ordering keys) while the oracle emitted
    the md5 fingerprint, and dedup_clusters' oracle USING join dropped the
    row the engine kept as a NULL singleton. Contract: no id, no row."""

    def add_null_id(tbl):
        row = {name: None for name in tbl.schema.names}
        row.update({"text": "an orphan document with no identity",
                    "lang": "en", "n_chars": 35})
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist([row], schema=tbl.schema)]
        )

    d = _derive(tmp_path, "documents", add_null_id)
    _check(spark, d, "dedup_exact")
    _check(spark, d, "dedup_clusters")


@pytest.fixture()
def epoch_events_dir(spark, tmp_path):
    """Events straddling the epoch: a pre-epoch click/purchase pair, a
    click at exactly epoch 0, and a session event in (-gap, 0)."""

    def add_epoch_rows(tbl):
        base = max(x for x in tbl.column("event_id").to_pylist() if x is not None)
        ts = lambda m: datetime.datetime(1969, 12, 31, 23, m)  # noqa: E731
        rows = [
            # pre-epoch click/purchase pair 10 min apart (both must drop
            # from the stream-stream interval join on BOTH sides)
            {"event_id": base + 1, "user_id": 777771, "ts": ts(0),
             "event_type": "click", "value": 1.25, "props": "{}"},
            {"event_id": base + 2, "user_id": 777771, "ts": ts(10),
             "event_type": "purchase", "value": 9.25, "props": "{}"},
            # click at exactly epoch 0: still late (event time <= watermark)
            {"event_id": base + 3, "user_id": 777772,
             "ts": datetime.datetime(1970, 1, 1), "event_type": "click",
             "value": 1.25, "props": "{}"},
            # session event at -10 min: its window END (+20 min) is past the
            # watermark, so Spark KEEPS it and merges it into the post-epoch
            # session — the oracle must not drop it
            {"event_id": base + 4, "user_id": 777773, "ts": ts(50),
             "event_type": "view", "value": 0.25, "props": "{}"},
            {"event_id": base + 5, "user_id": 777773,
             "ts": datetime.datetime(1970, 1, 1, 0, 5), "event_type": "view",
             "value": 0.25, "props": "{}"},
        ]
        typed = []
        for r in rows:
            row = {name: r.get(name) for name in tbl.schema.names}
            typed.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(typed, schema=tbl.schema)]
        )

    return _derive(tmp_path, "events", add_epoch_rows)


def test_interval_join_drops_pre_epoch_pairs(spark, epoch_events_dir):
    _check(spark, epoch_events_dir, "streaming_join_dedup")


def test_session_window_straddles_epoch(spark, epoch_events_dir):
    _check(spark, epoch_events_dir, "streaming_session_counts")


def test_time_rollup_floors_pre_epoch_windows(spark, epoch_events_dir):
    """Pre-epoch timestamps: Spark's window() FLOORS while DuckDB's `//`
    truncates toward zero — they disagree for negative epochs unless the
    oracle uses floored-modulo arithmetic (pinned round 6, prose-only since;
    the epoch fixture's 1969-12-31 rows make the batch time-rollup branch
    exercise it in-suite)."""
    _check(spark, epoch_events_dir, "rollup_cube_summary")


def test_stateful_totals_nan_emits_null_sentinel(spark, tmp_path):
    """The Arrow pandas-worker boundary cannot represent NaN (it IS the
    null sentinel in any dtype): a NaN event value must poison the key's
    SQL SUM — and the poisoned total must EMIT as NULL, mirrored in the
    oracle with an isnan() CASE. An all-NULL-value key totals NULL, not
    0.0 (contract prose in streaming/aggregations.py, previously pinned
    only by unit tests on _accumulate, not engine-vs-oracle)."""

    def add_nan_rows(tbl):
        base = max(x for x in tbl.column("event_id").to_pylist() if x is not None)
        ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
        rows = [
            {"event_id": base + 1, "user_id": 888881, "ts": ts,
             "event_type": "click", "value": 2.5, "props": "{}"},
            {"event_id": base + 2, "user_id": 888881, "ts": ts,
             "event_type": "click", "value": float("nan"), "props": "{}"},
            {"event_id": base + 3, "user_id": 888882, "ts": ts,
             "event_type": "view", "value": None, "props": "{}"},
        ]
        typed = [{name: r.get(name) for name in tbl.schema.names} for r in rows]
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(typed, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "events", add_nan_rows)
    _check(spark, d, "streaming_stateful_totals")


def test_revenue_round_midpoint_exact_decimal(spark, tmp_path):
    """A discounted-revenue SUM landing exactly on a 2-dec midpoint
    (0.50 * (1 - 0.05) = 0.475) used to diverge: Spark ROUNDs the shortest
    repr HALF_UP (0.48) while DuckDB rounds the binary double
    (0.47499999... -> 0.47). The exact-DECIMAL money arithmetic makes both
    engines see the true decimal 0.475 and round it identically — closing
    the one class that was previously excluded by fixture policy for the
    revenue queries (round-8 fuzz: q5/q10/q14 organic hits ~1/1000 groups)."""

    def add_midpoint_group(tbl):
        row = {name: None for name in tbl.schema.names}
        sdate = next(d for d in tbl.column("l_shipdate").to_pylist() if d is not None)
        row.update({"l_orderkey": 777777701, "l_partkey": 1, "l_suppkey": 1,
                    "l_linenumber": 1, "l_quantity": 1.0,
                    "l_extendedprice": 0.50, "l_discount": 0.05, "l_tax": 0.0,
                    "l_returnflag": "M", "l_linestatus": "M",
                    "l_shipdate": sdate})
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist([row], schema=tbl.schema)]
        )

    d = _derive(tmp_path, "lineitem", add_midpoint_group)
    _check(spark, d, "pricing_summary")
    entry = catalog.entries()["pricing_summary"]
    out = {
        (r.l_returnflag, r.l_linestatus): r.sum_disc_price
        for r in entry.spark(spark, d).collect()
    }
    assert out[("M", "M")] == 0.48  # HALF-AWAY-FROM-ZERO on the true decimal


def test_corr_zero_variance_group_nulls(spark, tmp_path):
    """A zero-variance group (constant l_quantity, or constant
    l_extendedprice) used to CRASH the whole stats_aggregates job:
    F.corr's internal Pearson division raises ANSI DIVIDE_BY_ZERO (ANSI is
    on by default in Spark 4), while DuckDB's corr returns NULL for the
    group. The guarded covar/(sx*sy) form divides only when both stddevs
    are nonzero. Round-8 core-operator hunt, reviewer-confirmed by
    execution on both engines."""

    def add_constant_groups(tbl):
        sdate = next(d for d in tbl.column("l_shipdate").to_pylist() if d is not None)
        base = {name: None for name in tbl.schema.names}
        rows = []
        for i, (flag, qty, price) in enumerate([
            ("CQ", 5.0, 100.25), ("CQ", 5.0, 200.25),   # constant quantity
            ("CP", 1.0, 300.25), ("CP", 9.0, 300.25),   # constant price
            ("C1", 4.0, 400.25),                        # single row (sx NULL)
        ]):
            r = dict(base)
            r.update({"l_orderkey": 888888801 + i, "l_partkey": 1,
                      "l_suppkey": 1, "l_linenumber": 1, "l_quantity": qty,
                      "l_extendedprice": price, "l_discount": 0.0,
                      "l_tax": 0.0, "l_returnflag": flag,
                      "l_linestatus": "O", "l_shipdate": sdate})
            rows.append(r)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "lineitem", add_constant_groups)
    _check(spark, d, "stats_aggregates")
    entry = catalog.entries()["stats_aggregates"]
    out = {r.l_returnflag: r.corr_qty_price for r in entry.spark(spark, d).collect()}
    assert out["CQ"] is None and out["CP"] is None and out["C1"] is None


def test_duplicated_document_row_keeps_set_semantics(spark, tmp_path):
    """A VERBATIM duplicated document row (re-ingested file, doubled
    upstream join) must not change near-dup math or cluster membership:
    the shingle table is a per-document SET (round-8 fuzz: per-row shingles
    doubled sizes/doc-freq/intersections, Jaccard reached ~1.95 where the
    oracle said 0.99) and connected-components vertices are a SET of
    identities (cluster_size counted rows; the keep-one filter kept both
    copies)."""

    def dup_docs(tbl):
        rows = [
            i
            for i, (d, t) in enumerate(
                zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
            )
            if d is not None and t and len(t.split()) > 8
        ][:2]
        return pa.concat_tables([tbl] + [tbl.slice(i, 1) for i in rows])

    d = _derive(tmp_path, "documents", dup_docs)
    _check(spark, d, "dedup_near_pairs")
    _check(spark, d, "dedup_clusters")
    _check(spark, d, "training_corpus")


def test_scd2_not_matched_source_row_inserts(spark, tmp_path):
    """merge_scd2 follows SQL MERGE: a source row with no target match
    inserts an open version — including a NULL-key source row, which
    equality never matches (round-8 fuzz: the oracle lacked the
    not-matched-insert branch because clean data's source is a subset of
    the target)."""

    def add_null_key_building(tbl):
        row = {name: None for name in tbl.schema.names}
        row.update({"c_name": "Keyless Building", "c_acctbal": 42.25,
                    "c_mktsegment": "BUILDING"})
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist([row], schema=tbl.schema)]
        )

    d = _derive(tmp_path, "customer", add_null_key_building)
    _check(spark, d, "scd_merge")


def test_sketch_bands_hold_on_gapped_distribution(spark, tmp_path):
    """Sketch accuracy claims are RANK-true, not value-true: one huge
    outlier in a small group makes the approx percentile a data point far
    outside the CONT-interpolated band (round-8 fuzz) — the band check must
    bound by the data values at the band ranks instead."""

    def add_outlier(tbl):
        base = max(x for x in tbl.column("event_id").to_pylist() if x is not None)
        ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
        rows = [
            {"event_id": ((base // 5) + i) * 5, "ts": ts, "user_id": 555550 + i,
             "event_type": "gapped",
             "value": 987654321.25 if i == 9 else 1.25, "props": "{}"}
            for i in range(2, 12)
        ]
        typed = [{name: r.get(name) for name in tbl.schema.names} for r in rows]
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(typed, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "events", add_outlier)
    _check(spark, d, "approx_stats_events")


def test_streaming_dedup_excludes_null_event_id(spark, tmp_path):
    """Identity-less rows are excluded from identity-keyed dedup (minhash
    contract): dropDuplicates folds every NULL key into ONE state-store
    group, collapsing n distinct keyless rows to an arbitrary first arrival
    (round-8 fuzz: +n-1 oracle rows)."""

    def add_null_id_events(tbl):
        ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
        rows = [
            {"event_id": None, "ts": ts, "user_id": 444440 + i,
             "event_type": "keyless", "value": 1.25, "props": "{}"}
            for i in range(3)
        ]
        typed = [{name: r.get(name) for name in tbl.schema.names} for r in rows]
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(typed, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "events", add_null_id_events)
    _check(spark, d, "streaming_join_dedup")


def test_streaming_dedup_collapses_verbatim_duplicate_rows(spark, tmp_path):
    """A VERBATIM duplicate source row (re-delivered event, same id and
    payload) collapses on both sides: the engine's
    dropDuplicatesWithinWatermark keeps the first arrival, the oracle's
    dedup branch is DISTINCT (round-8 fuzz seed 0: the oracle previously
    counted source ROWS, +1 per duplicate). Duplicate ids with DIFFERING
    payloads stay excluded by fixture policy — the engine's survivor is
    arrival-order-dependent, unmirrorable in SQL."""

    def dup_one_event(tbl):
        i = next(
            k
            for k, (eid, ts) in enumerate(
                zip(tbl.column("event_id").to_pylist(), tbl.column("ts").to_pylist())
            )
            if eid is not None and ts is not None and ts.year >= 2000
        )
        return pa.concat_tables([tbl, tbl.slice(i, 1)])

    d = _derive(tmp_path, "events", dup_one_event)
    _check(spark, d, "streaming_join_dedup")


def test_window_tiebreak_null_secondary_key_nulls_first(spark, tmp_path):
    """A NULL o_orderkey row TIED with an existing row on every prior sort
    key: the secondary ASC tiebreaker defaults NULLS FIRST in Spark but
    NULLS LAST in DuckDB, flipping first/last/nth_value picks unless the
    oracle pins NULLS FIRST on EVERY ORDER BY column (the phase-6
    adversarial row, previously out-of-suite only — and silently absent
    until round 8 fixed its append-after-write)."""

    def add_tied_null_key(tbl):
        custkey = next(x for x in tbl.column("o_custkey").to_pylist() if x is not None)
        i = tbl.column("o_custkey").to_pylist().index(custkey)
        peer = {name: tbl.column(name)[i].as_py() for name in tbl.schema.names}
        peer["o_orderkey"] = None  # ties with row i on date AND price
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist([peer], schema=tbl.schema)]
        )

    d = _derive(tmp_path, "orders", add_tied_null_key)
    _check(spark, d, "window_rank_values")
    _check(spark, d, "topk_global_grouped")


def test_levenshtein_codepoint_fold_non_ascii(spark, tmp_path):
    """Spark's levenshtein counts CODE POINTS, DuckDB's counts BYTES
    ('顧客' vs 'xy' = 2 in Spark, 6 in DuckDB). Contract: fold every
    non-ASCII code point to '?' on both sides before the distance. The
    adversarial fixture's unicode customer sits ABOVE string_similarity's
    id_a < 200 window, so this class was exercised nowhere until now."""

    def unicode_low_key(tbl):
        ids = tbl.column("c_custkey").to_pylist()
        i = next(k for k, v in enumerate(ids) if v is not None and v < 199)
        names = tbl.column("c_name").to_pylist()
        names[i] = "Ünïcode Çustomer 顧客"
        return tbl.set_column(
            tbl.schema.get_field_index("c_name"),
            "c_name",
            pa.array(names, tbl.schema.field("c_name").type),
        )

    d = _derive(tmp_path, "customer", unicode_low_key)
    _check(spark, d, "string_similarity")


def test_tfidf_whitespace_only_doc_no_phantom_terms(spark, tmp_path):
    """A whitespace-only document previously contributed tf rows for
    term='' on both engines (agreeing but semantically wrong); the shared
    words()/duck_words_sql tokenizer emits no tokens for it."""

    def add_blank_doc(tbl):
        row = {name: None for name in tbl.schema.names}
        row.update({"doc_id": 777770, "text": " \t\n ", "lang": "en",
                    "n_chars": 4})
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist([row], schema=tbl.schema)]
        )

    d = _derive(tmp_path, "documents", add_blank_doc)
    _check(spark, d, "tfidf_terms")
    entry = catalog.entries()["tfidf_terms"]
    out = entry.spark(spark, d)
    assert out.filter("term = '' OR doc_id = 777770").count() == 0


def test_trim_twins_are_space_only(spark, tmp_path):
    """DuckDB's bare ``trim()`` strips the whole Unicode Zs category
    (NBSP U+00A0, IDEOGRAPHIC SPACE U+3000, ...) while Spark's ``F.trim``
    strips ASCII SPACE only — an NBSP-only document fingerprinted to
    md5('') on the oracle side but md5 of the NBSPs on the engine side,
    and chunk_documents dropped it entirely (round-8 probe, confirmed by
    execution). Every oracle mirroring F.trim now space-trims via
    ``duck_trim_sql``; these docs must round-trip every text twin."""

    def add_unicode_space_docs(tbl):
        rows = []
        for i, text in enumerate(
            ["\u00a0\u00a0", "\u3000ideographic\u3000space\u3000",
             "zero\u200bwidth words", "nbsp\u00a0joined words"]
        ):
            row = {name: None for name in tbl.schema.names}
            row.update({"doc_id": 777780 + i, "text": text, "lang": "en",
                        "n_chars": len(text)})
            rows.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "documents", add_unicode_space_docs)
    for q in ("text_profile", "dedup_exact", "chunk_documents",
              "collection_functions"):
        _check(spark, d, q)


def test_cms_trim_twin_keeps_nbsp_padding(spark, tmp_path):
    """cms_clean_project's whole-row trim mirrors F.trim (space-only):
    an NBSP-padded customer name must keep its padding on BOTH sides —
    the oracle's former bare TRIM stripped it (same round-8 class)."""

    def nbsp_pad_name(tbl):
        i = tbl.column("c_custkey").to_pylist().index(
            max(x for x in tbl.column("c_custkey").to_pylist()
                if x is not None)
        )
        names = tbl.column("c_name").to_pylist()
        names[i] = "\u00a0padded name\u00a0"
        return tbl.set_column(
            tbl.schema.get_field_index("c_name"),
            "c_name",
            pa.array(names, tbl.schema.field("c_name").type),
        )

    d = _derive(tmp_path, "customer", nbsp_pad_name)
    _check(spark, d, "cms_clean_project")
    _check(spark, d, "cms_quality_transform")


def test_final_sigma_case_folding_policy(spark, tmp_path):
    """FIXTURE-POLICY pin (unmirrorable in SQL): Java's toLowerCase is
    context-sensitive for Greek capital sigma — word-final Σ lowercases
    to FINAL sigma ς in Spark, while DuckDB's utf8proc simple-maps every
    Σ to σ. RE2 cannot express the Final_Sigma condition (needs
    lookahead), so word-final Σ stays excluded from oracle-gated text,
    alongside the İ/ß/ligature exclusions in functions/text.py. This test
    pins the DIRECTION of the divergence on both engines so a drift on
    either side (e.g. a Spark collation change) surfaces here."""
    import duckdb

    from pyspark.sql import functions as F

    row = spark.range(1).select(
        F.lower(F.lit("ΣΊΣΥΦΟΣ")).alias("lo")
    ).collect()[0]
    assert row.lo == "σίσυφος"  # final ς

    con = duckdb.connect()
    (duck,) = con.execute(
        "SELECT lower('ΣΊΣΥΦΟΣ')"
    ).fetchone()
    con.close()
    assert duck == "σίσυφοσ"  # plain σ


def test_packing_duplicate_null_ids_pack_deterministically(spark, tmp_path):
    """Two NULL-doc_id documents hash to the SAME shard (one NULL
    sentinel) and tied on the packing order (shard, doc_id) alone — which
    physical row received which span was partition-order-dependent on both
    engines (fuzz seed 435). The token count is now the deterministic
    tiebreaker, mirrored in the oracle's flat window."""

    def add_null_id_docs(tbl):
        rows = []
        for text in ("eleven words here to fill out the first null doc x",
                     "a second null identity document with a different "
                     "word count for the tie"):
            row = {name: None for name in tbl.schema.names}
            row.update({"text": text, "lang": "en", "n_chars": len(text)})
            rows.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "documents", add_null_id_docs)
    _check(spark, d, "pack_training_sequences")


def test_multimodal_ids_exact_past_2_53_with_null_ids(spark, tmp_path):
    """mapInPandas converted a nullable int64 id batch to float64 — one
    NULL doc_id anywhere in the Arrow batch and every id in it rode a
    double, so 9007199254740993 (2^53 + 1) came back ...992 while the
    DuckDB oracle kept it exact (round-8 review, execution-confirmed).
    decode_fake now runs over mapInArrow with the id column passed through
    as an Arrow int64 array — exact at any magnitude."""
    BIG = 9007199254740993  # 2^53 + 1: not representable in float64

    def add_big_and_null_ids(tbl):
        rows = []
        for doc_id, text in ((BIG, "precision probe text"),
                             (None, "null identity neighbor")):
            row = {name: None for name in tbl.schema.names}
            row.update({"doc_id": doc_id, "text": text, "lang": "en",
                        "n_chars": len(text)})
            rows.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "documents", add_big_and_null_ids)
    _check(spark, d, "multimodal_decode")
    entry = catalog.entries()["multimodal_decode"]
    big = entry.spark(spark, d).filter(f"doc_id = {BIG}").collect()
    assert len(big) == 1 and big[0].doc_id == BIG


def test_session_gap_boundary_merges_inclusively(spark, tmp_path):
    """An event arriving at EXACTLY last + gap (30:00) merges into the
    running session — Spark's session_window extends inclusively — so the
    oracle must split on strictly-greater gaps only. An earlier oracle
    split on >= (asserted half-open semantics that were never exercised:
    no fixture had an exact-gap pair). Round-8 second-pass hunt,
    execution-confirmed: a 12:00/12:30 pair came back as ONE session."""

    def add_exact_gap_chain(tbl):
        rows = []
        for i, ts in enumerate([
            datetime.datetime(2024, 6, 1, 9, 0, 0),
            datetime.datetime(2024, 6, 1, 9, 30, 0),        # exactly +gap
            datetime.datetime(2024, 6, 1, 10, 0, 0),        # exactly +gap
            datetime.datetime(2024, 6, 1, 10, 30, 0, 1),    # gap + 1 us
        ]):
            row = {name: None for name in tbl.schema.names}
            row.update({"event_id": 888888900 + i, "ts": ts,
                        "user_id": 777002, "event_type": "click",
                        "value": 1.25, "props": "{}"})
            rows.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "events", add_exact_gap_chain)
    _check(spark, d, "streaming_session_counts")
    entry = catalog.entries()["streaming_session_counts"]
    sessions = entry.spark(spark, d).filter("user_id = 777002").collect()
    # 3-chain at exact gaps = ONE session; the +1us event starts a second
    assert sorted(r.n_events for r in sessions) == [1, 3]


def test_scd2_duplicate_key_target_classifies_per_row(spark, tmp_path):
    """merge_scd2 joins each target row to the source independently (one
    source row matching many target rows is legal SQL MERGE), so a
    duplicate-key target with one changed and one source-identical copy
    emits closed+new for the first AND carries the second forward. The
    oracle's former key-level NOT EXISTS dropped the carry (round-8
    second-pass hunt, execution-confirmed: spark=314 vs oracle=313)."""

    def add_scd_twins(tbl):
        top = max(x for x in tbl.column("c_custkey").to_pylist()
                  if x is not None)
        key = top + 2 + (top % 2)  # even: src2 shifts BUILDING bal +1000
        rows = []
        for name, bal, seg in (("SCD Twin A", 100.25, "BUILDING"),
                               ("SCD Twin B", 1100.25, "MACHINERY")):
            row = {name_: None for name_ in tbl.schema.names}
            row.update({"c_custkey": key, "c_name": name,
                        "c_nationkey": 1, "c_acctbal": bal,
                        "c_mktsegment": seg})
            rows.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "customer", add_scd_twins)
    _check(spark, d, "scd_merge")


def test_portable_round_matches_duckdb_on_repr_midpoints(spark):
    """F.round re-parses a double's SHORTEST DECIMAL REPR and HALF_UPs the
    string; DuckDB ROUND rounds the binary value — count-derived ratios
    like 41/640 (= 0.0640625 in decimal, below the midpoint in binary)
    rounded to 0.064063 vs 0.064062 (round-8 hunt, failed
    dedup_near_pairs and embedding_near_dup on policy-legal input). Every
    rounded count/count or dot/norm ratio now goes through
    round_half_away / duck_round_sql — identical IEEE primitive ops on
    the identical double. This pins their parity on the nasty cases."""
    import duckdb

    from pyspark.sql import functions as F

    from nursing_home_data_etl_pipeline_spark.functions.vectors import (
        duck_round_sql,
        round_half_away,
    )

    cases = [41 / 640, 323 / 640, 333 / 640, 1 / 3, 2 / 3, 0.0640625,
             -41 / 640, 0.1234565, -0.0000005, 0.9999995, 1.0, 0.0,
             5e-7, -5e-7,
             # round-9 ADVICE: |x|*10^6 >= 2^63 used to ANSI-overflow-abort
             # Spark's long floor while DuckDB's double floor succeeded —
             # both twins now pass these through unrounded, identically
             9.3e16, -9.3e16, 1e13, -1e13, 9e12]
    row = spark.range(1).select(
        *[round_half_away(F.lit(c)).alias(f"c{i}") for i, c in enumerate(cases)]
    ).collect()[0]
    con = duckdb.connect()
    duck = con.execute(
        "SELECT " + ", ".join(
            # CAST: a bare literal parses as DECIMAL in DuckDB (its *1e6
            # overflows DECIMAL(18)); real oracle exprs are always DOUBLE
            duck_round_sql(f"CAST({c!r} AS DOUBLE)") for c in cases
        )
    ).fetchone()
    con.close()
    for i, c in enumerate(cases):
        assert row[i] == duck[i], f"case {c!r}: spark={row[i]} duck={duck[i]}"


def test_count_ratio_midpoints_round_portably(spark, tmp_path):
    """Averages and percent_rank are COUNT-DERIVED ratios: 640 rows whose
    quantities sum to 41 make avg = 41/640 = 0.0640625 — the exact shape
    where F.round (shortest-repr HALF_UP) and DuckDB ROUND (binary) split
    at the 7th decimal (round-8 second-pass hunt; no fixture policy can
    exclude ratios of counts). pricing_summary, group_having_conditional,
    window_rank_values, and events_lag_debounce now round these through
    the portable pair; this drives the crafted 41/640 group through the
    worst one."""

    def add_midpoint_group(tbl):
        sdate = next(d for d in tbl.column("l_shipdate").to_pylist()
                     if d is not None)
        rows = []
        for i in range(640):
            row = {name: None for name in tbl.schema.names}
            row.update({
                "l_orderkey": 888889000 + i, "l_partkey": 1, "l_suppkey": 1,
                "l_linenumber": 1,
                # 41 = 40 zeros + one 41.0 -> integer-exact decimal sum
                "l_quantity": 41.0 if i == 0 else 0.0,
                "l_extendedprice": 100.25, "l_discount": 0.0, "l_tax": 0.0,
                "l_returnflag": "ZQ", "l_linestatus": "ZQ",
                "l_shipdate": sdate,
            })
            rows.append(row)
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist(rows, schema=tbl.schema)]
        )

    d = _derive(tmp_path, "lineitem", add_midpoint_group)
    _check(spark, d, "pricing_summary")
    entry = catalog.entries()["pricing_summary"]
    row = [r for r in entry.spark(spark, d).collect()
           if r.l_returnflag == "ZQ"][0]
    assert row.avg_qty == 0.064062  # binary value is BELOW the midpoint


def test_exact_dedup_verbatim_null_text_copies_collapse(spark, tmp_path):
    """Verbatim re-delivered copies of a NULL-text row (same doc_id, text
    NULL — an all-NULL text column under duplicated doc rows, round-9
    shape fuzz seeds 2093/2094) collapse to ONE row on the engine side:
    the NULL-text pass-through rides a per-IDENTITY sentinel group
    (chr(0)-prefixed id), the same re-delivery rule as streaming
    dedup-by-id. The oracle's pass-through branch now SELECTs DISTINCT;
    it previously emitted one row per physical copy."""

    def dup_null_text_rows(tbl):
        texts = tbl.column("text").to_pylist()
        texts[0] = texts[1] = None  # two distinct ids, NULL text
        i = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(i, "text", pa.array(texts, pa.string()))
        # duplicate both NULL-text rows verbatim (and one non-NULL row,
        # which must keep collapsing through the fingerprint group)
        return pa.concat_tables([tbl, tbl.slice(0, 3)])

    d = _derive(tmp_path, "documents", dup_null_text_rows)
    _check(spark, d, "dedup_exact")


def test_topk_global_ordering_total_under_duplicate_keys(spark, tmp_path):
    """An all-NULL o_totalprice column plus a duplicated orders row whose
    copy differs only in o_custkey (round-9 shape fuzz seed 2028) ties the
    old (totalprice DESC, orderkey) global ordering for every row — which
    copy got which rank (and which crossed the LIMIT boundary) was
    engine-order-dependent. Contract: the global top-k ordering is TOTAL
    over the output projection (custkey is the final tiebreaker)."""

    def degenerate_orders(tbl):
        n = tbl.num_rows
        i = tbl.schema.get_field_index("o_totalprice")
        tbl = tbl.set_column(i, "o_totalprice", pa.nulls(n, pa.float64()))
        dup = tbl.slice(0, 1).to_pylist()[0]
        dup["o_custkey"] = 999_999_123  # same orderkey, different custkey
        return pa.concat_tables(
            [tbl, pa.Table.from_pylist([dup], schema=tbl.schema)]
        )

    d = _derive(tmp_path, "orders", degenerate_orders)
    _check(spark, d, "topk_global_grouped")


def test_decimal_to_double_cast_routes_through_varchar(spark):
    """Round-11 fuzz seed 5284: casting a DECIMAL sum whose unscaled
    integer exceeds 2^53 directly to DOUBLE can differ by one ulp between
    engines (DuckDB double-rounds via unscaled/10^scale; Java converts
    once) — invisible until a duplicate-row group's true variance is 0 and
    the ulp becomes the entire answer (sd 0.0014 vs 0.0). Contract: every
    moment-sum cast in stats_aggregates routes DECIMAL -> VARCHAR ->
    DOUBLE on BOTH sides; decimal->string is exact digits and
    string->double parses correctly rounded in both engines, so the routed
    doubles are bit-identical. This test pins (a) the route produces the
    correctly-rounded double for a >2^53-unscaled decimal in both engines,
    and (b) the stats_aggregates source carries no direct
    decimal-sum->double cast."""
    import duckdb

    from pyspark.sql import functions as F

    # 144665355046088.0001 -> unscaled 1446653550460880001 > 2^53
    lit = "144665355046088.0001"
    sdf = spark.range(1).select(
        F.lit(lit).cast("decimal(38,8)").cast("string").cast("double")
        .alias("v")
    )
    got_spark = sdf.collect()[0].v
    got_duck = duckdb.sql(
        f"SELECT CAST(CAST(CAST('{lit}' AS DECIMAL(38,8)) AS VARCHAR) "
        "AS DOUBLE)"
    ).fetchone()[0]
    want = float(lit)  # Python strtod: correctly rounded reference
    assert got_spark == got_duck == want

    import inspect

    from nursing_home_data_etl_pipeline_spark.plans import queries_stats

    src = inspect.getsource(queries_stats)
    assert 'AS VARCHAR) AS DOUBLE)' in src
    # engine side: every decimal moment sum goes .cast("string") first
    direct = src.count('.cast("double").alias("_s')
    routed = src.count('.cast("string").cast("double").alias("_s')
    assert direct == routed and routed >= 9
