"""Derive an ADVERSARIAL fixture: original rows + APPENDED fresh-key edge
rows (NULLs, blank/unicode/regex text, dup docs, tied timestamps, orphan
FKs, epoch boundaries) — the classes the driver fixture never exercises;
schemas byte-identical, floats exactly-representable by policy. Full
rationale: docs/TOOLS.md#adversarial-fixture. Usage:
python tools/adversarial_fixture.py [src_sf_dir] [dest_dir], then gate
with check_correctness.py."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = dt.datetime(1970, 1, 1)
FAR_FUTURE = dt.datetime(2099, 12, 31, 23, 59, 59)


def _read(src: str, table: str) -> pa.Table:
    return pq.read_table(f"{src}/{table}.parquet")


def _append(tbl: pa.Table, rows: list[dict]) -> pa.Table:
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def build(src: str, dest: str) -> dict[str, int]:
    os.makedirs(dest, exist_ok=True)
    added: dict[str, int] = {}

    # -- documents --------------------------------------------------------
    docs = _read(src, "documents")
    base = max(x for x in docs.column("doc_id").to_pylist() if x is not None)
    sample_text = next(
        t for t in docs.column("text").to_pylist() if t and len(t.split()) > 8
    )
    near_dup = " ".join(
        w if i != 3 else "ADVERSARIAL" for i, w in enumerate(sample_text.split())
    )
    doc_rows = [
        {"doc_id": base + 1, "text": None, "lang": "en", "source": "adv", "n_chars": None},
        {"doc_id": base + 2, "text": "", "lang": "en", "source": "adv", "n_chars": 0},
        {"doc_id": base + 3, "text": " \t\n  ", "lang": None, "source": "adv", "n_chars": 5},
        {"doc_id": base + 4, "text": sample_text, "lang": "en", "source": "adv", "n_chars": len(sample_text)},  # exact dup
        {"doc_id": base + 5, "text": near_dup, "lang": "en", "source": "adv", "n_chars": len(near_dup)},  # near dup
        {"doc_id": base + 6, "text": "x", "lang": "en", "source": None, "n_chars": 1},
        {"doc_id": base + 7, "text": "naïve café 北京 🎉 éé́ combining", "lang": "fr", "source": "adv", "n_chars": 29},
        {"doc_id": base + 8, "text": "a.*b (c) [d] {5} \\ $ ^ | + ? regex", "lang": "en", "source": "adv", "n_chars": 34},
        {"doc_id": base + 9, "text": "supercalifragilisticexpialidocious" * 40, "lang": "en", "source": "adv", "n_chars": 34 * 40},
        {"doc_id": base + 10, "text": "word " * 200, "lang": None, "source": None, "n_chars": 1000},
        # phase 2: punctuation-only, windows newlines, non-breaking space
        {"doc_id": base + 11, "text": "!!! ??? ... ;;; ###", "lang": "en", "source": "adv", "n_chars": 19},
        {"doc_id": base + 12, "text": "line one\r\nline two\r\n", "lang": "en", "source": "adv", "n_chars": 20},
        # vertical tab: Java \\s matches it, RE2's does not
        {"doc_id": base + 14, "text": "vert\x0btab words here", "lang": "en", "source": "adv", "n_chars": 19},
        {"doc_id": base + 15, "text": "\x0b\x0c", "lang": "en", "source": "adv", "n_chars": 2},
        # leading MULTIBYTE char: byte-wise header read vs ascii() diverge
        {"doc_id": base + 16, "text": "été warm words here now", "lang": "fr", "source": "adv", "n_chars": 23},
        {"doc_id": base + 13, "text": "nb\xa0space word", "lang": "en", "source": "adv", "n_chars": 13},
        # phase 9: Unicode-Zs whitespace — F.trim strips 0x20 only, so
        # every F.trim oracle twin must space-trim (duck_trim_sql)
        {"doc_id": base + 21, "text": "\u00a0\u00a0", "lang": "en", "source": "adv", "n_chars": 2},
        {"doc_id": base + 22, "text": "\u3000ideographic\u3000space\u3000", "lang": "ja", "source": "adv", "n_chars": 19},
        # phase 9: NUL byte inside text (a C-string truncation would show)
        {"doc_id": base + 23, "text": "a\x00b c words", "lang": "en", "source": "adv", "n_chars": 12},
        # phase 9: astral emoji + ZWJ — lengths/regex beyond the BMP
        {"doc_id": base + 24, "text": "grin \U0001F600 faces \U0001F3F3\uFE0F\u200D\U0001F308 flag", "lang": "en", "source": "adv", "n_chars": None},
    ]
    pq.write_table(_append(docs, doc_rows), f"{dest}/documents.parquet")
    added["documents"] = len(doc_rows)

    # -- events -----------------------------------------------------------
    ev = _read(src, "events")
    ebase = max(x for x in ev.column("event_id").to_pylist() if x is not None)
    some_ts = next(t for t in ev.column("ts").to_pylist() if t is not None)
    ev_rows = [
        {"event_id": ebase + 1, "ts": None, "user_id": 1, "event_type": "click", "value": 1.25, "props": "{}"},
        {"event_id": ebase + 2, "ts": some_ts, "user_id": None, "event_type": "click", "value": 2.5, "props": None},
        {"event_id": ebase + 3, "ts": some_ts, "user_id": 1, "event_type": None, "value": None, "props": "{not json"},
        # duplicate (user_id, ts) tie with distinct event ids and values
        {"event_id": ebase + 4, "ts": some_ts, "user_id": 999999, "event_type": "tie", "value": 3.75, "props": '{"k": "v"}'},
        {"event_id": ebase + 5, "ts": some_ts, "user_id": 999999, "event_type": "tie", "value": 4.5, "props": '{"k": "w"}'},
        {"event_id": ebase + 6, "ts": EPOCH, "user_id": 999998, "event_type": "epoch", "value": 0.0, "props": "{}"},
        {"event_id": ebase + 7, "ts": FAR_FUTURE, "user_id": 999998, "event_type": "future", "value": -7.5, "props": "{}"},
        # phase 2: pre-epoch event time (below Spark's initial watermark 0)
        {"event_id": ebase + 8, "ts": dt.datetime(1969, 12, 31, 23, 0, 0), "user_id": 999997, "event_type": "preepoch", "value": 2.25, "props": "{}"},
        # phase 4: NULL event_type reaching the sketch-band join; compact
        # and negative props JSON (from_json parses, naive regexps did not)
        {"event_id": ebase + 11, "ts": some_ts, "user_id": 2, "event_type": None, "value": 6.25, "props": '{"k":7}'},
        {"event_id": ebase + 12, "ts": some_ts, "user_id": 2, "event_type": "click", "value": 7.25, "props": '{"k": -4}'},
        # phase 5 (ADVICE r6): numeric-CONTENT JSON string — from_json
        # NULLs it for a LongType field; quote-stripping oracles admit 7
        {"event_id": ebase + 13, "ts": some_ts, "user_id": 2, "event_type": "click", "value": 8.25, "props": '{"k": "7"}'},
        # phase 3: non-finite doubles
        {"event_id": ebase + 9, "ts": some_ts, "user_id": 999996, "event_type": "nan", "value": float("nan"), "props": "{}"},
        {"event_id": ebase + 10, "ts": some_ts, "user_id": 999996, "event_type": "inf", "value": float("inf"), "props": "{}"},
        # phase 6: event_type with ENTIRELY NULL values — sketch-band
        # booleans must be vacuously TRUE, not NULL
        {"event_id": ((ebase // 5) + 10) * 5, "ts": some_ts, "user_id": 999995, "event_type": "allnull", "value": None, "props": "{}"},
        {"event_id": ((ebase // 5) + 11) * 5, "ts": some_ts, "user_id": 999995, "event_type": "allnull", "value": None, "props": "{}"},
        # phase 6: tied purchases — native ASOF picks order-dependently;
        # oracles must pre-aggregate to the engine's max-value tie rule
        {"event_id": ebase + 14, "ts": some_ts, "user_id": 999994, "event_type": "purchase", "value": 3.25, "props": "{}"},
        {"event_id": ebase + 15, "ts": some_ts, "user_id": 999994, "event_type": "purchase", "value": 4.25, "props": "{}"},
        {"event_id": ebase + 16, "ts": some_ts + dt.timedelta(minutes=5), "user_id": 999994, "event_type": "click", "value": 1.25, "props": "{}"},
        # phase 6: ts beyond int64-NANOS range — epoch_us only in oracles
        {"event_id": ebase + 17, "ts": dt.datetime(2500, 1, 1, 12, 0, 0), "user_id": 999993, "event_type": "farfuture_ns", "value": 5.25, "props": "{}"},
        # phase 9: gaps of EXACTLY the session gap — session_window's
        # boundary is INCLUSIVE (3-chain = one session); 1 us past splits
        {"event_id": ebase + 18, "ts": dt.datetime(2024, 6, 1, 9, 0, 0), "user_id": 999992, "event_type": "click", "value": 1.25, "props": "{}"},
        {"event_id": ebase + 19, "ts": dt.datetime(2024, 6, 1, 9, 30, 0), "user_id": 999992, "event_type": "click", "value": 2.25, "props": "{}"},
        {"event_id": ebase + 20, "ts": dt.datetime(2024, 6, 1, 10, 0, 0), "user_id": 999992, "event_type": "click", "value": 3.25, "props": "{}"},
        {"event_id": ebase + 21, "ts": dt.datetime(2024, 6, 1, 10, 30, 0, 1), "user_id": 999992, "event_type": "click", "value": 4.25, "props": "{}"},
        # phase 10 (round-14 #2): catastrophic-cancellation group — at
        # 2^33 magnitude a double accumulator's ulp is 1.9e-6, so the
        # 1e-4 grid values vanish from a float sum IN ANY ORDER (0.0)
        # while the exact decimal/micro-unit sum keeps 0.0003; pins the
        # value-sum entries to exact arithmetic.
        {"event_id": ebase + 22, "ts": some_ts, "user_id": 999991, "event_type": "strad", "value": 8589934592.0, "props": "{}"},
        {"event_id": ebase + 23, "ts": some_ts, "user_id": 999991, "event_type": "strad", "value": 0.0001, "props": "{}"},
        {"event_id": ebase + 24, "ts": some_ts, "user_id": 999991, "event_type": "strad", "value": 0.0001, "props": "{}"},
        {"event_id": ebase + 25, "ts": some_ts, "user_id": 999991, "event_type": "strad", "value": 0.0001, "props": "{}"},
        {"event_id": ebase + 26, "ts": some_ts, "user_id": 999991, "event_type": "strad", "value": -8589934592.0, "props": "{}"},
    ]
    pq.write_table(_append(ev, ev_rows), f"{dest}/events.parquet")
    added["events"] = len(ev_rows)

    # -- embeddings -------------------------------------------------------
    emb = _read(src, "embeddings")
    vbase = max(x for x in emb.column("vec_id").to_pylist() if x is not None)
    dim = len(emb.column("embedding")[0].as_py())
    zero_vec = [0.0] * dim
    dup_vec = emb.column("embedding")[0].as_py()  # exact duplicate of vec 0
    emb_rows = [
        {"vec_id": vbase + 1, "embedding": zero_vec, "label": None},
        {"vec_id": vbase + 2, "embedding": dup_vec, "label": 0},
        {"vec_id": vbase + 3, "embedding": [(-1.0) ** i * 0.5 for i in range(dim)], "label": 1},
        # phase 2: shape violations — the fixed-dim similarity contract
        {"vec_id": vbase + 4, "embedding": [], "label": 2},  # empty
        {"vec_id": vbase + 5, "embedding": [0.5] * (dim // 2), "label": 2},  # short
        {"vec_id": vbase + 6, "embedding": [0.25] * (dim + 8), "label": 2},  # long
        {"vec_id": vbase + 7, "embedding": [None] + [0.5] * (dim - 1), "label": 2},  # NULL element
        # phase 3: NaN component (norm NaN; NaN > 0 is TRUE in both
        # engines' orderings — probes whether NaN poisons top-k agreement)
        {"vec_id": vbase + 8, "embedding": [float("nan")] + [0.5] * (dim - 1), "label": 3},
    ]
    pq.write_table(_append(emb, emb_rows), f"{dest}/embeddings.parquet")
    added["embeddings"] = len(emb_rows)

    # -- orders -----------------------------------------------------------
    orders = _read(src, "orders")
    obase = max(x for x in orders.column("o_orderkey").to_pylist() if x is not None)
    odate = next(d for d in orders.column("o_orderdate").to_pylist() if d is not None)
    order_rows = [
        {"o_orderkey": obase + 1, "o_custkey": None, "o_orderstatus": "O", "o_totalprice": 100.25, "o_orderdate": odate, "o_orderpriority": "1-URGENT"},
        {"o_orderkey": obase + 2, "o_custkey": 999999999, "o_orderstatus": None, "o_totalprice": None, "o_orderdate": None, "o_orderpriority": None},
        {"o_orderkey": obase + 3, "o_custkey": 1, "o_orderstatus": "F", "o_totalprice": 0.0, "o_orderdate": EPOCH, "o_orderpriority": ""},
        {"o_orderkey": obase + 4, "o_custkey": 1, "o_orderstatus": "Ø", "o_totalprice": -50.5, "o_orderdate": FAR_FUTURE, "o_orderpriority": "5-LOW"},
        # phase 4: NULL sort keys inside POPULATED window partitions —
        # ranks/first_value diverge unless the oracle pins NULLS FIRST
        {"o_orderkey": obase + 5, "o_custkey": 2, "o_orderstatus": "O", "o_totalprice": 77.25, "o_orderdate": odate, "o_orderpriority": None},
        {"o_orderkey": obase + 6, "o_custkey": 1, "o_orderstatus": "F", "o_totalprice": 88.25, "o_orderdate": None, "o_orderpriority": "2-HIGH"},
        # NULL priority on a % 50-kept key: concat-vs-concat_ws NULLs show
        {"o_orderkey": ((obase // 50) + 2) * 50, "o_custkey": 3, "o_orderstatus": "O", "o_totalprice": 55.25, "o_orderdate": odate, "o_orderpriority": None},
        # phase 5: fine total >= 1e7 — Spark stringifies the double as
        # scientific notation; transforms must render money via DECIMAL
        {"o_orderkey": obase + 7, "o_custkey": 4, "o_orderstatus": "F", "o_totalprice": 987654321.25, "o_orderdate": odate, "o_orderpriority": "3-MEDIUM"},
        # phase 6: NULL o_orderkey TIED with obase+5 — secondary
        # tiebreakers must pin NULLS FIRST or nth_value flips sides
        {"o_orderkey": None, "o_custkey": 2, "o_orderstatus": "O", "o_totalprice": 77.25, "o_orderdate": odate, "o_orderpriority": "1-URGENT"},
    ]
    pq.write_table(_append(orders, order_rows), f"{dest}/orders.parquet")
    added["orders"] = len(order_rows)

    # -- lineitem ---------------------------------------------------------
    li = _read(src, "lineitem")
    sdate = next(d for d in li.column("l_shipdate").to_pylist() if d is not None)
    li_rows = [
        {"l_orderkey": obase + 1, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1, "l_quantity": None, "l_extendedprice": 10.25, "l_discount": None, "l_tax": None, "l_returnflag": None, "l_linestatus": None, "l_shipdate": None},
        {"l_orderkey": 999999901, "l_partkey": None, "l_suppkey": None, "l_linenumber": 1, "l_quantity": -5.0, "l_extendedprice": 0.0, "l_discount": 0.5, "l_tax": 0.0, "l_returnflag": "R", "l_linestatus": "F", "l_shipdate": sdate},  # orphan order
        {"l_orderkey": obase + 3, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": 1.25, "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "", "l_linestatus": "", "l_shipdate": EPOCH},
        # phase 5: quarterly quantity sum >= 1e7 — DECIMAL render again
        {"l_orderkey": obase + 3, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 3, "l_quantity": 25000000.0, "l_extendedprice": 2.25, "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "A", "l_linestatus": "F", "l_shipdate": sdate},
        # phase 7: padded return flag — raw grouping vs trimmed display;
        # the dense id must order by the TRIMMED key on both sides
        {"l_orderkey": obase + 3, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 4, "l_quantity": 3.0, "l_extendedprice": 3.25, "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": " R", "l_linestatus": "F", "l_shipdate": sdate},
        # phase 8: ZERO-VARIANCE group — bare F.corr raised ANSI
        # DIVIDE_BY_ZERO; the guarded covar/(sx*sy) must emit NULL
        {"l_orderkey": 888888811, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1, "l_quantity": 5.0, "l_extendedprice": 100.25, "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "CQ", "l_linestatus": "O", "l_shipdate": sdate},
        {"l_orderkey": 888888812, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1, "l_quantity": 5.0, "l_extendedprice": 200.25, "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "CQ", "l_linestatus": "O", "l_shipdate": sdate},
    ]
    pq.write_table(_append(li, li_rows), f"{dest}/lineitem.parquet")
    added["lineitem"] = len(li_rows)

    # -- customer ---------------------------------------------------------
    cust = _read(src, "customer")
    cbase = max(x for x in cust.column("c_custkey").to_pylist() if x is not None)
    cust_rows = [
        {"c_custkey": cbase + 1, "c_name": None, "c_nationkey": None, "c_acctbal": None, "c_mktsegment": None},
        {"c_custkey": cbase + 2, "c_name": "Ünïcode Çustomer 顧客", "c_nationkey": 999, "c_acctbal": -10.5, "c_mktsegment": ""},  # orphan nation
        # phase 5: balance >= 1e7 — DECIMAL render in the clean-project
        {"c_custkey": cbase + 3, "c_name": "Big Balance", "c_nationkey": 0, "c_acctbal": 98765432.25, "c_mktsegment": "MACHINERY"},
        # phase 7: source-padded strings — oracles mirror the whole-row TRIM
        {"c_custkey": cbase + 4, "c_name": "  Padded Name  ", "c_nationkey": 0, "c_acctbal": 5.25, "c_mktsegment": " BUILDING "},
        # phase 7: NaN money — ANSI NaN->DECIMAL is NULL; plain CAST errors
        {"c_custkey": cbase + 5, "c_name": "NaN Balance", "c_nationkey": 0, "c_acctbal": float("nan"), "c_mktsegment": "MACHINERY"},
        # phase 7: DUPLICATE key — dense row_ids follow ids._tiebreak;
        # top-N orderings must be total over their group keys
        {"c_custkey": cbase + 6, "c_name": "ZZZ First Registration", "c_nationkey": 1, "c_acctbal": 6.25, "c_mktsegment": "AUTOMOBILE"},
        {"c_custkey": cbase + 6, "c_name": "AAA Re-Registration", "c_nationkey": 1, "c_acctbal": 7.25, "c_mktsegment": "AUTOMOBILE"},
        # phase 9: NBSP-padded name — the clean-project oracle space-trims
        {"c_custkey": cbase + 7, "c_name": " NBSP Padded ", "c_nationkey": 0, "c_acctbal": 8.25, "c_mktsegment": " BUILDING "},
        # phase 9: duplicate-key SCD2 target, ONE copy changed —
        # merge_scd2 classifies per joined ROW, so one twin closes+reopens
        # while the other carries forward (even key: src2 shifts BUILDING)
        {"c_custkey": cbase + 8 + (cbase % 2), "c_name": "SCD Twin A", "c_nationkey": 1, "c_acctbal": 100.25, "c_mktsegment": "BUILDING"},
        {"c_custkey": cbase + 8 + (cbase % 2), "c_name": "SCD Twin B", "c_nationkey": 1, "c_acctbal": 1100.25, "c_mktsegment": "MACHINERY"},
    ]
    pq.write_table(_append(cust, cust_rows), f"{dest}/customer.parquet")
    added["customer"] = len(cust_rows)

    # -- supplier / part / nation / region: one all-NULL fresh-key row ----
    for name, key, row in (
        ("supplier", "s_suppkey", {"s_name": None, "s_nationkey": None, "s_acctbal": None}),
        ("part", "p_partkey", {"p_name": None, "p_brand": "", "p_type": None, "p_size": None, "p_retailprice": None}),
        ("nation", "n_nationkey", {"n_name": None, "n_regionkey": None}),
        ("region", "r_regionkey", {"r_name": None}),
    ):
        tbl = _read(src, name)
        base = max(x for x in tbl.column(key).to_pylist() if x is not None)
        pq.write_table(_append(tbl, [{key: base + 1, **row}]),
                       f"{dest}/{name}.parquet")
        added[name] = 1

    return added


#: Every driver table, in TESTDATA.md order — shared by the derived axes.
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _derive(src: str, dest: str, mutate) -> None:
    """Copy every table through ``mutate(name, table) -> table`` — the
    common frame for the sibling robustness axes (schemas byte-identical,
    so oracle and engine read production shapes)."""
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        pq.write_table(mutate(t, _read(src, t)), f"{dest}/{t}.parquet")


def derive_empty(src: str, dest: str) -> None:
    """EMPTY axis: every table sliced to 0 rows — a first run, a fully
    filtered source, or an empty partition must yield empty results, not
    crashes (caught DuckDB LOG2(0) in the LSH plane derivation and Spark's
    no-grand-total-row grouping-sets behavior)."""
    _derive(src, dest, lambda _, tbl: tbl.slice(0, 0))


def derive_single_row(src: str, dest: str) -> None:
    """SINGLE-ROW axis: one row per table — degenerate groups, windows,
    and joins (empty pair sets, self-join of one)."""
    _derive(src, dest, lambda _, tbl: tbl.slice(0, 1))


def derive_reversed(src: str, dest: str) -> None:
    """ROW-ORDER-REVERSED axis: identical multiset, reversed physical
    order — catches input-order-dependent picks on either side (the class
    DuckDB's native ASOF exhibits under ties)."""
    _derive(
        src,
        dest,
        lambda _, tbl: tbl.take(pa.array(range(tbl.num_rows - 1, -1, -1))),
    )


def derive_skew(src: str, dest: str) -> None:
    """SKEW axis: half of events on one user and half of orders on one
    customer — the shape that breaks at 100 TB (one giant window
    partition, one giant group, a skewed join side); surfaced Spark's
    double->string scientific notation at a >=1e7 fine total (round 7)."""
    hot_cols = {"events": "user_id", "orders": "o_custkey"}

    def mutate(name, tbl):
        col_name = hot_cols.get(name)
        if col_name and tbl.num_rows:
            col = tbl.column(col_name)
            n = tbl.num_rows
            vals = [col[0].as_py()] * (n // 2) + col.to_pylist()[n // 2:]
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col_name),
                col_name,
                pa.array(vals, col.type),
            )
        return tbl

    _derive(src, dest, mutate)


def derive_all_duplicates(src: str, dest: str) -> None:
    """ALL-DUPLICATES axis: identical text/embedding everywhere — the
    quadratic-pair stressor (124,750 LSH edges at sf0.001 push connected
    components into the distributed min-label branch)."""

    def mutate(name, tbl):
        dup_col = {"documents": "text", "embeddings": "embedding"}.get(name)
        if dup_col and tbl.num_rows:
            val = next(x for x in tbl.column(dup_col).to_pylist() if x)
            i = tbl.schema.get_field_index(dup_col)
            tbl = tbl.set_column(
                i, dup_col, pa.array([val] * tbl.num_rows, tbl.schema.field(dup_col).type)
            )
        return tbl

    _derive(src, dest, mutate)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/advdata"
    added = build(src, dest)
    for t, n in sorted(added.items()):
        print(f"{t:12s} +{n} adversarial rows")
    print(f"fixture at {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
