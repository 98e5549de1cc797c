"""Seeded randomized-fixture builder — the FUZZ axes of the robustness
matrix: whole-fixture random mutations from one seed, plus a PHYSICAL
layout stream, ``--shape`` schema mutations, and ``--corr`` cross-table
correlated mutations, all constrained by the pinned fixture policies so
every generated fixture stays inside the documented oracle contracts.
Full rationale + the policy list: docs/TOOLS.md#fuzz-fixture and
#fuzz-fixture-policies.

Usage: python tools/fuzz_fixture.py SEED [src] [dest] [--shape] [--corr];
gate with tools/check_correctness.py <dest>."""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# ONE table-list source for the fixture builders; plans/verify.py keeps
# its own copy deliberately (package must not depend on tools/).
from adversarial_fixture import TABLES  # noqa: E402

SAFE_FLOATS = [0.0, -1.25, 0.25, 1.5, 100.25, 987654321.25, -50.5,
               1000000.25, 2.0, 0.75, 25000000.0, -0.5]
SAFE_INTS = [0, 1, 999999999, -1, 7, 50, 100]
SAFE_TEXTS = ["", " \t\n ", "x", "a.*b (c) [d] {5} \\ $ ^ | + ? regex",
              "word " * 50, "the the the and of to a in is it",
              "naïve café 顧客", "!!! ??? ...", "line one\r\nline two",
              "\x0b\x0c", "  padded text here  ", "vert\x0btab words",
              "été warm words here now",
              # round-8 probe classes (oracle twins space-trim only;
              # word-final capital sigma stays policy-EXCLUDED)
              "\u00a0\u00a0", "\u3000wide\u3000space\u3000",
              "a\x00nul c", "grin \U0001F600 astral",
              "zero\u200bwidth join", "e\u0301clair nfd"]
SAFE_TS = [dt.datetime(1970, 1, 1), dt.datetime(1969, 12, 31, 23, 0),
           dt.datetime(2099, 12, 31, 23, 59, 59),
           dt.datetime(2500, 1, 1, 12), dt.datetime(2024, 3, 1, 12)]
SAFE_JSON = ["{}", '{"k": 3}', '{"k": -4}', '{"k": "7"}', None, "{not json",
             '{"k":7}']

#: at most ONE NULL per unique-id column (GROUP BY merges NULLs: two
#: NULL-id embedding rows would conflate into one 2x-dim oracle group)
UNIQUE_ID = {"embeddings": "vec_id"}
NO_DUP_ROWS = {"embeddings", "events"}
NO_EDIT_COLS = {
    ("events", "event_id"), ("documents", "doc_id"),
    ("customer", "c_custkey"),
    ("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
}
#: nullify also skips these: two NULL-id rows tied on every prior sort
#: key would break the pinned "(ts, event_id) is a total order" invariant
#: and nth_value picks turn engine-order-dependent (round-9 ADVICE).
NO_NULL_COLS = NO_EDIT_COLS | {("orders", "o_orderkey")}


def _is_key(name: str, col: str) -> bool:
    """Id/FK columns excluded from whole-column shape ops: a CONSTANT key
    column would manufacture an O(n^2) join fan-out no real corpus has, and
    a per-row-UNIQUE id is already the normal shape."""
    return col.endswith(("key", "_id")) or col == UNIQUE_ID.get(name)


def _set_cell(tbl: pa.Table, col: str, row: int, value) -> pa.Table:
    vals = tbl.column(col).to_pylist()
    vals[row] = value
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, pa.array(vals, tbl.schema.field(col).type))


def _mutate(name: str, tbl: pa.Table, rng: random.Random) -> pa.Table:
    if tbl.num_rows == 0:
        return tbl
    by_kind = {"s": [], "t": [], "f": [], "i": []}
    for f in tbl.schema:
        kind = ("s" if pa.types.is_string(f.type) else
                "t" if pa.types.is_timestamp(f.type) else
                "f" if pa.types.is_floating(f.type) else
                "i" if pa.types.is_integer(f.type) else None)
        if kind:
            by_kind[kind].append(f.name)
    nulled_unique = False
    ops = ["shuffle", "nullify", "dup_rows", "float_edge", "int_edge",
           "text_edge", "ts_edge", "drop_rows"]
    if name == "embeddings":
        ops += ["emb_edge"] * 3
    for _ in range(rng.randint(1, 6)):
        op = rng.choice(ops)
        n = tbl.num_rows
        if op == "shuffle":
            idx = list(range(n))
            rng.shuffle(idx)
            tbl = tbl.take(pa.array(idx))
        elif op == "nullify":
            col = rng.choice(tbl.schema.names)
            if (name, col) in NO_NULL_COLS:
                continue
            limit = 1 if col == UNIQUE_ID.get(name) else rng.randint(1, 5)
            if col == UNIQUE_ID.get(name):
                if nulled_unique:
                    continue
                nulled_unique = True
            vals = tbl.column(col).to_pylist()
            for r in rng.sample(range(n), min(limit, n)):
                vals[r] = None
            i = tbl.schema.get_field_index(col)
            tbl = tbl.set_column(i, col, pa.array(vals, tbl.schema.field(col).type))
        elif op == "dup_rows" and name not in NO_DUP_ROWS:
            rows = rng.sample(range(n), min(rng.randint(1, 3), n))
            tbl = pa.concat_tables([tbl, tbl.take(pa.array(rows))])
        elif op == "float_edge" and by_kind["f"]:
            col = rng.choice(by_kind["f"])
            if (name, col) not in NO_EDIT_COLS:
                tbl = _set_cell(tbl, col, rng.randrange(n), rng.choice(SAFE_FLOATS))
        elif op == "int_edge" and by_kind["i"]:
            col = rng.choice(by_kind["i"])
            if col != UNIQUE_ID.get(name) and (name, col) not in NO_EDIT_COLS:
                tbl = _set_cell(tbl, col, rng.randrange(n), rng.choice(SAFE_INTS))
        elif op == "text_edge" and by_kind["s"]:
            col = rng.choice(by_kind["s"])
            pool = SAFE_JSON if (name, col) == ("events", "props") else SAFE_TEXTS
            tbl = _set_cell(tbl, col, rng.randrange(n), rng.choice(pool))
        elif op == "ts_edge" and by_kind["t"]:
            col = rng.choice(by_kind["t"])
            tbl = _set_cell(tbl, col, rng.randrange(n), rng.choice(SAFE_TS))
        elif op == "drop_rows":
            keep = [i for i in range(n) if rng.random() > 0.2]
            if keep:
                tbl = tbl.take(pa.array(keep))
        elif op == "emb_edge":
            row = rng.randrange(n)
            cur = tbl.column("embedding")[row].as_py()
            dim = len(cur) if cur else 64
            new = rng.choice([
                [0.0] * dim,                                   # zero norm
                [0.5] * max(1, dim // 2),                      # short
                [0.25] * (dim + 4),                            # long
                ([None] + [0.5] * (dim - 1)) if dim > 1 else [None],
                [],                                            # empty
                tbl.column("embedding")[0].as_py(),            # dup of row 0
            ])
            tbl = _set_cell(tbl, "embedding", row, new)
    return tbl


def _shape(name: str, tbl: pa.Table, srng: random.Random) -> pa.Table:
    """SCHEMA-SHAPE mutations (round-9 directive #5) — the axis value edits
    cannot reach: whole-column degeneracy and extreme group cardinality.
    Drawn from an independent stream behind ``--shape`` so the pinned value
    seeds 101/202/303 keep their historical fixtures bit-for-bit."""
    n = tbl.num_rows
    if n == 0:
        return tbl
    for _ in range(srng.randint(0, 2)):
        op = srng.choice(["col_all_null", "col_const", "col_unique",
                          "long_text"])
        col = srng.choice(tbl.schema.names)
        ftype = tbl.schema.field(col).type
        i = tbl.schema.get_field_index(col)
        # (events, user_id) is a pure grouping FK, never a join PK: const
        # (ALL events one user — 2x the skew axis) and per-row-unique
        # (every session a singleton) are real shapes with no fan-out risk
        group_ok = (name, col) == ("events", "user_id")
        if op == "col_all_null":
            if (name, col) in NO_NULL_COLS or col == UNIQUE_ID.get(name):
                continue
            tbl = tbl.set_column(i, col, pa.nulls(n, ftype))
        elif op == "col_const":
            # row-0's value everywhere: stays in-domain (lang codes, date
            # ranges, valid JSON) while collapsing to ONE distinct value
            v = tbl.column(col)[0].as_py()
            if ((name, col) in NO_EDIT_COLS or v is None
                    or (_is_key(name, col) and not group_ok)):
                continue
            tbl = tbl.set_column(i, col, pa.array([v] * n, ftype))
        elif op == "col_unique":
            # every row its own group
            if ((name, col) in NO_EDIT_COLS
                    or (_is_key(name, col) and not group_ok)
                    or not (pa.types.is_string(ftype)
                            or pa.types.is_integer(ftype))):
                continue
            vals = ([f"u{j}" for j in range(n)]
                    if pa.types.is_string(ftype) else list(range(n)))
            tbl = tbl.set_column(i, col, pa.array(vals, ftype))
        elif op == "long_text":
            if not pa.types.is_string(ftype):
                continue
            text = srng.choice(["lorem ipsum dolor sit amet " * 371,
                                "x" * 10000, "hot " * 2500])[:10000]
            tbl = _set_cell(tbl, col, srng.randrange(n), text)
    return tbl


#: (parent table, parent key, child table, FK) pairs for --corr. Child FKs
#: only — the parent-side ids in NO_EDIT_COLS are never re-pointed. events/
#: documents/embeddings have no FK parent and stay out.
FK_PAIRS = (
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier", "s_suppkey", "lineitem", "l_suppkey"),
)


def _correlate(tabs: dict[str, pa.Table], crng: random.Random) -> None:
    """CROSS-TABLE correlated mutations (round-10 #5): referential shapes
    the independent streams never generate (hot parent, duplicated parent
    fan-out, orphan-with-duplicate-children). Parent duplication is
    VERBATIM (chimera policy); table policies re-run after this."""
    for _ in range(crng.randint(1, 2)):
        parent, pk, child, fk = crng.choice(FK_PAIRS)
        ptab, ctab = tabs[parent], tabs[child]
        if ptab.num_rows == 0 or ctab.num_rows == 0:
            continue
        pkeys = [k for k in ptab.column(pk).to_pylist() if k is not None]
        if not pkeys:
            continue
        hot = crng.choice(pkeys)
        op = crng.choice(["fanout", "dup_parent", "orphan_dup"])
        if op == "fanout":
            vals = [hot if v is not None and crng.random() < 0.5 else v
                    for v in ctab.column(fk).to_pylist()]
            i = ctab.schema.get_field_index(fk)
            tabs[child] = ctab.set_column(
                i, fk, pa.array(vals, ctab.schema.field(fk).type))
        elif op == "dup_parent":
            rows = [i for i, v in enumerate(ptab.column(pk).to_pylist())
                    if v == hot][:1]
            tabs[parent] = pa.concat_tables([ptab, ptab.take(pa.array(rows))])
        elif op == "orphan_dup":
            keep = [i for i, v in enumerate(ptab.column(pk).to_pylist())
                    if v != hot]
            tabs[parent] = ptab.take(pa.array(keep))
            kids = [i for i, v in enumerate(ctab.column(fk).to_pylist())
                    if v == hot][:3]
            if kids and child not in NO_DUP_ROWS:
                tabs[child] = pa.concat_tables([ctab, ctab.take(pa.array(kids))])


def _dedup_rows(tbl: pa.Table, key: str, conflict_cols: list[str] | None) -> pa.Table:
    """Keep the first row per non-NULL ``key``; with ``conflict_cols``,
    later VERBATIM copies (equal on those columns) survive."""
    rows = tbl.to_pylist()
    seen: dict = {}
    keep = []
    for i, r in enumerate(rows):
        k = r[key]
        sig = tuple(r[c] for c in conflict_cols) if conflict_cols else None
        if k is not None and k in seen and (conflict_cols is None or seen[k] != sig):
            continue
        if k is not None:
            seen.setdefault(k, sig)
        keep.append(i)
    return tbl.take(pa.array(keep)) if len(keep) < len(rows) else tbl


def _customer_policy(tbl: pa.Table) -> pa.Table:
    rows = tbl.to_pylist()
    seen: set = set()
    keep = []
    for i, r in enumerate(rows):
        if r["c_mktsegment"] == "BUILDING" and r["c_custkey"] is not None:
            if r["c_custkey"] in seen:
                continue
            seen.add(r["c_custkey"])
        keep.append(i)
    return tbl.take(pa.array(keep)) if len(keep) < len(rows) else tbl


_POLICIES = {
    "events": lambda t: _dedup_rows(t, "event_id", None),
    "documents": lambda t: _dedup_rows(t, "doc_id", ["text"]),
    "customer": _customer_policy,
}


def _write_layout(tbl: pa.Table, path: str, lrng: random.Random) -> None:
    """Physical-layout fuzz: identical rows, randomized file split /
    row-group sizes; half the tables become ``*.parquet`` DIRECTORIES of
    2-4 parts (Spark-sink shape), cut points may yield 0-row parts. A
    failure here is an order/partition-count dependence bug."""
    if lrng.random() < 0.5:
        pq.write_table(tbl, path)
        return
    os.makedirs(path, exist_ok=True)
    n, k = tbl.num_rows, lrng.randint(2, 4)
    cuts = sorted(lrng.choice(range(n + 1)) for _ in range(k - 1))
    bounds = [0, *cuts, n]
    for i in range(k):
        pq.write_table(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       f"{path}/part-{i:02d}.parquet",
                       row_group_size=lrng.choice([7, 64, 4096]))


def build(src: str, dest: str, seed: int, shape: bool = False,
          corr: bool = False) -> None:
    rng = random.Random(seed)
    # Independent streams for physical layout / schema shape / correlation
    # so none perturbs the value mutations a pinned seed historically
    # produced.
    lrng = random.Random(seed ^ 0x4C41594F)
    srng = random.Random(seed ^ 0x53484150)
    crng = random.Random(seed ^ 0x434F5252)
    # ~1 in 4 shape seeds empties ONE table while its siblings stay
    # populated (beyond the matrix's all-empty axis)
    empty_t = srng.choice([*TABLES, *([None] * 3 * len(TABLES))]) if shape else None
    os.makedirs(dest, exist_ok=True)
    tabs: dict[str, pa.Table] = {}
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        if t == empty_t:
            tbl = tbl.slice(0, 0)
        tbl = _mutate(t, tbl, rng)
        if shape:
            tbl = _shape(t, tbl, srng)
        tabs[t] = tbl
    if corr:
        _correlate(tabs, crng)
    for t, tbl in tabs.items():
        if t in _POLICIES:
            tbl = _POLICIES[t](tbl)
        _write_layout(tbl, f"{dest}/{t}.parquet", lrng)


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--shape", "--corr")]
    seed = int(args[0]) if args else 0
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    dest = args[2] if len(args) > 2 else f"/tmp/fuzzdata_s{seed}"
    build(src, dest, seed, shape="--shape" in sys.argv,
          corr="--corr" in sys.argv)
    print(f"fuzz fixture (seed {seed}) at {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
