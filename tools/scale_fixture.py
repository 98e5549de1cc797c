"""Key-shifted ~Nx replication of a testdata dir (the empirical scale
points above sf0.1): replicas shift id/FK families, substitution-cipher
text and rotate+sign-flip embeddings so they decorrelate; ``--skew``
layers hot keys / 1000x doc-length tail / growing group cardinality;
``--skew2`` = 50% hot keys, 10^4x tail. Rationale:
docs/TOOLS.md#scale-fixture. Usage: python tools/scale_fixture.py
[--skew|--skew2] [replicas] [src] [dest]."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: id-family strides — one power of 10 above each family's max at the
#: sf0.1 source, so shifted replicas can never collide.
STRIDES = {
    "cust": 100_000, "order": 1_000_000, "part": 100_000, "supp": 10_000,
    "event": 1_000_000, "user": 10_000, "doc": 100_000, "vec": 100_000,
}

#: table -> {column: stride family}. FKs share their dimension's family.
SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMS = ("region", "nation")


#: skew-mode knobs: % of child rows remapped to the hot key, % of rows whose
#: group key gains a per-replica suffix (disjoint bucket ranges), and the
#: doc-length multiplier tail (permille -> multiplier; 1000x total spread).
HOT_PCT = 30
GROW_PCT = (30, 40)
LEN_TAIL = ((1, 1000), (10, 100), (30, 10))

#: ``--skew2`` (round-13 #4): the harsher point — HALF of all child rows on
#: one hot key, and a 10^4x doc-length tail.
SKEW2 = {"HOT_PCT": 50, "LEN_TAIL": ((1, 10_000), (10, 100), (30, 10))}


def _bucket(val: int, mod: int) -> int:
    """Deterministic pseudo-bucket from an id (odd-constant mix, stable
    under row order and replica shifts when fed the BASE id)."""
    return (val * 2654435761) % mod


def _skew_keys(src: str) -> dict:
    """The global hot key per table, read once from the UNSHIFTED source
    (= replica 0), so every replica's hot rows reference a key that exists."""
    ks = {}
    ks["cust"] = pc.min(pq.read_table(
        f"{src}/customer.parquet", columns=["c_custkey"]).column(0)).as_py()
    ks["user"] = pc.min(pq.read_table(
        f"{src}/events.parquet", columns=["user_id"]).column(0)).as_py()
    ks["source"] = pc.min(pq.read_table(
        f"{src}/documents.parquet", columns=["source"]).column(0)).as_py()
    ks["label"] = pc.min(pq.read_table(
        f"{src}/embeddings.parquet", columns=["label"]).column(0)).as_py()
    return ks


def _set(tbl: pa.Table, col: str, vals: list, typ=None) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, pa.array(vals, typ or tbl.schema.field(i).type))


def _skew_replica(name: str, tbl: pa.Table, base_ids: list, r: int,
                  hot: dict, hot_pct: int = HOT_PCT,
                  len_tail: tuple = LEN_TAIL) -> pa.Table:
    """Apply skew AFTER the id shift: hot-key remaps write the absolute
    replica-0 key; selections bucket on the BASE id so the same logical
    rows are chosen in every replica."""
    bk = [_bucket(i, 100) for i in base_ids]
    if name == "orders":
        cur = tbl.column("o_custkey").to_pylist()
        tbl = _set(tbl, "o_custkey",
                   [hot["cust"] if b < hot_pct else v for b, v in zip(bk, cur)])
    elif name == "events":
        users = tbl.column("user_id").to_pylist()
        # purchase rows keep their user: a hot user in BOTH interval-join
        # inputs makes the JOIN OUTPUT itself ~quadratic (4.9M rows at
        # sf1) — a semantics-level blowup, not the shuffle stress this
        # fixture creates; the hot user still owns the non-purchase share.
        types = tbl.column("event_type").to_pylist()
        tbl = _set(tbl, "user_id",
                   [hot["user"] if b < hot_pct and v is not None
                    and t != "purchase" else v
                    for b, v, t in zip(bk, users, types)])
        if r:
            et = tbl.column("event_type").to_pylist()
            tbl = _set(tbl, "event_type",
                       [f"{v}_g{r}" if GROW_PCT[0] <= b < GROW_PCT[1]
                        and v is not None else v for b, v in zip(bk, et)])
    elif name == "documents":
        srcs = tbl.column("source").to_pylist()
        srcs = [hot["source"] if b < hot_pct and v is not None else v
                for b, v in zip(bk, srcs)]
        if r:
            srcs = [f"{v}_g{r}" if GROW_PCT[0] <= b < GROW_PCT[1]
                    and v is not None else v for b, v in zip(bk, srcs)]
        tbl = _set(tbl, "source", srcs)
        texts = tbl.column("text").to_pylist()
        mult = {i: next(m for lim, m in len_tail if b < lim)
                for i, b in enumerate(_bucket(x, 1000) for x in base_ids)
                if b < len_tail[-1][0]}
        texts = [((t + " ") * mult[i]).rstrip() if i in mult and t else t
                 for i, t in enumerate(texts)]
        tbl = _set(tbl, "text", texts)
        nch = tbl.column("n_chars").to_pylist()
        tbl = _set(tbl, "n_chars",  # recompute ONLY mutated docs' lengths
                   [len(texts[i]) if i in mult and texts[i] is not None
                    else v for i, v in enumerate(nch)])
    elif name == "embeddings":
        lab = tbl.column("label").to_pylist()
        tbl = _set(tbl, "label",
                   [hot["label"] if b < hot_pct and v is not None else v
                    for b, v in zip(bk, lab)])
    return tbl


_LO = "abcdefghijklmnopqrstuvwxyz"


def _mix(s: int) -> int:
    return (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)


def _perm(r: int) -> str:
    """Per-replica letter permutation (Fisher-Yates over an LCG stream):
    26! possible bijections, so replicas never repeat text the way the
    old Caesar shift did every 25."""
    letters, s = list(_LO), _mix(r)
    for i in range(25, 0, -1):
        s = _mix(s)
        j = s % (i + 1)
        letters[i], letters[j] = letters[j], letters[i]
    return "".join(letters)


def _trans(r: int) -> dict:
    lo = _perm(r)
    return str.maketrans(_LO + _LO.upper(), lo + lo.upper())


def _signs(r: int, n: int) -> list[float]:
    """±1 mask from the per-replica odd 64-bit hash; element 0 always
    flips (bit 0 forced). Distinctness is per-run, asserted in build()
    (bit-0 forcing means it is NOT universal over r < 2^64) — enough for
    replicas sharing a rotation (r, r+64) to decorrelate."""
    h = (r * 2654435761) | 1
    return [-1.0 if (h >> (j % 64)) & 1 else 1.0 for j in range(n)]


def _replica(name: str, tbl: pa.Table, r: int) -> pa.Table:
    for col, fam in SHIFTS.get(name, {}).items():
        i = tbl.schema.get_field_index(col)
        typ = tbl.schema.field(col).type
        shifted = pc.add(tbl.column(col), pa.scalar(r * STRIDES[fam], typ))
        tbl = tbl.set_column(i, col, shifted)
    if r and name == "documents":
        i = tbl.schema.get_field_index("text")
        t9n = _trans(r)
        vals = [t if t is None else t.translate(t9n)
                for t in tbl.column("text").to_pylist()]
        tbl = tbl.set_column(i, "text", pa.array(vals, pa.string()))
    if r and name == "embeddings":
        i = tbl.schema.get_field_index("embedding")
        vals = []
        for v in tbl.column("embedding").to_pylist():
            if not v:
                vals.append(v)
                continue
            k = r % len(v)
            vals.append([x if x is None else s * x
                         for s, x in zip(_signs(r, len(v)), v[k:] + v[:k])])
        tbl = tbl.set_column(i, "embedding", pa.array(vals, tbl.schema.field(i).type))
    return tbl


#: skew-mode: table -> the BASE id column that drives row selection.
SKEW_ID = {"orders": "o_orderkey", "events": "event_id",
           "documents": "doc_id", "embeddings": "vec_id"}


def build(src: str, dest: str, replicas: int, skew: bool = False,
          hot_pct: int = HOT_PCT, len_tail: tuple = LEN_TAIL) -> None:
    # Two replicas with the same letter permutation would get identical
    # text, silently breaking the cross-replica Jaccard ~0 property
    # (ADVICE r9, when Caesar repeated every 25) — the 26! substitution
    # space makes a collision ~impossible, but the check is one set().
    perms = {_perm(r) for r in range(1, replicas)}
    if len(perms) != max(replicas - 1, 0):
        raise ValueError("letter-permutation collision across replicas")
    # same guard for the sign masks: |1 forces bit 0, so distinctness is a
    # property to check per replica count, not a universal guarantee
    masks = {(r * 2654435761) | 1 for r in range(1, replicas)}
    if len(masks) != max(replicas - 1, 0):
        raise ValueError("sign-mask collision across replicas")
    os.makedirs(dest, exist_ok=True)
    hot = _skew_keys(src) if skew else None
    for name in DIMS:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dest}/{name}.parquet")
    for name in SHIFTS:
        srct = pq.read_table(f"{src}/{name}.parquet")
        base_ids = (srct.column(SKEW_ID[name]).to_pylist()
                    if skew and name in SKEW_ID else None)
        out = f"{dest}/{name}.parquet"
        os.makedirs(out, exist_ok=True)
        for r in range(replicas):
            rep = _replica(name, srct, r)
            if base_ids is not None:
                rep = _skew_replica(name, rep, base_ids, r, hot,
                                    hot_pct, len_tail)
            pq.write_table(rep, f"{out}/part-{r:02d}.parquet")
        print(f"{name}: {srct.num_rows} x {replicas} rows"
              + (" [skewed]" if base_ids is not None else ""), flush=True)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--skew", "--skew2")]
    skew2 = "--skew2" in sys.argv[1:]
    skew = skew2 or "--skew" in sys.argv[1:]
    replicas = int(argv[0]) if len(argv) > 0 else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dest = argv[2] if len(argv) > 2 else (
        "/tmp/sf1skew2" if skew2 else "/tmp/sf1skew" if skew else "/tmp/sf1")
    # --skew2 threads its constants as ARGUMENTS (ADVICE r13:
    # globals().update leaked skew2 into later library build() calls)
    kw = ({"hot_pct": SKEW2["HOT_PCT"], "len_tail": SKEW2["LEN_TAIL"]}
          if skew2 else {})
    build(src, dest, replicas, skew=skew, **kw)
    print(f"scale fixture ({replicas}x {src}{', skewed' if skew else ''}) at {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
