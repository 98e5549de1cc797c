"""Key-shifted ~10x replication of a testdata dir — the first empirical
scale point above sf0.1 (round-9 directive #1).

Every 100x-scale claim in this repo had rested on plan-shape pins and
reasoning; this builds an sf1-shaped fixture the oracle gate and bench can
actually run, to expose hidden superlinear stages (banding blowup, state
growth, AQE strategy flips) that sf0.1 cannot.

Replication is NOT verbatim: verbatim copies would give every document ten
exact clones and every embedding ten duplicates, so the pair-enumerating
queries (LSH near-dup, embedding near-dup, connected components) would
measure an artificial O(replicas^2) output blowup instead of the ~linear
growth a real 10x corpus has. Instead each replica r:

- shifts every id/FK family by r * stride (strides are powers of 10 above
  each family's max, so replicas never collide and FKs stay consistent:
  o_custkey moves with c_custkey, l_orderkey with o_orderkey, ...);
- Caesar-ciphers document text by r (letters rotate within a-z/A-Z):
  length-, whitespace-, punctuation- and word-structure-preserving, so
  n_chars stays truthful and quality_score/word_count/diversity are
  IDENTICAL per replica, while shingle sets map bijectively — within-
  replica dup/near-dup structure is preserved exactly and cross-replica
  Jaccard is ~0 (lang_id flips to 'und' on ciphered copies, which is fine:
  the corpus queries filter on the stored `lang` column, kept verbatim);
- circularly rotates each embedding vector by r positions: norms and all
  WITHIN-replica pairwise dot products are bit-preserved (the same
  permutation is applied to both sides), while cross-replica cosines
  decorrelate — near-dup families stay their original size.

region/nation are dimension tables and stay single copies. Timestamps are
kept verbatim: replicas model MORE USERS over the SAME time range, so
windows/sessions/watermark state grow in width, not in history.

Each replica lands as one part file inside a `{table}.parquet` DIRECTORY
(the layout Spark sinks produce; both spark.read.parquet and the oracle's
glob dispatch on it) — natural read parallelism, bounded writer memory.

Usage:
    python tools/scale_fixture.py [replicas] [src_dir] [dest_dir]
    python tools/check_correctness.py /tmp/sf1
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

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


def _cipher(text: str | None, r: int) -> str | None:
    if text is None or r == 0:
        return text
    lo = "abcdefghijklmnopqrstuvwxyz"
    hi = lo.upper()
    tbl = str.maketrans(lo + hi, lo[r:] + lo[:r] + hi[r:] + hi[:r])
    return text.translate(tbl)


def _replica(name: str, tbl: pa.Table, r: int) -> pa.Table:
    for col, fam in SHIFTS.get(name, {}).items():
        i = tbl.schema.get_field_index(col)
        typ = tbl.schema.field(col).type
        shifted = pc.add(tbl.column(col), pa.scalar(r * STRIDES[fam], typ))
        tbl = tbl.set_column(i, col, shifted)
    if r and name == "documents":
        i = tbl.schema.get_field_index("text")
        vals = [_cipher(t, r % 25 + 1) for t in tbl.column("text").to_pylist()]
        tbl = tbl.set_column(i, "text", pa.array(vals, pa.string()))
    if r and name == "embeddings":
        i = tbl.schema.get_field_index("embedding")
        vals = [v if not v else v[r:] + v[:r]
                for v in tbl.column("embedding").to_pylist()]
        tbl = tbl.set_column(i, "embedding", pa.array(vals, tbl.schema.field(i).type))
    return tbl


def build(src: str, dest: str, replicas: int) -> None:
    os.makedirs(dest, exist_ok=True)
    for name in DIMS:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dest}/{name}.parquet")
    for name in SHIFTS:
        srct = pq.read_table(f"{src}/{name}.parquet")
        out = f"{dest}/{name}.parquet"
        os.makedirs(out, exist_ok=True)
        for r in range(replicas):
            pq.write_table(_replica(name, srct, r),
                           f"{out}/part-{r:02d}.parquet")
        print(f"{name}: {srct.num_rows} x {replicas} rows", flush=True)


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    build(src, dest, replicas)
    print(f"scale fixture ({replicas}x {src}) at {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
