"""Key-shifted ~10x replication of a testdata dir — the first empirical
scale point above sf0.1 (round-9 directive #1; record: SCALE_r09.json).

NOT verbatim replication (that would clone every doc/embedding 10x and
make the pair-enumerating queries measure an artificial O(replicas^2)
blowup instead of a real corpus's ~linear growth). Each replica r:
- shifts every id/FK family by r * stride (powers of 10 above each
  family's max; FKs move with their dimension, so joins stay consistent);
- Caesar-ciphers document text by r: length/whitespace/punctuation/word-
  structure preserving (n_chars stays truthful, quality_score identical),
  shingle sets map bijectively — within-replica dup structure exact,
  cross-replica Jaccard ~0 (lang_id flips to 'und'; fine — corpus queries
  filter on the stored `lang` column, kept verbatim);
- circularly rotates each embedding by r: within-replica dot products
  bit-preserved, cross-replica cosines decorrelate.
region/nation stay single-copy dims; timestamps stay verbatim (more users
over the same time range — window/session state grows in width, not
history). Each replica is one part file in a `{table}.parquet` directory.

Usage: python tools/scale_fixture.py [replicas] [src_dir] [dest_dir];
then gate with check_correctness.py and bench with SPARK_GRAFT_SF_DIR."""

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
    # Cipher shift r % 25 + 1 repeats with period 25: replicas r and r+25
    # would get identical text, silently breaking the cross-replica
    # Jaccard ~0 property the module docstring promises (ADVICE r9).
    if replicas > 25:
        raise ValueError("scale_fixture supports at most 25 replicas "
                         "(Caesar shift period); got %d" % replicas)
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
