"""Local mirror of the driver's t2 correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [--offload] [query ...]

``--offload`` (round-11 #1, for the sf10+ gates): compare INSIDE DuckDB —
Spark result to parquet, EXCEPT ALL both ways (exact multiset; doubles
half-away-rounded to 6 on BOTH sides, -0.0 normalized) instead of
collecting ~40M rows into Python. Weaker than plans.verify only on
cross-TYPE confusions (pinned by the strict sf0.01 gate);
close_round.py proves the two gates agree at sf0.1 each close."""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile
import time

# Repo root by FILE location, not cwd (robustness_matrix imports this
# module from arbitrary cwds).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nursing_home_data_etl_pipeline_spark.functions.vectors import (  # noqa: E402
    duck_round_sql,
)
from nursing_home_data_etl_pipeline_spark.plans.verify import (  # noqa: E402
    compare_query,
    duckdb_connection,
)


#: The driver contract pins the catalog at EXACTLY this many queries — a
#: shrunken registry once printed '0 failures' having checked NOTHING.
EXPECTED_CATALOG = 50


def _canon_select(con, rel: str) -> str:
    """Column list for the offloaded compare: sorted by name (the driver
    hashes column-name-sorted values); doubles rounded via duck_round_sql
    (half-away on BOTH sides — one rounding decision at 1e-6 midpoints),
    -0.0 normalized via +0; double arrays element-rounded."""
    cols = con.execute(f"DESCRIBE {rel}").fetchall()
    parts = []
    for c, t, *_ in sorted(cols):
        q, tu = f'"{c}"', t.upper()
        if tu in ("DOUBLE", "FLOAT", "REAL"):
            parts.append(f"{duck_round_sql(q)} + 0 AS {q}")
        elif tu in ("DOUBLE[]", "FLOAT[]", "REAL[]"):
            parts.append(
                f"list_transform({q}, x -> {duck_round_sql('x')} + 0) AS {q}")
        else:
            parts.append(q)
    return ", ".join(parts)


def _stream(con, sql: str):
    yield from con.execute(sql).fetch_record_batch(1 << 20)


def _union_find(con, vertex_sql: str, pair_sql: str):
    """Streamed union-find (round-12 #1 pattern): O(distinct vertices)
    memory; union by MIN so every root IS its component's minimum label.
    Rationale: docs/TOOLS.md#check-correctness-union-find"""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for batch in _stream(con, vertex_sql):
        for v in batch.column(0).to_pylist():
            parent[v] = v
    for batch in _stream(con, pair_sql):
        for a, b in zip(batch.column(0).to_pylist(),
                        batch.column(1).to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return parent, find


def _register_sig_pairs(con, src_sql: str) -> None:
    """Register Python-built MinHash sigs as ``_py_sig`` + a ``_mh_pairs``
    band-join view (round-13: the DuckDB shingle chain's spill exceeded
    the DISK at the skew2 tail; sigs are O(1) state per doc here). Spec
    twin of _duck_minhash_sig_cte — md5 per DISTINCT shingle, 48-bit
    halves, MIN((h1+s*h2)%P); duplicate doc_id rows merge by min."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from nursing_home_data_etl_pipeline_spark.operators.dedup import (
        MINHASH_P as P,
    )
    from nursing_home_data_etl_pipeline_spark.plans.queries_northstar import (
        _NUM_HASHES,
        _band_selects_sql,
    )

    S = np.arange(_NUM_HASHES, dtype=np.uint64)
    sigs: dict[int, np.ndarray] = {}
    for batch in _stream(con, src_sql):
        for d, t in zip(batch.column(0).to_pylist(),
                        batch.column(1).to_pylist()):
            norm = _py_norm(t)
            if not norm:
                continue
            w = norm.split(" ")
            sh = (set(zip(w, w[1:], w[2:], w[3:], w[4:]))
                  if len(w) >= 5 else {tuple(w)})
            h = np.empty((len(sh), 2), dtype=np.uint64)
            for i, tup in enumerate(sh):
                dg = hashlib.md5(" ".join(tup).encode()).digest()
                h[i, 0] = int.from_bytes(dg[:6], "big")
                h[i, 1] = int.from_bytes(dg[6:12], "big")
            # h1 + s*h2 < 2^53: exact in uint64
            m = ((h[:, :1] + S[None, :] * h[:, 1:2]) % P).min(axis=0)
            prev = sigs.get(d)
            sigs[d] = m if prev is None else np.minimum(prev, m)
    ids = list(sigs)
    cols = {"doc_id": pa.array(ids, pa.int64())}
    for s in range(_NUM_HASHES):
        cols[f"mh_{s}"] = pa.array(
            [int(sigs[d][s]) for d in ids], pa.int64())
    con.register("_py_sig", pa.table(cols))
    con.execute(f"""CREATE OR REPLACE TEMP VIEW _mh_pairs AS
      WITH bands AS ({_band_selects_sql("_py_sig")})
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""")


def _clusters_offloaded(spark, con, name, fn, oracle, sf_dir, tmp) -> list[str]:
    """Offload override for ``dedup_clusters`` (round-12 #1 + round-13
    py-sig rewrite): Python MinHash sigs -> SQL band join -> streamed
    union-find; parity-checked each close.
    Rationale: docs/TOOLS.md#check-correctness-union-find"""
    sdf = fn(spark, sf_dir)
    path = os.path.join(tmp, name)
    sdf.write.mode("overwrite").parquet(path)
    scols = sorted(sdf.columns)
    if scols != ["cluster_id", "cluster_size", "doc_id"]:
        return [f"schema: spark={scols} "
                "oracle=['cluster_id', 'cluster_size', 'doc_id']"]

    _register_sig_pairs(
        con, "SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL")
    parent, find = _union_find(
        con, "SELECT doc_id FROM documents WHERE doc_id IS NOT NULL",
        "SELECT id_a, id_b FROM _mh_pairs")
    n_vertices = len(parent)
    size: dict[int, int] = {}
    for v in list(parent):
        r = find(v)
        size[r] = size.get(r, 0) + 1

    # duplicate/missing vertices checked in DuckDB (no Python seen-set)
    ns, nd = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM '{path}/*.parquet'"
    ).fetchone()
    if ns != n_vertices or nd != ns:
        return [f"rowcount: spark={ns} ({nd} distinct) oracle={n_vertices}"]
    bad = 0
    for batch in _stream(
        con, f"SELECT doc_id, cluster_id, cluster_size FROM '{path}/*.parquet'"
    ):
        for d, c, n in zip(*(batch.column(i).to_pylist() for i in range(3))):
            r = parent.get(d) is not None and find(d)
            if r is False or c != r or n != size[r]:
                bad += 1
    return [f"values: {bad} rows differ (union-find oracle)"] if bad else []


def _training_offloaded(spark, con, name, fn, oracle, sf_dir, tmp) -> list[str]:
    """Offload override for ``training_corpus`` (round-13: its SQL oracle
    carried BOTH the disk-filling shingle chain AND the r11-OOM recursive
    CC): quality gate + final projection stay SQL (linear), MinHash sigs
    in Python, band join over the per-doc sig table, clusters via the
    streamed union-find. Parity + corruption pinned in tests."""
    import pyarrow as pa

    from nursing_home_data_etl_pipeline_spark.functions.text import (
        duck_norm_sql,
        duck_words_sql,
    )
    from nursing_home_data_etl_pipeline_spark.plans.queries_sampling import (
        _DUCK_QUALITY,
        _QUALITY_MIN,
    )

    scols, path = _spark_to_parquet(spark, fn, sf_dir, tmp, name)
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE _kept AS "
        f"SELECT doc_id, text, lang FROM documents "
        f"WHERE {_DUCK_QUALITY} >= {_QUALITY_MIN} "
        f"AND lang IN ('en', 'de', 'es', 'fr')")
    _register_sig_pairs(
        con, "SELECT doc_id, text FROM _kept WHERE doc_id IS NOT NULL")
    parent, find = _union_find(
        con, "SELECT doc_id FROM _kept WHERE doc_id IS NOT NULL",
        "SELECT id_a, id_b FROM _mh_pairs")
    reps = [v for v in parent if find(v) == v]
    con.register("_py_reps", pa.table({"doc_id": pa.array(reps, pa.int64())}))
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE _o AS "
        f"SELECT k.doc_id, k.lang, md5({duck_norm_sql('k.text')}) AS fp, "
        f"CAST(len({duck_words_sql('k.text')}) AS BIGINT) AS n_words "
        f"FROM _kept k JOIN _py_reps USING (doc_id)")
    con.unregister("_py_reps")
    return _diff_vs_o(con, scols, path)


_PY_WS = re.compile("[ \t\n\x0b\f\r]+")


def _py_norm(t: str | None) -> str | None:
    """Python twin of normalize_text / duck_norm_sql: lower, collapse each
    Java-\\s run to one space, SPACE-only trim (NBSP/U+3000 kept)."""
    return t if t is None else _PY_WS.sub(" ", t.lower()).strip(" ")


def _stream_docs(con):
    for b in _stream(con, "SELECT doc_id, text FROM documents"):
        yield from zip(b.column(0).to_pylist(), b.column(1).to_pylist())


def _chunks_offloaded(spark, con, name, fn, oracle, sf_dir, tmp) -> list[str]:
    """Offload override for ``chunk_documents`` (round-13 #3): linear
    streamed Python chunker replacing the ~quadratic unnest-join oracle;
    same EXCEPT-ALL tail. Parity + corruption rejection pinned in
    tests/test_catalog_oracle.py. Rationale: docs/TOOLS.md#streamed-oracles"""
    import pyarrow as pa

    scols, path = _spark_to_parquet(spark, fn, sf_dir, tmp, name)
    cols = {"doc_id": [], "chunk_id": [], "chunk_text": [], "n_words": []}
    for d, t in _stream_docs(con):
        norm = _py_norm(t)
        if not norm:  # NULL/blank docs yield NO chunks (chunk_table)
            continue
        w = norm.split(" ")
        for i in range(max(-(-(len(w) - 10) // 40), 1)):
            c = w[i * 40:i * 40 + 50]
            cols["doc_id"].append(d)
            cols["chunk_id"].append(i)
            cols["chunk_text"].append(" ".join(c))
            cols["n_words"].append(len(c))
    con.register("_py_o", pa.table(cols, schema=pa.schema(
        [("doc_id", pa.int64()), ("chunk_id", pa.int64()),
         ("chunk_text", pa.large_string()), ("n_words", pa.int64())])))
    con.execute("CREATE OR REPLACE TEMP TABLE _o AS SELECT * FROM _py_o")
    con.unregister("_py_o")
    return _diff_vs_o(con, scols, path)


def _near_pairs_offloaded(spark, con, name, fn, oracle, sf_dir, tmp) -> list[str]:
    """Offload override for ``dedup_near_pairs`` (round-13 #3): streamed
    Python shingler (identity = stable md5 digest — ADVICE r13; a
    collision can only perturb toward a loud FAIL) feeding the UNCHANGED
    SQL pair join/cap/threshold; simhash stays SQL. Parity + corruption
    pinned in tests/test_catalog_oracle.py; docs/TOOLS.md#streamed-oracles"""
    import hashlib

    import pyarrow as pa

    from nursing_home_data_etl_pipeline_spark.operators.dedup import (
        HOT_SHINGLE_CAP,
    )
    from nursing_home_data_etl_pipeline_spark.plans.queries_northstar import (
        _JACCARD_THRESHOLD,
        _simhash_pairs_oracle,
    )

    scols, path = _spark_to_parquet(spark, fn, sf_dir, tmp, name)
    ids: list[int] = []
    hs: list[int] = []
    for d, t in _stream_docs(con):
        norm = _py_norm(t)
        if not norm:
            continue
        w = norm.split(" ")
        sh = (set(zip(w, w[1:], w[2:], w[3:], w[4:]))
              if len(w) >= 5 else {tuple(w)})  # whole text when short
        ids.extend([d] * len(sh))
        # Stable 64-bit digest (NOT Python's salted hash(): PYTHONHASHSEED
        # made a red gate non-reproducible across processes — ADVICE r13).
        hs.extend(
            int.from_bytes(
                hashlib.md5(" ".join(tup).encode()).digest()[:8], "big"
            ) - (1 << 63)
            for tup in sh
        )
    con.register("_py_sh", pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "s": pa.array(hs, pa.int64())}))
    j = "CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)"
    con.execute(f"""
    CREATE OR REPLACE TEMP TABLE _o AS
    SELECT 'simhash' AS variant, id_a, id_b,
           CAST(hamming AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS score
    FROM ({_simhash_pairs_oracle()})
    UNION ALL
    SELECT 'jaccard', id_a, id_b, CAST(n_common AS BIGINT), {duck_round_sql(j)}
    FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM _py_sh a
      JOIN (SELECT s FROM _py_sh GROUP BY s
            HAVING COUNT(*) <= {HOT_SHINGLE_CAP}) cold ON cold.s = a.s
      JOIN _py_sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    JOIN (SELECT doc_id, COUNT(*) AS n FROM _py_sh GROUP BY doc_id) sa
      ON sa.doc_id = id_a
    JOIN (SELECT doc_id, COUNT(*) AS n FROM _py_sh GROUP BY doc_id) sb
      ON sb.doc_id = id_b
    WHERE {duck_round_sql(j)} >= {_JACCARD_THRESHOLD}
    """)
    con.unregister("_py_sh")
    return _diff_vs_o(con, scols, path)


#: per-query offload oracle overrides — same signature as compare_offloaded
OFFLOAD_OVERRIDES = {
    "dedup_clusters": _clusters_offloaded,
    "chunk_documents": _chunks_offloaded,
    "dedup_near_pairs": _near_pairs_offloaded,
    "training_corpus": _training_offloaded,
}


def _spark_to_parquet(spark, fn, sf_dir, tmp, name) -> tuple[list[str], str]:
    sdf = fn(spark, sf_dir)
    path = os.path.join(tmp, name)
    sdf.write.mode("overwrite").parquet(path)
    return sdf.columns, path


def _diff_vs_o(con, scols: list[str], path: str) -> list[str]:
    """EXCEPT-ALL both-ways diff of the Spark parquet at ``path`` against a
    prepared ``_o`` relation — the shared tail of the plain offloaded
    compare and the streamed-oracle overrides."""
    con.execute(f"CREATE OR REPLACE TEMP VIEW _s AS "
                f"SELECT * FROM '{path}/*.parquet'")
    scols = sorted(scols)
    ocols = sorted(r[0] for r in con.execute("DESCRIBE _o").fetchall())
    if scols != ocols:
        return [f"schema: spark={scols} oracle={ocols}"]
    ns, no = con.execute(
        "SELECT (SELECT COUNT(*) FROM _s), (SELECT COUNT(*) FROM _o)"
    ).fetchone()
    if ns != no:
        return [f"rowcount: spark={ns} oracle={no}"]
    sel_s, sel_o = _canon_select(con, "_s"), _canon_select(con, "_o")
    diff = con.execute(
        f"SELECT COUNT(*) FROM ("
        f"(SELECT {sel_s} FROM _s EXCEPT ALL SELECT {sel_o} FROM _o)"
        f" UNION ALL "
        f"(SELECT {sel_o} FROM _o EXCEPT ALL SELECT {sel_s} FROM _s))"
    ).fetchone()[0]
    return [f"values: {diff} rows differ (multiset, both directions)"] if diff else []


def compare_offloaded(spark, con, name, fn, oracle, sf_dir, tmp) -> list[str]:
    scols, path = _spark_to_parquet(spark, fn, sf_dir, tmp, name)
    con.execute(f"CREATE OR REPLACE TEMP TABLE _o AS {oracle}")
    return _diff_vs_o(con, scols, path)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--offload"]
    offload = "--offload" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from nursing_home_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb_connection(sf_dir)
    if offload:
        # scale-gate oracles (sf10 skew: shingle blowup from the 1000x
        # doc-length tail) can exceed RAM; cap DuckDB and let it SPILL
        # instead of drawing the OOM killer (round-12 skew gate was killed
        # at 85 GB RSS with default limits). Env-tunable for smaller hosts.
        lim = os.environ.get("SPARK_GRAFT_DUCK_MEM", "60GB")
        spill = os.path.join(tempfile.gettempdir(), "duck_spill")
        con.execute(f"SET memory_limit='{lim}'")
        con.execute(f"SET temp_directory='{spill}'")

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # A typo'd or RENAMED query (round-6 consolidations renamed several)
        # must not let the gate print '0 failures' without checking anything.
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    if not only and len(qs) != EXPECTED_CATALOG:
        print(
            f"ERROR: catalog has {len(qs)} queries, expected "
            f"{EXPECTED_CATALOG} — a full-gate green on a shrunken "
            "registry is meaningless"
        )
        return 2
    failures = []
    tmp = tempfile.mkdtemp(prefix="offload_gate_") if offload else None
    try:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                if offload and name in oracles:
                    cmp_fn = OFFLOAD_OVERRIDES.get(name, compare_offloaded)
                    problems = cmp_fn(
                        spark, con, name, fn, oracles[name], sf_dir, tmp)
                else:
                    problems = compare_query(
                        spark, con, fn, oracles.get(name), sf_dir)
            except Exception as ex:
                failures.append(name)
                print(f"FAIL  {name}: error {str(ex)[:300]}")
                continue
            finally:
                # inside the loop so a raising compare still frees its
                # (sf10-sized) parquet before the next query runs
                if tmp:
                    shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)
                from nursing_home_data_etl_pipeline_spark.plans.queries_streaming import (  # noqa: E501
                    cleanup_drains,
                )

                cleanup_drains()
            dt = time.time() - t0
            if problems:
                failures.append(name)
                print(f"FAIL  {name}: " + "; ".join(p[:400] for p in problems))
            elif name not in oracles:
                print(f"ok?   {name}: rows-only ({dt:.1f}s)")
            else:
                print(f"PASS  {name} ({dt:.1f}s)")
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
