"""Oracle comparison used by tools/check_correctness.py and the test suite.

Stricter than the driver's order-insensitive value hash: rows are
canonicalized (columns sorted by name, floats rounded to 6 decimals) and
compared as multisets, so a pass here implies a hash match for any
column-name-sorted hashing scheme.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FLOAT_DECIMALS = 6


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def canon_rows(columns, rows) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def compare_query(spark, con, spark_fn, oracle: str | None, sf_dir: str) -> list[str]:
    """Run one query both ways; return a list of problems (empty = pass)."""
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        # Declared non-SQL-expressible: execute-only smoke coverage, but an
        # empty result is still a failure signal — every such query in this
        # catalog is built to produce rows on the driver test data.
        return [] if len(srows) > 0 else ["oracle-less query returned 0 rows"]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sc, oc = canon_rows(scols, srows), canon_rows(ocols, orows)
        if sc != oc:
            extra_s = list((sc - oc).items())[:3]
            extra_o = list((oc - sc).items())[:3]
            problems.append(
                f"values: only-in-spark={extra_s} only-in-oracle={extra_o}"
            )
    return problems
