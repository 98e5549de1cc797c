"""Oracle comparison used by tools/check_correctness.py and the test suite.

Stricter than the driver's order-insensitive value hash: rows are
canonicalized (columns sorted by name, floats rounded to 6 decimals) and
compared as multisets, so a pass here implies a hash match for any
column-name-sorted hashing scheme.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from collections import Counter

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FLOAT_DECIMALS = 6

#: Non-colliding NaN sentinel: canonicalizing NaN to the STRING 'NaN'
#: would compare equal to a genuine string value 'NaN' on the other side
#: (the schema check compares column names, not types), false-PASSing a
#: query that stringifies a numeric column. A tuple cannot collide with
#: any scalar either engine returns.
_NAN = ("__float_nan__",)


def _require_utc_process() -> None:
    """The comparison is only sound on a UTC host: PySpark's collect()
    materializes TimestampType via the PROCESS-local timezone (the
    session's spark.sql.session.timeZone=UTC pin does not reach that
    conversion path), while DuckDB returns UTC-naive datetimes. On a
    non-UTC host every timestamp-bearing query would spuriously fail —
    make that precondition loud instead of a mystery diff."""
    now = _dt.datetime.now(), _dt.datetime.utcnow()
    if abs((now[0] - now[1]).total_seconds()) > 1:
        raise RuntimeError(
            "oracle comparison requires a UTC process timezone (PySpark "
            "collect() localizes timestamps via the OS zone; DuckDB stays "
            "UTC-naive) — run with TZ=UTC"
        )


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    _require_utc_process()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files; DuckDB can
        # only scan file globs — mirror readers.path_is_dir's dispatch.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return _NAN
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
