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
from pyspark.sql import Row

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FLOAT_DECIMALS = 6


class _Tag:
    """Private, non-constructible-from-data canonicalization markers. Design
    notes: docs/DESIGN.md#verify--tag"""

    __slots__ = ("label",)

    def __init__(self, label: str) -> None:
        self.label = label

    def __repr__(self) -> str:  # readable in failure diffs
        return self.label


_NAN = _Tag("<NaN>")
#: bytes tag: bare v.hex() made a BINARY result compare equal to its hex
#: VARCHAR on the other side (false-PASS on a real type divergence).
_BYTES = _Tag("<bytes>")
#: bool tag: Python True == 1 == 1.0, so an engine BOOLEAN column compared
#: equal to an oracle writing 0/1 integers — a masked type divergence.
#: (int vs float cross-type equality is KEPT: value equality at 6 rounded
#: decimals is the comparator's documented float policy.)
_BOOL = _Tag("<bool>")


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
    # bool before anything (it is an int subclass)
    if isinstance(v, bool):
        return (_BOOL, v)
    if isinstance(v, float):
        if math.isnan(v):
            return _NAN
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, bytes):
        return (_BYTES, v.hex())
    if isinstance(v, Row):
        # Row is a TUPLE subclass — without this branch structs fell
        # through uncanonicalized (round-8 comparator review); keyed like
        # dict so Spark struct == DuckDB STRUCT.
        return tuple(sorted((k, canon(x)) for k, x in v.asDict().items()))
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    # decimal.Decimal passes through EXACT (money gates depend on it);
    # DECIMAL-vs-DOUBLE mismatches fail loudly — emit the same type on
    # both sides (CAST AS DOUBLE convention).
    return v


def canon_rows(columns, rows) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def compare_query(spark, con, spark_fn, oracle: str | None, sf_dir: str) -> list[str]:
    """Run one query both ways; return a list of problems (empty = pass)."""
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    from .queries_streaming import cleanup_drains

    cleanup_drains()  # result fully collected; free any drain parquet now
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
