"""Local mirror of the driver's t2 correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

# Repo root by FILE location, not cwd: robustness_matrix imports this
# module for EXPECTED_CATALOG, and a '.' insertion would break the package
# import whenever the caller's cwd is not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nursing_home_data_etl_pipeline_spark.plans.verify import (  # noqa: E402
    compare_query,
    duckdb_connection,
)


#: The driver contract pins the catalog at EXACTLY this many queries; a
#: full gate run that checked any other number is itself a failure — an
#: empty or shrunken registry (lost decorator in a merge, partial import
#: refactor) used to print '0 failures' having checked NOTHING
#: (round-8 tooling review, execution-confirmed).
EXPECTED_CATALOG = 50


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from nursing_home_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb_connection(sf_dir)

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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            problems = compare_query(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: error {str(ex)[:300]}")
            continue
        dt = time.time() - t0
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(p[:400] for p in problems))
        elif name not in oracles:
            print(f"ok?   {name}: rows-only ({dt:.1f}s)")
        else:
            print(f"PASS  {name} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
