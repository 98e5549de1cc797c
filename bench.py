"""Benchmark: run every catalog query at $SPARK_GRAFT_SF_DIR (default sf0.1)
and print ONE JSON line with per-query wall-clock seconds.

Each query is fully executed via the ``noop`` sink (whole plan runs on
executors, nothing collected to the driver), timed end-to-end including
planning. A warm-up pass on a trivial scan amortizes one-time JVM/codegen
startup out of the first query's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nursing_home_data_etl_pipeline_spark.plans import catalog  # noqa: E402
from nursing_home_data_etl_pipeline_spark.session import get_spark  # noqa: E402


def execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Best-effort sf label from the dir name; any non-sfN.N spelling
    # (sf-data, sf_custom) degrades to -1.0 instead of crashing the
    # bench before a single query runs.
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")
    # Warm up the JVM / parquet reader once outside any timed region.
    try:
        execute(spark.read.parquet(f"{sf_dir}/region.parquet"))
    except Exception as ex:
        print(f"bench warm-up failed (bad SPARK_GRAFT_SF_DIR?): {ex!r}", file=sys.stderr)
    # Also warm the Structured Streaming machinery (state-store provider,
    # checkpoint setup, Arrow state serializer, stateful-op Python workers):
    # measured ~9 s of one-time cost that otherwise lands on whichever
    # stateful drain happens to run first. Steady-state per-query numbers
    # are the signal; the warm-up runs the smallest fixture available.
    try:
        # Prefer the smallest sibling fixture of the bench dir (the driver
        # regenerates /root/testdata between rounds; don't hardcode a path
        # that may not exist next round), falling back to sf_dir itself.
        parent = os.path.dirname(sf_dir.rstrip("/"))
        warm_dir = next(
            (
                d
                for d in (
                    os.path.join(parent, "sf0.001"),
                    os.path.join(parent, "sf0.01"),
                )
                if os.path.isdir(d)
            ),
            sf_dir,
        )
        execute(catalog.entries()["streaming_stateful_totals"].spark(spark, warm_dir))
    except Exception as ex:
        print(f"bench streaming warm-up skipped: {ex!r}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, entry in sorted(catalog.entries().items()):
        t0 = time.time()
        try:
            execute(entry.spark(spark, sf_dir))
            timings[name] = round(time.time() - t0, 2)
        except Exception as ex:
            timings[name] = -1.0
            print(f"bench error in {name}: {ex!r}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # A failed query is timed -1.0 and EXCLUDED from the total, which
    # would otherwise read as a perf WIN; surface the failure count as a
    # first-class field so metric consumers can't miss it.
    n_errors = sum(1 for t in timings.values() if t < 0)
    # ONE compact JSON line, nothing after it: harnesses that capture only a
    # bounded output tail must still see the complete line (round-1 bench
    # output exceeded such a window and failed to parse).
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": n_errors,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    # Exit nonzero when any query errored: a broken run (worst case, a
    # missing sf_dir erroring ALL queries) otherwise reports value=0 with
    # exit 0 — the fastest-possible fake perf win for any consumer that
    # gates on the exit code (round-8 tooling review). The JSON line above
    # still carries per-query detail either way.
    return 1 if n_errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
