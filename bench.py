"""Benchmark: run every catalog query at $SPARK_GRAFT_SF_DIR (default
sf0.1) and print ONE JSON line with per-query wall-clock seconds. Each
query fully executes via the ``noop`` sink, timed end-to-end including
planning; a warm-up pass amortizes one-time JVM/codegen/streaming startup.

``--warm N`` runs N INTERLEAVED passes in one session, reporting
per-query MIN (headline ``queries``) and MEDIAN (``queries_median``) —
single-pass totals historically swung 63-235 s, so BASELINE.md bands come
from a --warm run and the driver's single-pass regime is judged against
them per-query."""

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


def _calib_ref_sec(spark, reps: int = 3) -> float:
    """Fixed trivial-floor reference (VERDICT r15 #2): xxhash64-sum over
    4M generated rows on 8 partitions via the noop sink. No table input
    and no engine code under test, so the time moves only with the HOST
    (CPU contention, scheduling) — r15's 32-core driver run regressed
    untouched queries up to 9x with no plan change and only an 8-core
    rerun exposed it. Min of ``reps`` so one scheduling hiccup can't
    fake a slow host."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        # xor-fold, not sum: summing 4M hashes overflows long under ANSI
        execute(spark.range(0, 1 << 22, 1, 8).selectExpr(
            "bit_xor(xxhash64(id)) AS h"))
        best = min(best, time.time() - t0)
    return round(best, 3)


def _loadavg_1m() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # platform without loadavg: calibration stays best-effort
        return -1.0


def main() -> int:
    warm_n = 1
    argv = sys.argv[1:]
    if "--warm" in argv:  # positional-agnostic; ADVICE r9: argv[:1] check
        i = argv.index("--warm")
        # Plain int() parse + explicit >=1 check: lstrip('-')+clamp used to
        # silently accept --warm -3 as 1 (ADVICE r10).
        try:
            warm_n = int(argv[i + 1])
        except (IndexError, ValueError):
            warm_n = 0
        if warm_n < 1:
            print("usage: bench.py [--warm N]  (N >= 1)", file=sys.stderr)
            return 2
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

    # Host calibration brackets the timed region (start AND end): the
    # ratio ref_sec/its historical floor is a mechanical host-health
    # check for any consumer comparing runs across dates.
    load_start, ref_start = _loadavg_1m(), _calib_ref_sec(spark)

    samples: dict[str, list[float]] = {n: [] for n in catalog.entries()}
    for _ in range(warm_n):
        for name, entry in sorted(catalog.entries().items()):
            t0 = time.time()
            try:
                execute(entry.spark(spark, sf_dir))
                samples[name].append(round(time.time() - t0, 2))
            except Exception as ex:
                samples[name].append(-1.0)
                print(f"bench error in {name}: {ex!r}", file=sys.stderr)
            finally:
                from nursing_home_data_etl_pipeline_spark.plans.queries_streaming import (  # noqa: E501
                    cleanup_drains,
                )

                cleanup_drains()

    def _min(v: list[float]) -> float:
        ok = [t for t in v if t >= 0]
        return min(ok) if ok else -1.0

    def _median(v: list[float]) -> float:
        ok = sorted(t for t in v if t >= 0)
        return ok[len(ok) // 2] if ok else -1.0

    timings = {n: _min(v) for n, v in samples.items()}
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # A failed query is timed -1.0 and EXCLUDED from the total, which
    # would otherwise read as a perf WIN; surface the failure count as a
    # first-class field so metric consumers can't miss it. Any errored
    # iteration marks the query failed even if a retry passed.
    n_errors = sum(1 for v in samples.values() if any(t < 0 for t in v))
    # ONE compact JSON line, nothing after it: harnesses that capture only a
    # bounded output tail must still see the complete line (round-1 bench
    # output exceeded such a window and failed to parse).
    sys.stdout.flush()
    record = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": n_errors,
        "sf": sf,
        # Additions-only calibration block (VERDICT r15 #2); existing
        # fields, env vars and the one-line contract are untouched.
        "calib": {
            "cpu_count": os.cpu_count(),
            "loadavg_1m_start": load_start,
            "loadavg_1m_end": _loadavg_1m(),
            "ref_sec_start": ref_start,
            "ref_sec_end": _calib_ref_sec(spark),
        },
    }
    if warm_n > 1:
        record["warm"] = warm_n
        record["queries_median"] = {n: _median(v) for n, v in samples.items()}
    print(json.dumps(record, separators=(",", ":")))
    # Exit nonzero when any query errored: a broken run (worst case, a
    # missing sf_dir erroring ALL queries) otherwise reports value=0 with
    # exit 0 — the fastest-possible fake perf win for any consumer that
    # gates on the exit code (round-8 tooling review). The JSON line above
    # still carries per-query detail either way.
    return 1 if n_errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
