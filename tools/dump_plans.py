"""Dump .explain("formatted") for catalog queries into plans/<tag>/
as <query>_<suffix>.txt — the optimization-round evidence files
(plans/r15/<query>_before.txt / _after.txt).

Usage: python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [name ...]

Streaming drains are skipped: entries() executes the stream and returns
the drained sink table, so the batch plan is a LocalTableScan/parquet
scan of results, not the streaming plan (same exclusion as
tools/explain_audit.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

STREAMING = {
    "streaming_windowed_agg",
    "streaming_session_counts",
    "streaming_stateful_totals",
    "streaming_join_dedup",
}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])

    from nursing_home_data_etl_pipeline_spark.plans import catalog
    from nursing_home_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name, entry in sorted(catalog.entries().items()):
        if only and name not in only:
            continue
        if name in STREAMING:
            continue
        df = entry.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n += 1
    print(f"wrote {n} plans to {out_dir}/*_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
