"""Skew diagnostic: per-key frequency head and partition-size histogram for
a parquet table — the first report to pull when a join or aggregation stage
stalls on a straggler at scale.

    python tools/skew_report.py <table.parquet> <key_col> [key_col2 ...]

Prints (a) the top-10 hottest key values with their share of all rows (the
decision input for salted_join / salted_group_agg thresholds), and (b) the
row-count distribution over the table's current partitions (via
spark_partition_id — detects files/partitions that will become straggler
tasks). Read-only; runs one aggregation per report section.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def report(spark, path: str, keys: list[str]) -> dict:
    from pyspark.sql import functions as F

    # Same accommodation read_table makes: Spark 4 rejects TIMESTAMP(NANOS)
    # parquet columns unless read as long. Harmless for non-nano tables, and
    # this report only counts rows/keys — no timestamp math.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # _cnt, not a bare name: a key column literally named "n" must not be
    # shadowed by the count in the output rows.
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc())
        .limit(10)
        .collect()
    )
    # The partition histogram's per-partition counts also sum to the table
    # total — one aggregation pass serves both sections (no separate count()).
    parts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("partitions"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
            F.min("n").alias("min_rows"),
            F.expr("percentile(n, 0.5)").alias("p50_rows"),
            F.max("n").alias("max_rows"),
        )
        .collect()[0]
    )
    total = parts["total"]
    return {
        "total_rows": total,
        "hot_keys": [
            {
                **{k: r[k] for k in keys},
                "n": r["_cnt"],
                "share": round(r["_cnt"] / total, 4) if total else None,
            }
            for r in hot
        ],
        "partitions": parts["partitions"],
        "partition_rows": {
            "min": parts["min_rows"],
            "p50": parts["p50_rows"],
            "max": parts["max_rows"],
        },
    }


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    import json

    from nursing_home_data_etl_pipeline_spark.session import get_spark

    out = report(get_spark("skew_report"), sys.argv[1], sys.argv[2:])
    print(json.dumps(out, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
