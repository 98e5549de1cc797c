"""Temp-view registration: expose every engine table to plain Spark SQL.

The reference's warehouse consumers query Snowflake views (README.md:
204-206); the engine's equivalent is temp views over the same DataFrames so
``spark.sql("SELECT ... FROM lineitem")`` works everywhere the catalog does.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.verify import TABLES
from ..sources.readers import read_table
from ..sources.writers import recover_dir
from ..zones import ZoneLayout


def register_test_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the driver test tables (TESTDATA.md) as temp views."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)


def register_warehouse_views(spark: SparkSession, zones: ZoneLayout) -> list[str]:
    """Register every warehouse dim as a temp view (dim_facility, ...).

    ``replace_dir`` crash leftovers are healed first, not registered: a
    ``X__old`` with the target missing is a swap that crashed between its
    two renames — ``recover_dir`` restores the real dim before reading —
    and ``__old``/``__staging`` names themselves are backups/partial
    writes, never queryable tables.
    """
    leftovers = [
        d for d in zones.list_domains("warehouse", spark) if d.endswith("__old")
    ]
    for d in leftovers:
        recover_dir(spark, zones.warehouse(d[: -len("__old")]))
    registered = []
    for dim in zones.list_domains("warehouse", spark):
        if dim.endswith(("__old", "__staging")):
            continue
        spark.read.parquet(zones.warehouse(dim)).createOrReplaceTempView(dim)
        registered.append(dim)
    return registered
