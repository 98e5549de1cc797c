"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``nursing_home_data_etl_pipeline_spark.plans`` — this
module only adapts the catalog to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nursing_home_data_etl_pipeline_spark.plans import catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the provider-transform pattern — universal
    cleaning semantics + broadcast left-join enrichment chain
    (customer ⟕ nation ⟕ region), per SURVEY.md §7.1."""
    return catalog.entries()["left_join_enrich"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys missing here are the declared
    non-SQL-expressible ops (driver does a rows-only check)."""
    return catalog.oracles()
