"""Run every catalog query against its DuckDB oracle at sf0.001 (fast guard;
the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from nursing_home_data_etl_pipeline_spark.plans import catalog
from nursing_home_data_etl_pipeline_spark.plans.verify import (
    compare_query,
    duckdb_connection,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(catalog.entries()))
def test_query_matches_oracle(spark, con, name):
    e = catalog.entries()[name]
    problems = compare_query(spark, con, e.spark, e.oracle, SF_DIR)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_tag_union_rejects_unknown_kwargs(spark):
    """ADVICE r9: a typoed column kwarg must raise, not NULL-fill silently."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    with pytest.raises(ValueError, match="typo_col"):
        catalog.tag_union(df, "v", {"a": "int"}, typo_col=F.lit(1))
