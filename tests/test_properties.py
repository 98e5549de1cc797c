"""Property-based tests (hypothesis) for the pure driver-side functions and
key operator invariants. Spark-materializing properties use few examples
(each example is a Spark job); pure-Python properties use many."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nursing_home_data_etl_pipeline_spark.operators.cleaning import normalize_name
from nursing_home_data_etl_pipeline_spark.sources.ingest import (
    DEFAULT_FILE_TYPE_MAPPING,
    normalize_filename,
    route_filename,
)

names = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=40
)


@given(names)
def test_normalize_name_idempotent(name):
    once = normalize_name(name)
    assert normalize_name(once) == once


@given(names)
def test_normalize_name_no_specials(name):
    out = normalize_name(name)
    assert not re.search(r"[A-Z() /.\-]", out)
    assert out == out.strip()


@given(names)
def test_route_filename_total(name):
    # every name routes somewhere, and the fallback is the declared default
    domain = route_filename(name)
    assert domain in set(DEFAULT_FILE_TYPE_MAPPING.values())


@given(st.text(alphabet="abcNH_", max_size=20))
def test_normalize_filename_strips_markers(name):
    out = normalize_filename(name)
    assert "NH_" not in out and "_" not in out
    assert out == out.lower()


# --- Spark-backed invariants: few, small examples ---------------------------

rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 100)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(target_rows=rows, source_rows=rows)
def test_merge_scd1_matches_dict_semantics(spark, target_rows, source_rows):
    from nursing_home_data_etl_pipeline_spark.operators.joins import (
        latest_per_key,
        merge_scd1,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("pk", T.StringType()), T.StructField("v", T.LongType())]
    )
    # dedupe inputs per key (MERGE precondition) via latest_per_key
    target = latest_per_key(spark.createDataFrame(target_rows, schema), ["pk"], "v")
    source = latest_per_key(spark.createDataFrame(source_rows, schema), ["pk"], "v")

    expected = {k: max(v for kk, v in target_rows if kk == k) for k, _ in target_rows}
    expected.update(
        {k: max(v for kk, v in source_rows if kk == k) for k, _ in source_rows}
    )
    got = {r.pk: r.v for r in merge_scd1(target, source, ["pk"]).collect()}
    assert got == expected
