from __future__ import annotations

import pytest

from nursing_home_data_etl_pipeline_spark.operators.joins import (
    anti_join,
    latest_per_key,
    left_enrich,
    merge_scd1,
    semi_join,
)
from nursing_home_data_etl_pipeline_spark.operators.projections import (
    drop_columns_if_present,
    select_columns,
    select_columns_matching,
)


@pytest.fixture()
def provider(spark):
    return spark.createDataFrame(
        [
            ("F1", "Sunny", "5", "4.0", "2021-01-01"),
            ("F2", "Shady", "3", "2.5", "2021-02-01"),
        ],
        ["facility_number", "facility_name", "overall_rating",
         "adjusted_total_nurse_staffing_hours", "rating_cycle_1_date"],
    )


def test_select_columns_strict(provider):
    with pytest.raises(ValueError):
        select_columns(provider, ["nope"])
    out = select_columns(provider, ["nope", "facility_number"], strict=False)
    assert out.columns == ["facility_number"]


def test_name_predicate_projection_sorted(provider):
    out = select_columns_matching(
        provider, keywords=("rating",), always_include=("facility_number",)
    )
    # sorted output order for deterministic hashes (SURVEY §7.3d)
    assert out.columns == sorted(
        ["facility_number", "overall_rating", "rating_cycle_1_date"]
    )


def test_drop_if_present(provider):
    out = drop_columns_if_present(provider, ["facility_name", "not_there"])
    assert "facility_name" not in out.columns


def test_left_enrich_null_semantics(spark):
    left = spark.createDataFrame([("F1",), ("F2",)], ["facility_number"])
    right = spark.createDataFrame(
        [("F1", "ok", "Sunny")], ["facility_number", "survey", "facility_name"]
    )
    out = left_enrich(left, right, on="facility_number",
                      drop_from_other=["facility_name"]).collect()
    by_key = {r.facility_number: r.survey for r in out}
    assert by_key == {"F1": "ok", "F2": None}


def test_anti_and_semi(spark):
    files = spark.createDataFrame([("a",), ("b",), ("c",)], ["file_id"])
    ledger = spark.createDataFrame([("a",)], ["file_id"])
    assert {r.file_id for r in anti_join(files, ledger, "file_id").collect()} == {"b", "c"}
    assert {r.file_id for r in semi_join(files, ledger, "file_id").collect()} == {"a"}


def test_merge_scd1_upsert(spark):
    target = spark.createDataFrame(
        [("F1", "old", 1), ("F2", "keep", 2)], ["pk", "val", "n"]
    )
    source = spark.createDataFrame(
        [("F1", "new", 10), ("F3", "ins", 30)], ["pk", "val", "n"]
    )
    out = {r.pk: (r.val, r.n) for r in merge_scd1(target, source, ["pk"]).collect()}
    assert out == {"F1": ("new", 10), "F2": ("keep", 2), "F3": ("ins", 30)}


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [("F1", "a", 1), ("F1", "b", 3), ("F1", "c", 2)], ["pk", "val", "ver"]
    )
    out = latest_per_key(df, ["pk"], "ver").collect()
    assert len(out) == 1 and out[0].val == "b"
