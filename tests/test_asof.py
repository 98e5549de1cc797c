from __future__ import annotations

import datetime as dt

from nursing_home_data_etl_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00"), "a"),
            ("u1", _ts("2024-01-01T12:00"), "b"),
            ("u2", _ts("2024-01-01T09:00"), "c"),  # before any right row
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00"), 1.0),  # equal ts -> matches (inclusive)
            ("u1", _ts("2024-01-01T11:00"), 2.0),
            ("u2", _ts("2024-01-01T09:30"), 9.0),
        ],
        ["k", "ts", "v"],
    )
    out = {r.tag: (r.v_asof, r.ts_asof) for r in
           asof_join(left, right, "k", "ts", "ts", ["v"]).collect()}
    assert out["a"] == (1.0, _ts("2024-01-01T10:00"))  # ties inclusive
    assert out["b"] == (2.0, _ts("2024-01-01T11:00"))  # latest prior
    assert out["c"] == (None, None)  # no match -> nulls


def test_asof_multiple_value_cols_default(spark):
    left = spark.createDataFrame([("k", 2, "L")], ["k", "ts", "l"])
    right = spark.createDataFrame([("k", 1, "x", 5)], ["k", "ts", "a", "b"])
    row = asof_join(left, right, "k", "ts", "ts").collect()[0]
    assert (row.a_asof, row.b_asof, row.ts_asof) == ("x", 5, 1)
