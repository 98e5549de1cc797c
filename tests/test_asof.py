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


def test_asof_null_value_not_torn_from_older_row(spark):
    """ADVICE round-1 regression: when the matched right row has a NULL in
    one value column, that NULL must survive — carrying columns
    independently would back-fill it from an OLDER right row, tearing the
    attached values across two different right rows."""
    left = spark.createDataFrame([("k", 10, "L")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [
            ("k", 1, 100.0, "old"),
            ("k", 5, None, "new"),  # the matched row: v is legitimately NULL
        ],
        ["k", "ts", "v", "label"],
    )
    row = asof_join(left, right, "k", "ts", "ts", ["v", "label"]).collect()[0]
    assert row.label_asof == "new"
    assert row.v_asof is None  # NOT 100.0 from the older row
    assert row.ts_asof == 5  # timestamp agrees with the row the values came from


def test_asof_reserved_field_name_rejected(spark):
    import pytest

    left = spark.createDataFrame([("k", 1)], ["k", "ts"])
    right = spark.createDataFrame([("k", 1, 2)], ["k", "ts", "__rts"])
    with pytest.raises(ValueError, match="__rts"):
        asof_join(left, right, "k", "ts", "ts", ["__rts"])


def test_asof_sql_null_semantics(spark):
    """NULL keys and NULL timestamps follow SQL join semantics: a right row
    with a NULL key or NULL ts never matches (c.key = p.key / p.ts <= c.ts
    are never true for NULL); NULL-key/-ts LEFT rows emit with no match.
    Previously the union+window grouped NULL keys together and sorted NULL
    timestamps first, attaching matches SQL would never produce."""
    left = spark.createDataFrame(
        [(None, 10, "null_key"), ("k", None, "null_ts"), ("k", 50, "real")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(None, 5, 1.0), ("k", None, 2.0), ("k", 40, 3.0)],
        "k string, ts long, v double",
    )
    out = {r.tag: (r.v_asof, r.ts_asof) for r in
           asof_join(left, right, "k", "ts", "ts", ["v"]).collect()}
    assert out["null_key"] == (None, None)
    assert out["null_ts"] == (None, None)
    assert out["real"] == (3.0, 40)


def test_asof_duplicate_right_ts_deterministic(spark):
    """Duplicate (key, ts) right rows: the carried row is the struct-max
    duplicate, identically on every run/partitioning."""
    left = spark.createDataFrame([("k", 10)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 5, 2.0)], "k string, ts long, v double"
    ).repartition(4)
    got = {
        asof_join(left, right, "k", "ts", "ts", ["v"]).collect()[0].v_asof
        for _ in range(5)
    }
    assert got == {2.0}


def test_asof_map_typed_value_column(spark):
    """Map-typed payload columns are not orderable; they must be CARRIED by
    the as-of join without entering the tiebreak ordering (ordering by the
    full payload struct failed analysis with INVALID_ORDERING_TYPE)."""
    left = spark.createDataFrame([("k", 10), ("k", 3)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 5, {"a": 1}), ("k", 8, {"b": 2})],
        "k string, ts long, attrs map<string,int>",
    )
    out = {
        r.ts: (r.attrs_asof, r.ts_asof)
        for r in asof_join(left, right, "k", "ts", "ts", ["attrs"]).collect()
    }
    assert out[10] == ({"b": 2}, 8)
    assert out[3] == (None, None)


def test_asof_right_ts_in_value_cols_rejected(spark):
    import pytest

    left = spark.createDataFrame([("k", 2)], "k string, ts long")
    right = spark.createDataFrame([("k", 1, 5.0)], "k string, ts long, v double")
    with pytest.raises(ValueError, match="ts_asof"):
        asof_join(left, right, "k", "ts", "ts", ["v", "ts"])
