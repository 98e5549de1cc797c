"""The Spark-SQL string twins in functions/vectors.py must stay
bit-identical to the Column-API originals (round 15: hot plan
constructions moved to one F.expr parse each; these pins are the
equivalence proof for every value class the queries can see)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursing_home_data_etl_pipeline_spark.functions.vectors import (
    cosine_prenorm_sql,
    cosine_rounded_prenorm,
    dot,
    dot_sql,
    l2_sql,
    norm,
    norm_sql,
    round_half_away,
    spark_round_sql,
)

_EDGE_SCALARS = [
    0.0, -0.0, 0.5, -0.5, 1.2345675, -1.2345675, 5e-7, -5e-7,
    float("nan"), float("inf"), float("-inf"), 1e300, -1e300,
    9.223372036854776e12, 0.03125, -0.03125, 123456.9999995, None,
]

_EDGE_VECS = [
    (0, [1.0, 2.0, 3.0]),
    (1, [-1.5, 0.0, 2.5]),
    (2, [0.0, 0.0, 0.0]),          # zero norm
    (3, None),                      # NULL vector
    (4, [1.0, None, 3.0]),          # NULL element
    (5, [1.0, 2.0]),                # ragged (zip_with pads)
    (6, [float("nan"), 1.0, 2.0]),  # NaN element
    (7, [1e200, 1e200, 1e200]),     # overflow products
]


@pytest.mark.parametrize("decimals", [2, 4, 6])
def test_round_twin_bit_identical(spark, decimals):
    df = spark.createDataFrame([(v,) for v in _EDGE_SCALARS], "x double")
    bad = df.select(
        round_half_away(F.col("x"), decimals).alias("c"),
        F.expr(spark_round_sql("x", decimals)).alias("s"),
    ).filter(~F.col("c").eqNullSafe(F.col("s")))
    assert bad.count() == 0


def test_vector_twins_bit_identical(spark):
    df = spark.createDataFrame(
        _EDGE_VECS, "id long, v array<double>"
    )
    pairs = df.crossJoin(
        df.select(F.col("id").alias("id2"), F.col("v").alias("w"))
    )
    l2_col = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("w"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bad = pairs.select(
        dot(F.col("v"), F.col("w")).alias("c_dot"),
        F.expr(dot_sql("v", "w")).alias("s_dot"),
        norm(F.col("v")).alias("c_n"),
        F.expr(norm_sql("v")).alias("s_n"),
        l2_col.alias("c_l2"),
        F.expr(l2_sql("v", "w")).alias("s_l2"),
        # zero-norm guard mirrors every caller's dirty-input contract
        # (cosine is UNDEFINED at norm 0 — ANSI divide would abort)
        F.when(
            (norm(F.col("v")) > 0) & (norm(F.col("w")) > 0),
            cosine_rounded_prenorm(
                F.col("v"), F.col("w"), norm(F.col("v")), norm(F.col("w"))
            ),
        ).alias("c_cos"),
        F.when(
            (F.expr(norm_sql("v")) > 0) & (F.expr(norm_sql("w")) > 0),
            F.expr(
                cosine_prenorm_sql("v", "w", norm_sql("v"), norm_sql("w"))
            ),
        ).alias("s_cos"),
    ).filter(
        ~F.col("c_dot").eqNullSafe(F.col("s_dot"))
        | ~F.col("c_n").eqNullSafe(F.col("s_n"))
        | ~F.col("c_l2").eqNullSafe(F.col("s_l2"))
        | ~F.col("c_cos").eqNullSafe(F.col("s_cos"))
    )
    assert bad.count() == 0
