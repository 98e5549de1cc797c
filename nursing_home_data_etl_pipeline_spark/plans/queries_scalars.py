"""Scalar-function and statistical-aggregate coverage (SURVEY.md §2.6 F1-F6
analogs plus the math/date/string surface the reference never touches).
Round-2 catalog consolidation: date arithmetic shares the scalar query,
exact quantiles share the stats query, and conditional aggregation lives in
queries_analytics.group_having_conditional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .catalog import register


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                 AS order_year,
           CAST(month(o_orderdate) AS INT)                AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT)           AS order_day,
           upper(o_orderpriority)                         AS priority_uc,
           substr(o_orderstatus, 1, 1)                    AS status_1,
           -- concat_ws, like the engine: a NULL part drops ITS separator
           -- (concat('F','-',NULL) = 'F-' but concat_ws('-','F',NULL) = 'F')
           concat_ws('-', o_orderstatus, o_orderpriority) AS status_priority,
           abs(o_totalprice - 250000.0)                   AS dist_from_250k,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT)    AS price_k_ceil,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT)   AS price_k_floor,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_named,
           length(o_orderpriority)                        AS prio_len,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)           AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)              AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)             AS month_end
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    doc="Scalar-function surface: date parts, string ops (upper/substr/"
    "concat/length), math (abs/ceil/floor), null handling (coalesce/nullif), "
    "and date/interval arithmetic (truncation, interval addition, datediff, "
    "month boundaries) — all whole-stage-codegen built-ins.",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.upper("o_orderpriority").alias("priority_uc"),
        F.substring("o_orderstatus", 1, 1).alias("status_1"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_from_250k"),
        F.ceil(F.col("o_totalprice") / 1000.0).cast("long").alias("price_k_ceil"),
        F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("price_k_floor"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_named"
        ),
        F.length("o_orderpriority").alias("prio_len"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoy"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@register(
    "stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_discount), 6)         AS var_disc,
           ROUND(corr(l_quantity, l_extendedprice), 6)        AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2)  AS cov_qty_price,
           ROUND(min(l_extendedprice), 2)         AS min_price,
           ROUND(max(l_extendedprice), 2)         AS max_price,
           ROUND(quantile_cont(l_quantity, 0.5), 6)       AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
           ROUND(quantile_cont(l_discount, 0.25), 6)      AS p25_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance "
    "(one-pass numerically-stable implementations in both engines; rounded "
    "to absorb summation-order noise) plus exact per-group quantiles "
    "(linear interpolation — Spark percentile == DuckDB quantile_cont; "
    "the exact form sorts each group's values, percentile_approx is the "
    "sublinear 100 TB variant, verified in approx_stats_events).",
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_discount, 0.25)"), 6).alias("p25_disc"),
    )
