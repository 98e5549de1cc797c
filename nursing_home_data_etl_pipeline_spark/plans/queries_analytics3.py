"""Third analytics batch: full ranking-function family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .catalog import register


@register(
    "window_ranks",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           RANK()         OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority)                AS rnk,
           DENSE_RANK()   OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority)                AS drnk,
           NTILE(4)       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)       AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority), 6)      AS prank
    FROM orders
    """,
    doc="Ranking family: rank/dense_rank (tie-stable by value), ntile and "
    "percent_rank (over a unique total order / value order).",
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    by_priority = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    by_price = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(by_priority).alias("rnk"),
        F.dense_rank().over(by_priority).alias("drnk"),
        F.ntile(4).over(by_price).alias("quartile"),
        F.round(F.percent_rank().over(by_priority), 6).alias("prank"),
    )
