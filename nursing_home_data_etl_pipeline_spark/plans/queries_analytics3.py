"""Third analytics batch: the full ranking-function family plus
first/last/nth value frames, in one registered query (round-2 catalog
consolidation — both operator sets keep their own unit tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .catalog import register


@register(
    "window_rank_values",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           o_custkey,
           RANK()         OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority NULLS FIRST)                AS rnk,
           DENSE_RANK()   OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority NULLS FIRST)                AS drnk,
           NTILE(4)       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice NULLS FIRST, o_orderkey)       AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority NULLS FIRST), 6)      AS prank,
           FIRST_VALUE(o_totalprice)  OVER wc AS first_price,
           LAST_VALUE(o_totalprice)   OVER wc AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER wc AS second_price
    FROM orders
    -- NULLS FIRST pins Spark's ASC default; DuckDB defaults NULLS LAST
    WINDOW wc AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Ranking family (rank/dense_rank tie-stable by value, ntile and "
    "percent_rank over a unique total order) plus first/last/nth value over "
    "a full-partition frame (explicit UNBOUNDED FOLLOWING — the default "
    "frame makes last_value a footgun). Three window specs over two "
    "partitionings; specs sharing a partitioning share one shuffle.",
)
def window_rank_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    by_priority = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    by_price = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    by_cust = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_custkey",
        F.rank().over(by_priority).alias("rnk"),
        F.dense_rank().over(by_priority).alias("drnk"),
        F.ntile(4).over(by_price).alias("quartile"),
        F.round(F.percent_rank().over(by_priority), 6).alias("prank"),
        F.first("o_totalprice").over(by_cust).alias("first_price"),
        F.last("o_totalprice").over(by_cust).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(by_cust).alias("second_price"),
    )
