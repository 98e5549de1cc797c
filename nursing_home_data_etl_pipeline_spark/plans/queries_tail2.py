"""TPC-H-shaped multi-join queries beyond Q3/Q5/Q10/Q14: Q4 (EXISTS
semi-join with a correlated date bound), Q18 (having-subquery detail join),
Q13 (outer-join distribution) — one tagged row set (round-6 catalog
consolidation of order_priority_q4 + large_volume_customer_q18 +
customer_distribution_q13; streaming_dedup moved into
queries_streamjoin_cms.streaming_join_dedup).

Branch-to-column mapping (NULL-padded union; both engines cast the unused
slots to the same types):

=========  ==============  ==========  =========  ===========  ========  =========  ===========
variant    k_str           k_id        k_id2      k_date       price     qty        cnt
=========  ==============  ==========  =========  ===========  ========  =========  ===========
q4         o_orderpriority --          --         --           --        --         order_count
q13        --              c_count     --         --           --        --         custdist
q18        c_name          o_orderkey  c_custkey  o_orderdate  total     total_qty  --
=========  ==============  ==========  =========  ===========  ========  =========  ===========

Product quantization stays OUT of the catalog deliberately: a
driver-visible rows-only row would cost ~25 s of Lloyd-training wall per
bench run for a check weaker than the existing pytest, which pins
reconstruction-exact recall 1.0 (`tests/test_dedup_similarity.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .catalog import register

_NULL_COLS_SQL = (
    "CAST(NULL AS BIGINT) AS k_id, CAST(NULL AS BIGINT) AS k_id2, "
    "CAST(NULL AS VARCHAR) AS k_date, CAST(NULL AS DOUBLE) AS price, "
    "CAST(NULL AS DOUBLE) AS qty"
)


@register(
    "tpch_shapes_q4_q13_q18",
    oracle=f"""
    SELECT 'q4' AS variant,
           o.o_orderpriority AS k_str,
           {_NULL_COLS_SQL},
           COUNT(*) AS cnt
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    UNION ALL
    SELECT 'q13',
           CAST(NULL AS VARCHAR),
           c_count,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           COUNT(*)
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    UNION ALL
    SELECT 'q18',
           c.c_name,
           o.o_orderkey,
           c.c_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d'),
           ROUND(o.o_totalprice, 2),
           SUM(l.l_quantity),
           CAST(NULL AS BIGINT)
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 260
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="Three TPC-H shapes, one tagged row set per query (adapted to this "
    "schema's columns). variant='q4': one quarter of orders, EXISTS-"
    "correlated to late-shipping lineitems, counted per priority — the "
    "EXISTS plans as a LEFT SEMI join; the lineitem side is filtered by "
    "the pushed date bound and never duplicates orders; the correlated "
    "date comparison rides the join condition, not a post-filter. "
    "variant='q13': per-customer order counts INCLUDING zero-order "
    "customers (left outer join, COUNT of the nullable key — not "
    "COUNT(*)), then the histogram of those counts; the histogram shuffle "
    "input is one row per customer. variant='q18': orders whose total "
    "quantity clears a threshold (the HAVING subquery becomes an aggregate "
    "+ semi join), re-joined to customer detail — only the tiny big-order "
    "key set carries an explicit broadcast hint; the orders/customer joins "
    "are left to AQE so data-dependent frames can't blow the broadcast "
    "limit at larger scale factors.",
)
def tpch_shapes_q4_q13_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_str = F.lit(None).cast("string")
    null_long = F.lit(None).cast("long")
    null_dbl = F.lit(None).cast("double")
    out_cols = ["variant", "k_str", "k_id", "k_id2", "k_date", "price", "qty", "cnt"]

    # --- q4: EXISTS semi-join with correlated date bound ------------------
    o4 = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l4 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o4.join(
        l4,
        (o4["o_orderkey"] == l4["l_orderkey"])
        & (l4["l_shipdate"] > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    q4 = late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        F.lit("q4").alias("variant"),
        F.col("o_orderpriority").alias("k_str"),
        null_long.alias("k_id"),
        null_long.alias("k_id2"),
        null_str.alias("k_date"),
        null_dbl.alias("price"),
        null_dbl.alias("qty"),
        "cnt",
    )

    # --- q13: outer-join count distribution -------------------------------
    c13 = read_table(spark, sf_dir, "customer").select("c_custkey")
    o13 = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c13.join(o13, c13["c_custkey"] == o13["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    q13 = per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        F.lit("q13").alias("variant"),
        null_str.alias("k_str"),
        F.col("c_count").alias("k_id"),
        null_long.alias("k_id2"),
        null_str.alias("k_date"),
        null_dbl.alias("price"),
        null_dbl.alias("qty"),
        "cnt",
    )

    # --- q18: having-subquery detail join ---------------------------------
    l18 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l18.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_s"))
        .filter(F.col("_s") > 260)
        .select("l_orderkey")
    )
    # Only the tiny big-order key set gets an explicit broadcast hint; the
    # orders/customer sides are data-dependent — AQE picks their strategy.
    o18 = read_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c18 = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = l18.join(o18, l18["l_orderkey"] == o18["o_orderkey"]).join(
        c18, o18["o_custkey"] == c18["c_custkey"]
    )
    q18 = joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(F.sum("l_quantity").alias("qty")).select(
        F.lit("q18").alias("variant"),
        F.col("c_name").alias("k_str"),
        F.col("o_orderkey").alias("k_id"),
        F.col("c_custkey").alias("k_id2"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("k_date"),
        F.round(F.col("o_totalprice"), 2).alias("price"),
        "qty",
        null_long.alias("cnt"),
    )

    return (
        q4.select(*out_cols)
        .unionByName(q13.select(*out_cols))
        .unionByName(q18.select(*out_cols))
    )
