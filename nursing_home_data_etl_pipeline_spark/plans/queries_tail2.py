"""Round-5 tail additions: bounded-state streaming dedup and two more
TPC-H-shaped multi-join queries (Q4 EXISTS semi-join, Q18 having-subquery,
Q13 outer-join distribution).

Exactly checkable: union two independent file-stream reads of the SAME
events table (every row arrives twice), dedup on event_id with
``dropDuplicatesWithinWatermark`` (state evicted once the watermark passes
— bounded by the in-flight window, not by history; plain dropDuplicates
keeps every key forever), drain bounded -> exactly one row per event.

Product quantization stays OUT of the catalog deliberately: a
driver-visible rows-only row would cost ~25 s of Lloyd-training wall per
bench run (the trainer is m x iters driver-coordinated sweeps) for a check
weaker than the existing pytest, which pins reconstruction-exact recall
1.0 (`tests/test_dedup_similarity.py`).

Registered at the catalog tail (see queries_packing docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register
from .queries_streaming import _drain_to_memory, stream_events


@register(
    "streaming_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    doc="Streaming exact dedup with BOUNDED state: two identical event "
    "streams unioned (each event arrives twice), deduped on event_id via "
    "dropDuplicatesWithinWatermark — per-key state is dropped once the "
    "watermark passes, so state scales with the in-flight window instead "
    "of all history (the difference between a dedup that survives a year "
    "of stream and one that OOMs). Bounded drain => exactly the distinct "
    "event rows.",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["event_id", "user_id", "event_type", "ts"]
    a = stream_events(spark, sf_dir).select(cols)
    b = stream_events(spark, sf_dir).select(cols)
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return _drain_to_memory(deduped, "append")


@register(
    "order_priority_q4",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted to this schema's columns): one quarter of "
    "orders, EXISTS-correlated to late-shipping lineitems, counted per "
    "priority. The EXISTS plans as a LEFT SEMI join — the lineitem side is "
    "filtered by the pushed date bound and never duplicates orders; the "
    "correlated date comparison rides the join condition, not a "
    "post-filter.",
)
def order_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_table
    from pyspark.sql import functions as F

    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")  # noqa: E741
    late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "large_volume_customer_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 260
    )
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: orders whose total quantity clears a threshold "
    "(the HAVING subquery becomes an aggregate + semi join), re-joined to "
    "customer detail. The big-order key set is tiny and broadcasts; "
    "lineitem aggregates once per branch, never per customer.",
)
def large_volume_customer_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_table
    from pyspark.sql import functions as F

    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")  # noqa: E741
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_s"))
        .filter(F.col("_s") > 260)
        .select("l_orderkey")
    )
    o = read_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = (
        l.join(F.broadcast(o), l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(F.sum("l_quantity").alias("total_qty")).select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        "total_qty",
    )


@register(
    "customer_distribution_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: per-customer order counts INCLUDING zero-order "
    "customers (left outer join, COUNT of the nullable key — not "
    "COUNT(*)), then the histogram of those counts. Two aggregations, two "
    "shuffles; the second input is one row per customer, so the histogram "
    "shuffle is key-cardinality-sized.",
)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_table
    from pyspark.sql import functions as F

    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
