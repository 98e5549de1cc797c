"""Multi-join analytical queries (TPC-H Q3/Q5/Q10 shapes) — the largest
join trees the test data supports. These are the bench's join-planning
workout: selective dimension filters that must push down, small sides that
must broadcast, and aggregation over the join result in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .catalog import register
from .queries_analytics import rev_sum_col, rev_sum_sql


@register(
    "shipping_priority_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {rev_sum_sql("l.")} AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey,
             o.o_orderdate NULLS FIRST, o.o_orderpriority NULLS FIRST
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-table join with selective filters on both dims, "
    "aggregate over the join, top-10 by revenue. Full contract: "
    "docs/CONTRACTS.md#shipping_priority_q3",
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    l = read_table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.col("l_shipdate") > "1995-03-15"
    )
    # no pinned broadcast: the BUILDING-filtered customer side is ~1/5 of
    # a table that scales linearly with sf — AQE sizes the join strategy
    joined = l.join(
        o, l["l_orderkey"] == o["o_orderkey"]
    ).join(c, o["o_custkey"] == c["c_custkey"])
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_sum_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        # ordering is TOTAL over the group key: duplicate o_orderkey rows
        # (fan-out) create exactly-tied (revenue, orderkey) groups whose
        # LIMIT-boundary pick would otherwise be engine-dependent
        .orderBy(
            F.col("revenue").desc(), F.col("l_orderkey"),
            F.col("o_orderdate"), F.col("o_orderpriority"),
        )
        .limit(10)
    )


@register(
    "regional_revenue_q5",
    oracle=f"""
    SELECT 'q5' AS variant,
           n.n_name AS nation,
           {rev_sum_sql("l.")} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    UNION ALL
    SELECT 'q14_' || lower(CASE WHEN p.p_type = 'PROMO' THEN 'promo' ELSE 'other' END),
           'ALL',
           {rev_sum_sql("l.")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-style multijoin revenue. Full contract: "
    "docs/CONTRACTS.md#regional_revenue_q5",
)
def regional_revenue_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")  # noqa: E741
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "n_name")
    )
    # reduce orders BEFORE the unavoidable lineitem shuffle; dims derives
    # from customer (linear in sf) so its broadcast is NOT pinned — AQE
    # decides; only the bounded nation/region sides carry hints above
    o_asia = o.join(
        dims, o["o_custkey"] == dims["c_custkey"]
    ).select("o_orderkey", "n_name")
    joined = l.select("l_orderkey", "l_extendedprice", "l_discount").join(
        o_asia, l["l_orderkey"] == o_asia["o_orderkey"]
    )
    q5 = (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(rev_sum_col().alias("revenue"))
        .select(F.lit("q5").alias("variant"), "nation", "revenue")
    )
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", F.lit("q14_promo"))
        .otherwise(F.lit("q14_other"))
        .alias("variant"),
    )
    q14 = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(p, l["l_partkey"] == p["p_partkey"])  # part scales with sf: AQE decides
        .groupBy("variant")
        .agg(rev_sum_col().alias("revenue"))
        .select("variant", F.lit("ALL").alias("nation"), "revenue")
    )
    return q5.unionByName(q14)


@register(
    "returned_items_q10",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           {rev_sum_sql("l.")} AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey,
             c.c_name NULLS FIRST, n.n_name NULLS FIRST
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, 4-table join + top-20 "
    "— the classic churn-analysis plan. Full contract: "
    "docs/CONTRACTS.md#returned_items_q10",
)
def returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.col("l_returnflag") == "R"
    )
    cust = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", "c_name", F.col("n_name").alias("nation")
    )
    # no pinned broadcast on the customer projection (linear in sf; a
    # forced broadcast OOMs at the 100 TB design point) — AQE decides
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).join(
        cust, o["o_custkey"] == cust["c_custkey"]
    )
    return (
        joined.groupBy("c_custkey", "c_name", "nation")
        .agg(rev_sum_col().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        # total ordering: a duplicate c_custkey (re-registered CCN with a
        # new name) makes two revenue-tied groups at the LIMIT boundary
        .orderBy(
            F.col("revenue").desc(), F.col("c_custkey"),
            F.col("c_name"), F.col("nation"),
        )
        .limit(20)
    )
