"""Capability-gap queries (SURVEY.md §2.8): filters, aggregations, windows,
sorts/top-k, set ops, pivot/unpivot, time-bucketed and sessionized event
analytics — the general query surface the reference never exercises.

Determinism conventions (BASELINE.md): float aggregates are ROUNDed
identically on both sides (summation order differs between engines);
every window ordering carries a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import (
    cube_agg,
    group_agg,
    pivot_agg,
    rollup_agg,
    unpivot_stack,
)
from ..operators.setops import except_, intersect, union_distinct
from ..operators.windows import (
    running_agg,
    sessionize,
    top_k_global,
    top_k_per_group,
    with_lag_delta,
)
from ..sources.readers import read_table
from .catalog import register

# ---------------------------------------------------------------------------
# P9 gap: row filters / predicates
# ---------------------------------------------------------------------------


@register(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      AND l_returnflag IN ('A', 'R')
      AND l_discount > 0.05
      AND l_quantity IS NOT NULL
    """,
    doc="Row predicates (between / isin / comparison / null check) — all "
    "pushed to the parquet scan by Catalyst (SURVEY §2.2 P9 gap).",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_discount") > 0.05)
        & F.col("l_quantity").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate",
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(ROUND(SUM(l_quantity), 2) / COUNT(*), 6)                  AS avg_qty,
           ROUND(ROUND(SUM(l_extendedprice), 2) / COUNT(*), 6)             AS avg_price,
           ROUND(ROUND(SUM(l_discount), 2) / COUNT(*), 6)                  AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: two-key hash aggregation with 8 aggregates — "
    "map-side partial agg + one shuffle (SURVEY §2.4 gap).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ],
    )


@register(
    "group_having",
    oracle="""
    SELECT o_custkey,
           COUNT(*)                                         AS n_orders,
           ROUND(ROUND(SUM(o_totalprice), 2) / COUNT(*), 6) AS avg_price
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
    doc="GROUP BY + HAVING (post-aggregation predicate).",
)
def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # avg via round(sum,2)/count: sums of 2-decimal money stay ~1e-9
            # from rounding boundaries, so this is deterministic across
            # engines; a raw ROUND(AVG(x),2) can land on a .xx5 boundary and
            # flip the last cent between summation orders.
            F.round(F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_price"
            ),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "distinct_values",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT as aggregate-without-measures.",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@register(
    "rollup_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS grp,
           ROUND(SUM(l_quantity), 2)            AS sum_qty,
           COUNT(*)                             AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with grouping_id: hierarchical subtotals in one shuffle.",
)
def rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.grouping_id().alias("grp"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        ],
    )


@register(
    "cube_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS grp,
           ROUND(SUM(l_extendedprice), 2)       AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all grouping-set combinations.",
)
def cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return cube_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.grouping_id().alias("grp"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        ],
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey,
             o_orderkey,
             o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
    doc="Top-3 orders per customer: row_number window; Catalyst's "
    "WindowGroupLimit pushes the limit below the shuffle.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey,
           l_orderkey,
           l_linenumber,
           ROUND(SUM(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running
    FROM lineitem
    """,
    doc="Cumulative sum per supplier with a fully deterministic ordering.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    out = running_agg(
        li,
        partition_by=["l_suppkey"],
        order_by=[F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")],
        agg_col="l_quantity",
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(F.col("running"), 2).alias("running"),
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT user_id,
           event_id,
           ROUND(value - LAG(value, 1) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ), 6) AS delta
    FROM events
    """,
    doc="lag/lead analytics: per-user value delta between consecutive events.",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    out = with_lag_delta(
        ev,
        partition_by=["user_id"],
        order_by=[F.col("ts"), F.col("event_id")],
        value_col="value",
    )
    return out.select("user_id", "event_id", F.round("delta", 6).alias("delta"))


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Global top-k: compiles to TakeOrderedAndProject (per-partition "
    "heaps, no full sort) — scale-safe for small k.",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return top_k_global(
        orders, order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")], k=100
    )


# ---------------------------------------------------------------------------
# Set ops
# ---------------------------------------------------------------------------


@register(
    "set_ops_chain",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION
     SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    INTERSECT
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="UNION / INTERSECT / EXCEPT chain with SQL distinct semantics.",
)
def set_ops_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey"))
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return except_(intersect(union_distinct(building, rich), with_orders), machinery)


# ---------------------------------------------------------------------------
# Pivot / unpivot (the reference's quarterly-columns shape, SURVEY §2.5 W2)
# ---------------------------------------------------------------------------


@register(
    "pivot_quarterly",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 1 THEN l_quantity END), 2) AS q1_qty,
           ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 2 THEN l_quantity END), 2) AS q2_qty,
           ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 3 THEN l_quantity END), 2) AS q3_qty,
           ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 4 THEN l_quantity END), 2) AS q4_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Long->wide pivot: quarterly measure columns (q1..q4), mirroring the "
    "reference's pre-pivoted quality-measure shape (quality-transform.py:40-43). "
    "Explicit pivot values skip the distinct-discovery job.",
)
def pivot_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "quarter", F.quarter("l_shipdate")
    )
    wide = pivot_agg(
        li, ["l_returnflag"], "quarter", [1, 2, 3, 4], F.sum("l_quantity")
    )
    return wide.select(
        "l_returnflag",
        *[F.round(F.col(str(q)), 2).alias(f"q{q}_qty") for q in (1, 2, 3, 4)],
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
    """,
    doc="Wide->long unpivot via the built-in unpivot/stack (row-local, no "
    "shuffle).",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("double").alias("p_size"),
    )
    return unpivot_stack(part, ["p_partkey"], ["p_retailprice", "p_size"])


# ---------------------------------------------------------------------------
# Event-time analytics
# ---------------------------------------------------------------------------


@register(
    "events_windowed_agg",
    oracle="""
    SELECT make_timestamp((epoch_ns(ts) // 1000) // 21600000000 * 21600000000) AS window_start,
           event_type,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 4)  AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 6-hour event-time windows (batch twin of the streaming "
    "windowed aggregation; F.window buckets align to the epoch in UTC).",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             event_id,
             ts,
             CASE WHEN (epoch_ns(ts) // 1000) - LAG(epoch_ns(ts) // 1000) OVER w
                        > 1800 * 1000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             event_id,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Batch sessionization: 30-min inactivity gap -> new session "
    "(lag + cumulative sum), then per-session event counts.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_seconds=1800, tiebreak=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "approx_stats_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           TRUE AS distinct_ok,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM events GROUP BY event_type
    """,
    doc="Approximate aggregates (HyperLogLog++ distinct, GK-sketch "
    "percentiles — sublinear state, the 100 TB path) verified against exact "
    "twins in the same plan: the query emits within-error-bound booleans "
    "(HLL within 3x rsd of exact COUNT(DISTINCT); approx percentile inside "
    "the exact p±0.03 quantile band) and the oracle asserts every band holds, "
    "turning sketch accuracy into a hash-checkable signal instead of a "
    "rows-only smoke check. Raw sketch values stay available via "
    "operators.aggregates.approx_stats (unit-tested).",
)
def approx_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("_exact_d"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("_approx_d"),
        F.expr("percentile(value, array(0.47, 0.53, 0.92, 0.98))").alias("_bands"),
        F.percentile_approx("value", 0.5).alias("_p50"),
        F.percentile_approx("value", 0.95).alias("_p95"),
    )
    # 3 sigma of the requested 5% relative standard deviation, floored for
    # tiny groups where one-off error dominates the relative bound.
    tol = F.greatest(F.col("_exact_d") * 0.15, F.lit(2.0))
    return g.select(
        "event_type",
        "n",
        (F.abs(F.col("_approx_d") - F.col("_exact_d")) <= tol).alias("distinct_ok"),
        F.col("_p50").between(F.col("_bands")[0], F.col("_bands")[1]).alias("p50_ok"),
        F.col("_p95").between(F.col("_bands")[2], F.col("_bands")[3]).alias("p95_ok"),
    )
