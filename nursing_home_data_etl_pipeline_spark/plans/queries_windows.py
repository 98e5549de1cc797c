"""Window-function queries (SURVEY.md §2.8 windows + sort/top-k): ranking
family, running aggregates, lag/debounce event analytics, and top-k both
global and per-group. Split from queries_analytics in round 12 (family
cohesion); catalog names and semantics unchanged.

Determinism conventions (BASELINE.md): float aggregates round identically
on both sides; every window ordering carries a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import duck_round_sql, round_half_away
from ..operators.windows import (
    lags_scaled,
    plan_segments,
    running_sum_scaled,
    top_k_global,
    top_k_per_group,
)
from ..sources.readers import read_table
from .catalog import register


def _double_lit(v: float) -> str:
    """SQL text for an EXACT double literal: repr() round-trips through
    the parser's correctly-rounded strtod bit-identically (the VARCHAR
    idiom of queries_stats); NaN/Inf spelled in Spark's cast vocabulary."""
    import math

    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST('{v!r}' AS DOUBLE)"


@register(
    "topk_global_grouped",
    oracle="""
    -- global ordering is TOTAL over the output projection (custkey as the
    -- final tiebreaker): duplicate o_orderkey rows tied on totalprice but
    -- differing in custkey otherwise rank engine-order-dependently
    -- (round-9 shape fuzz seed 2028 — all-NULL totalprice tied every row)
    SELECT 'global' AS variant, o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST,
                                       o_custkey NULLS FIRST) AS rank
    FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST,
                                        o_custkey NULLS FIRST LIMIT 100)
    UNION ALL
    SELECT 'grouped', o_custkey, o_orderkey, o_totalprice, rank FROM (
      SELECT o_custkey,
             o_orderkey,
             o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST
             ) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
    doc="Top-k both ways in one query: global top-100 (TakeOrderedAndProject. Full "
    "contract: docs/CONTRACTS.md#topk_global_grouped",
)
def topk_global_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    # TOTAL over the output projection — see the oracle's tiebreak note
    order_by = [F.col("o_totalprice").desc(), F.col("o_orderkey"),
                F.col("o_custkey")]
    glob = top_k_global(orders, order_by=order_by, k=100).withColumn(
        "rank", F.row_number().over(Window.orderBy(*order_by))
    )
    grouped = top_k_per_group(
        orders, partition_by=["o_custkey"], order_by=order_by, k=3
    )
    cols = ["o_custkey", "o_orderkey", "o_totalprice", "rank"]
    return glob.select(F.lit("global").alias("variant"), *cols).unionByName(
        grouped.select(F.lit("grouped").alias("variant"), *cols)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey,
           l_orderkey,
           l_linenumber,
           ROUND(SUM(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate NULLS FIRST, l_orderkey NULLS FIRST,
                      l_linenumber NULLS FIRST
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running
    FROM lineitem
    """,
    doc="Cumulative sum per supplier with a fully deterministic ordering. Full "
    "contract: docs/CONTRACTS.md#window_running_sum",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # two-level above the size threshold: a hot supplier's history must
    # never land on one task (round-13 #1)
    out = running_sum_scaled(
        li,
        partition_by=["l_suppkey"],
        order_by=["l_shipdate", "l_orderkey", "l_linenumber"],
        agg_col="l_quantity",
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(F.col("running"), 2).alias("running"),
    )


@register(
    "events_lag_debounce",
    oracle="""
    SELECT event_id,
           user_id,
           event_type,
           -- duck_round_sql expansion (portable repr-midpoint-safe round)
           (CASE WHEN isnan((value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))) OR isinf((value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))) THEN (value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)) WHEN (value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)) < 0 THEN -(floor(abs((value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))) * 1000000.0 + 0.5) / 1000000.0) ELSE floor(abs((value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST))) * 1000000.0 + 0.5) / 1000000.0 END) AS delta,
           COALESCE(
             epoch_us(ts)
               - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                 ) > 300 * 1000000,
             TRUE) AS kept,
           -- real JSON parsing like from_json: non-integer shapes are NULL
           -- (TRY_CAST would ROUND '1.5'); the regex runs on json_extract's
           -- RAW text so a string-typed {"k": "7"} keeps its quotes and
           -- fails, matching from_json's NULL for a LongType field (r6)
           TRY_CAST(CASE WHEN json_valid(props)
                          AND regexp_matches(
                                CAST(json_extract(props, '$.k') AS VARCHAR),
                                '^-?[0-9]+$')
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS k
    FROM events
    """,
    doc="One pass over events combining three row-level analytics: per-user value "
    "delta, time-debounce keep flag, JSON field extraction. Full contract: "
    "docs/CONTRACTS.md#events_lag_debounce",
)
def events_lag_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both lags ride the two-level rewrite above the size threshold: the
    # skewed fixture puts ~50% of events on ONE user (round-13 #1); ONE
    # shared segment sample from the base frame — the second call's own
    # sample would replay the first segmented join's lineage (ADVICE r13)
    ev = read_table(spark, sf_dir, "events").withColumn(
        "_us", F.unix_micros(F.col("ts")))
    # gate on the COARSEST partition key: if user_id isn't hot, neither
    # refinement (user_id, event_type) can be (round-14 #3)
    seg = plan_segments(ev, ["ts", "event_id"], partition_by=["user_id"])
    # fused (round-15 #5): both lags ride ONE (user_id, segment) exchange;
    # the event_type-refined lag sorts (event_type, ts, event_id) inside it
    ev = lags_scaled(ev, ["user_id"], ["ts", "event_id"],
                     [((), "value", "_lagv"),
                      (("event_type",), "_us", "_lagus")], segments=seg)
    gap = F.col("_us") - F.col("_lagus")
    k = F.from_json(
        F.col("props"), T.StructType([T.StructField("k", T.LongType())])
    )["k"]
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        round_half_away(F.col("value") - F.col("_lagv"), 6).alias("delta"),
        F.coalesce(gap > 300 * 1_000_000, F.lit(True)).alias("kept"),
        k.alias("k"),
    )


@register(
    "window_rank_values",
    oracle=f"""
    SELECT o_orderkey,
           o_orderstatus,
           o_custkey,
           RANK()         OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority NULLS FIRST)                AS rnk,
           DENSE_RANK()   OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority NULLS FIRST)                AS drnk,
           NTILE(4)       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice NULLS FIRST, o_orderkey NULLS FIRST)       AS quartile,
           {duck_round_sql("PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority NULLS FIRST)")}      AS prank,
           FIRST_VALUE(o_totalprice)  OVER wc AS first_price,
           LAST_VALUE(o_totalprice)   OVER wc AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER wc AS second_price
    FROM orders
    -- NULLS FIRST pins Spark's ASC default; DuckDB defaults NULLS LAST
    WINDOW wc AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Ranking family (rank/dense_rank tie-stable by value, ntile and "
    "percent_rank over a unique total order). Full contract: "
    "docs/CONTRACTS.md#window_rank_values",
)
def window_rank_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT LAZY, unlike every other builder here: constructing this frame
    runs one Spark job (the sampled-percentile `.first()` below) so the
    ≤127 ntile cut points can embed as literals (ADVICE r15). Callers
    that only want the plan still pay that one job."""
    orders = read_table(spark, sf_dir, "orders")
    # ranks on the aggregated (status, priority) table
    w_cum = (Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_ord = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    w_all = Window.partitionBy("o_orderstatus")
    ranks = (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            F.col("o_orderstatus").alias("_rs"),
            F.col("o_orderpriority").alias("_rp"),
            (F.coalesce(F.sum("_c").over(w_cum), F.lit(0)) + 1)
            .cast("int").alias("rnk"),
            F.row_number().over(w_ord).alias("drnk"),
            F.sum("_c").over(w_all).alias("_n_st"),
        )
        .withColumn("prank", round_half_away(
            (F.col("rnk") - 1)
            / F.greatest(F.col("_n_st") - 1, F.lit(1)).cast("double"), 6))
    )
    # Two-level ntile over a DATA-DERIVED bucket (percentile bounds, a
    # pure column function): the shard must assign IDENTICALLY across two
    # evaluations of one lineage, which spark_partition_id cannot
    # (docs/DESIGN.md#windows-ntile-bucket). The ≤127 cut points collect
    # to the driver and embed as LITERAL comparisons: a codegen'd ladder
    # replaces the interpreted per-element HOF filter (0.71 s/pass at
    # sf0.1) and both BroadcastNestedLoopJoins.
    n_bk = int(spark.conf.get("spark.sql.shuffle.partitions")) * 2
    pcts = ",".join(str(i / n_bk) for i in range(1, n_bk))
    # coalesce to array() at the AGGREGATE: an all-NULL sample yields
    # _bs=NULL (ADVICE r10); empty bounds degrade to ONE order-consistent
    # bucket.
    bs = orders.filter(F.xxhash64("o_orderkey") % 200 == 0).agg(
        F.expr(f"coalesce(percentile(o_totalprice, array({pcts})), "
               "cast(array() as array<double>))").alias("_bs")).first()[0]
    price = F.col("o_totalprice")
    # count of bounds <= price — monotone in price even with NaN/Inf
    # bounds (set inclusion), so global rank reconstruction stays exact.
    cnt = (
        F.expr("+".join(f"IF({_double_lit(b)} <= o_totalprice, 1, 0)"
                        for b in bs))
        if bs else F.lit(0)
    ).cast("int")
    parts = orders.withColumn(
        "_bk", F.when(price.isNull(), F.lit(-1))
        .when(F.isnan(price), F.lit(n_bk))
        .otherwise(cnt))
    w_loc = Window.partitionBy("_bk", "o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey")
    loc = parts.withColumn("_lrn", F.row_number().over(w_loc))
    w_opre = (Window.partitionBy("_os").orderBy("_bk2")
              .rowsBetween(Window.unboundedPreceding, -1))
    # `_bk2`/`_os` aliases make the self-join condition unambiguous by
    # construction — joining two branches of ONE lineage on same-named
    # columns made Spark construct a "trivially true equals predicate"
    # special case (benign but a plan wart; VERDICT r10 #3). Grouping LOC
    # (not parts) lets Catalyst prune the window and run the count as a
    # map-side partial aggregate on its own scan — the former second
    # bucket-assign pass disappears from the plan (round 15).
    offs = (
        loc.groupBy(F.col("_bk").alias("_bk2"),
                    F.col("o_orderstatus").alias("_os"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .select("_bk2", "_os",
                F.coalesce(F.sum("_c").over(w_opre), F.lit(0)).alias("_off"),
                F.sum("_c").over(Window.partitionBy("_os")).alias("_n"))
    )
    with_rn = loc.join(
        F.broadcast(offs),
        (F.col("_bk") == F.col("_bk2"))
        & F.col("o_orderstatus").eqNullSafe(F.col("_os")),
    ).drop("_bk2", "_os")
    rn, n = F.col("_lrn") + F.col("_off"), F.col("_n")
    base, rem = (n / 4).cast("long"), n % 4
    quartile = (
        F.when(rn <= rem * (base + 1), ((rn - 1) / (base + 1)).cast("long"))
        .otherwise(rem + ((rn - rem * (base + 1) - 1) / base).cast("long"))
        + 1
    ).cast("int")
    by_cust = (Window.partitionBy("o_custkey")
               .orderBy("o_orderdate", "o_orderkey")
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))
    return (
        with_rn.join(F.broadcast(ranks),
                     F.col("o_orderstatus").eqNullSafe(F.col("_rs"))
                     & F.col("o_orderpriority").eqNullSafe(F.col("_rp")))
        .withColumn("quartile", quartile)
        .select("o_orderkey", "o_orderstatus", "o_custkey",
                "rnk", "drnk", "quartile", "prank",
                F.first("o_totalprice").over(by_cust).alias("first_price"),
                F.last("o_totalprice").over(by_cust).alias("last_price"),
                F.nth_value("o_totalprice", 2).over(by_cust)
                .alias("second_price"))
    )
