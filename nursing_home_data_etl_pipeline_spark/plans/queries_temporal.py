"""Temporal-join and quantile-band queries (SURVEY.md §2.8 join varieties):
as-of join, bucketed range join, null-safe equality join, and exact-quantile
banding. Split from queries_analytics in round 12 (family cohesion); catalog
names and semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.ranges import range_join_points
from ..sources.readers import read_table
from .catalog import register

_RANGE_WINDOW_US = 3_600_000_000  # attribute clicks within 1h after a purchase


@register(
    "asof_join_events",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, value, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ),
    -- Right-side TIES: the engine (asof.py _rord) deterministically
    -- attaches the MAX value per (user_id, ts) while DuckDB's native ASOF
    -- picks an input-order-dependent tied row — pre-aggregate to pin the
    -- same rule (MAX skips NULLs, matching the NULLS-FIRST struct order)
    purchases_asof AS (
      SELECT user_id, ts, us, MAX(value) AS value
      FROM purchases
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id, ts, us
    )
    SELECT 'asof' AS variant,
           c.event_id,
           c.user_id,
           p.value  AS value_r,
           p.us     AS ts_r_us
    FROM (SELECT * FROM clicks WHERE ts IS NOT NULL AND user_id IS NOT NULL) c
    ASOF LEFT JOIN purchases_asof p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    UNION ALL
    -- Engine contract (operators/asof.py): a probe with a NULL timestamp
    -- or NULL key matches nothing (SQL join semantics). DuckDB's native
    -- ASOF instead sorts NULL ts last, so an un-guarded oracle would match
    -- a NULL-ts probe to the LATEST right row.
    SELECT 'asof', event_id, user_id,
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
    FROM clicks WHERE ts IS NULL OR user_id IS NULL
    UNION ALL
    SELECT 'range', c.event_id, c.user_id, p.value, p.us
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id
     AND c.us >= p.us
     AND c.us < p.us + {_RANGE_WINDOW_US}
    """,
    doc="Temporal joins Spark lacks natively. Full contract: "
    "docs/CONTRACTS.md#asof_join_events",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.unix_micros("ts").alias("us")
    )
    asof = asof_join(
        clicks.drop("us"), purchases.drop("us"), on="user_id",
        left_ts="ts", right_ts="ts", value_cols=["value"],
    ).select(
        F.lit("asof").alias("variant"),
        "event_id",
        "user_id",
        F.col("value_asof").alias("value_r"),
        F.unix_micros(F.col("ts_asof")).alias("ts_r_us"),
    )
    windows = purchases.select(
        "user_id",
        F.col("us").alias("lo"),
        (F.col("us") + F.lit(_RANGE_WINDOW_US)).alias("hi"),
        "value",
    )
    ranged = range_join_points(
        clicks.select("event_id", "user_id", F.col("us").alias("x")),
        windows,
        "x",
        "lo",
        "hi",
        on="user_id",
        bucket_width=_RANGE_WINDOW_US,
    ).select(
        F.lit("range").alias("variant"),
        "event_id",
        "user_id",
        F.col("value").alias("value_r"),
        F.col("lo").alias("ts_r_us"),
    )
    return asof.unionByName(ranged)


@register(
    "null_safe_join",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS status
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    r AS (
      SELECT DISTINCT CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS status
      FROM orders
    )
    SELECT l.o_orderkey, l.status, r.status IS NOT NULL OR l.status IS NULL AS matched
    FROM l JOIN r ON l.status IS NOT DISTINCT FROM r.status
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match each "
    "other — the semantics a plain equi-join silently drops. Full contract: "
    "docs/CONTRACTS.md#null_safe_join",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    status = F.when(F.col("o_orderstatus") == "O", None).otherwise(
        F.col("o_orderstatus")
    )
    left = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", status.alias("status")
    )
    right = orders.select(status.alias("status")).distinct()
    joined = left.join(
        right.withColumnRenamed("status", "r_status"),
        left["status"].eqNullSafe(F.col("r_status")),
    )
    return joined.select(
        "o_orderkey",
        "status",
        (F.col("r_status").isNotNull() | F.col("status").isNull()).alias("matched"),
    )


@register(
    "quantile_bands",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice < q.q1 THEN 'low'
                WHEN o_totalprice > q.q3 THEN 'high'
                ELSE 'mid' END AS band,
           COUNT(*)            AS n
    FROM orders, q
    GROUP BY 1
    """,
    doc="Banding rows by exact quantiles (percentile via sort-based exact "
    "computation here; approx_percentile is the 100 TB. Full contract: "
    "docs/CONTRACTS.md#quantile_bands",
)
def quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    q = orders.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    banded = orders.join(F.broadcast(q)).withColumn(
        "band",
        F.when(F.col("o_totalprice") < F.col("q1"), "low")
        .when(F.col("o_totalprice") > F.col("q3"), "high")
        .otherwise("mid"),
    )
    return banded.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
