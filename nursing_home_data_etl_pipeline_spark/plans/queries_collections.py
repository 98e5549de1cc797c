"""Collection (array) functions, multiset set-ops, and date arithmetic —
the long tail of the §2.8 relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.setops import except_all, intersect_all
from ..sources.readers import read_table
from .catalog import register


@register(
    "array_functions",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS wa
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(wa)), ',') AS sorted_vocab,
           array_to_string(wa[1:3], ',')                      AS first3,
           len(list_filter(wa, x -> length(x) > 4))           AS n_long_words,
           array_to_string(list_reverse_sort(list_distinct(wa))[1:2], ',') AS top2_rev,
           list_contains(wa, 'data')                          AS has_data
    FROM w
    """,
    doc="Array-function surface: sort/distinct/slice/filter/reverse-sort/"
    "contains over word arrays — all builtin HOFs, row-local. Array outputs "
    "are serialized (array_join) so order-insensitive canonicalizers can "
    "sort the result columns.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("wa")
    )
    return base.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct("wa")), ",").alias("sorted_vocab"),
        F.array_join(F.slice("wa", 1, 3), ",").alias("first3"),
        F.size(F.filter("wa", lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.concat_ws(
            ",", F.slice(F.reverse(F.array_sort(F.array_distinct("wa"))), 1, 2)
        ).alias("top2_rev"),
        F.array_contains("wa", "data").alias("has_data"),
    )


@register(
    "set_ops_multiset",
    oracle="""
    SELECT status, COUNT(*) AS n FROM (
      (SELECT o_orderstatus AS status FROM orders WHERE o_orderkey % 3 = 0
       INTERSECT ALL
       SELECT o_orderstatus FROM orders WHERE o_orderkey % 2 = 0)
      EXCEPT ALL
      SELECT o_orderstatus FROM orders WHERE o_orderkey % 12 = 0
    ) GROUP BY status
    """,
    doc="Multiset set-ops (INTERSECT ALL / EXCEPT ALL): duplicate-preserving "
    "semantics the distinct variants silently change.",
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderstatus").alias("status")
    )
    b = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderstatus").alias("status")
    )
    c = o.filter(F.col("o_orderkey") % 12 == 0).select(
        F.col("o_orderstatus").alias("status")
    )
    return (
        except_all(intersect_all(a, b), c)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "union_schema_evolution",
    oracle="""
    SELECT lang, COUNT(*) AS n FROM (
      SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 2 = 0
      UNION ALL BY NAME
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1
    )
    GROUP BY lang
    """,
    doc="Schema-evolution union: an old staging batch (no lang column) "
    "unioned BY NAME with a newer one — missing columns null-fill instead "
    "of silently mis-aligning (the positional-union corruption bug).",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    old_batch = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new_batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", "lang")
    merged = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return merged.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "window_first_last",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last/nth value over a full-partition frame (explicit "
    "UNBOUNDED FOLLOWING - the default frame makes last_value a footgun).",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "debounce_events",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT event_id, user_id, event_type,
             (epoch_ns(ts) // 1000)
               - LAG(epoch_ns(ts) // 1000) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ) AS gap_us
      FROM events
    )
    WHERE gap_us IS NULL OR gap_us > 300 * 1000000
    """,
    doc="Event debounce: drop repeats of the same (user, event_type) within "
    "5 minutes of the previous occurrence — windowed dedup via lag, one "
    "shuffle on the key; the time-aware twin of dropDuplicates.",
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us, 1).over(w)
    return (
        ev.withColumn("_gap", gap)
        .filter(F.col("_gap").isNull() | (F.col("_gap") > 300 * 1_000_000))
        .select("event_id", "user_id", "event_type")
    )


@register(
    "map_functions",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents WHERE doc_id < 50
    ),
    counts AS (
      SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(cardinality(map_from_entries(list((word, n)))) AS INT) AS n_distinct,
           CAST(element_at(map_from_entries(list((word, n))), 'data')[1] AS BIGINT) AS n_data
    FROM counts
    GROUP BY doc_id
    """,
    doc="Map-typed columns: word->count maps built with map_from_entries, "
    "probed with element_at — the per-row associative shape for sparse "
    "feature vectors.",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    counts = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    maps = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("word", "n"))).alias("m")
    )
    return maps.select(
        "doc_id",
        F.size("m").alias("n_distinct"),
        F.element_at("m", "data").alias("n_data"),
    )


@register(
    "string_similarity",
    oracle="""
    WITH pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.c_name AS name_a, b.c_name AS name_b
      FROM customer a JOIN customer b
        ON b.c_custkey = a.c_custkey + 1
      WHERE a.c_custkey < 200
    )
    SELECT id_a, id_b,
           levenshtein(name_a, name_b) AS edit_distance,
           levenshtein(name_a, name_b) <= 2 AS near_name
    FROM pairs
    """,
    doc="String similarity (Levenshtein edit distance) over candidate "
    "pairs — the entity-resolution primitive for name/address matching; "
    "JVM builtin, applied post-blocking (never all-pairs).",
)
def string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a")
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b")
    )
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return pairs.select(
        "id_a", "id_b",
        dist.alias("edit_distance"),
        (dist <= 2).alias("near_name"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)          AS order_month,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)             AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)            AS month_end
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    doc="Date/interval arithmetic: truncation, interval addition, datediff, "
    "month boundaries.",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )
