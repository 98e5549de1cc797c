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
           list_sort(list_distinct(wa))                       AS sorted_vocab,
           wa[1:3]                                            AS first3,
           len(list_filter(wa, x -> length(x) > 4))           AS n_long_words,
           array_to_string(list_reverse_sort(list_distinct(wa))[1:2], ',') AS top2_rev,
           list_contains(wa, 'data')                          AS has_data
    FROM w
    """,
    doc="Array-function surface: sort/distinct/slice/filter/reverse-sort/"
    "contains over word arrays — all builtin HOFs, row-local.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("wa")
    )
    return base.select(
        "doc_id",
        F.array_sort(F.array_distinct("wa")).alias("sorted_vocab"),
        F.slice("wa", 1, 3).alias("first3"),
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
