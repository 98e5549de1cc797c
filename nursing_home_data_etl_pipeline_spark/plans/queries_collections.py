"""Collection (array + map) functions, schema-evolution union, and string
similarity — the long tail of the §2.8 relational surface. (Round-2 catalog
consolidation: array and map functions share one registered query; date
arithmetic lives with the scalar functions; first/last/nth windows live with
the ranking family; debounce lives in events_lag_debounce.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .catalog import register


@register(
    "collection_functions",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS wa
      FROM documents WHERE doc_id < 100
    ),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS n FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS word
        FROM documents WHERE doc_id < 100
      ) GROUP BY doc_id, word
    ),
    m AS (
      SELECT doc_id,
             CAST(cardinality(map_from_entries(list((word, n)))) AS INT) AS n_distinct_words,
             CAST(element_at(map_from_entries(list((word, n))), 'data')[1] AS BIGINT) AS n_data
      FROM wc GROUP BY doc_id
    )
    SELECT w.doc_id,
           array_to_string(list_sort(list_distinct(wa)), ',') AS sorted_vocab,
           array_to_string(wa[1:3], ',')                      AS first3,
           len(list_filter(wa, x -> length(x) > 4))           AS n_long_words,
           array_to_string(list_reverse_sort(list_distinct(wa))[1:2], ',') AS top2_rev,
           list_contains(wa, 'data')                          AS has_data,
           m.n_distinct_words,
           m.n_data
    FROM w JOIN m USING (doc_id)
    """,
    doc="Collection-function surface in one pass: array HOFs (sort/distinct/"
    "slice/filter/reverse-sort/contains over word arrays — all builtin, "
    "row-local; array outputs serialized with array_join so order-"
    "insensitive canonicalizers can sort the result columns) joined with "
    "map-typed columns (word->count maps built with map_from_entries, "
    "probed with element_at — the per-row associative shape for sparse "
    "feature vectors).",
)
def collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("wa")
    )
    arrays = base.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct("wa")), ",").alias("sorted_vocab"),
        F.array_join(F.slice("wa", 1, 3), ",").alias("first3"),
        F.size(F.filter("wa", lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.concat_ws(
            ",", F.slice(F.reverse(F.array_sort(F.array_distinct("wa"))), 1, 2)
        ).alias("top2_rev"),
        F.array_contains("wa", "data").alias("has_data"),
    )
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
    ).select(
        "doc_id",
        F.size("m").alias("n_distinct_words"),
        F.element_at("m", "data").alias("n_data"),
    )
    return arrays.join(maps, "doc_id")


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
