"""Degenerate-input robustness: empty corpora, single docs, blank text —
the states a 100 TB pipeline hits on its first and worst days."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nursing_home_data_etl_pipeline_spark.functions.text import quality_score, words
from nursing_home_data_etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from nursing_home_data_etl_pipeline_spark.operators.joins import merge_scd1
from nursing_home_data_etl_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
)

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_dedup_ops_on_empty_corpus(spark):
    empty = _empty_docs(spark)
    assert exact_dedup(empty).count() == 0
    assert minhash_dedup_pairs(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert simhash_signatures(empty).count() == 0


def test_single_doc_no_pairs(spark):
    one = spark.createDataFrame([(1, "a b c d e f g")], DOC_SCHEMA)
    assert minhash_dedup_pairs(one).count() == 0
    assert ngram_jaccard_pairs(one).count() == 0


def test_blank_text_doc(spark):
    docs = spark.createDataFrame([(1, "   "), (2, "real words here")], DOC_SCHEMA)
    # words() of blank -> empty array, quality defined (no div-by-zero)
    out = docs.select(
        F.size(words(F.col("text"))).alias("n"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert out[0].n == 0 and 0.0 <= out[0].q <= 1.0
    # exact dedup keeps both (different fingerprints: '' vs text)
    assert exact_dedup(docs).count() == 2


def test_similarity_empty_query_set(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    out = cosine_topk_bruteforce(corpus.filter("vec_id < 0"), corpus, k=5)
    assert out.count() == 0


def test_scd1_merge_empty_sides(spark):
    schema = T.StructType(
        [T.StructField("pk", T.StringType()), T.StructField("v", T.LongType())]
    )
    target = spark.createDataFrame([("a", 1)], schema)
    empty = spark.createDataFrame([], schema)
    # empty source -> target unchanged
    assert merge_scd1(target, empty, ["pk"]).count() == 1
    # empty target -> source inserted
    assert merge_scd1(empty, target, ["pk"]).count() == 1
