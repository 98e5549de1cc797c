from __future__ import annotations

import pytest

from nursing_home_data_etl_pipeline_spark.operators.chunking import chunk_table


def test_chunk_overlap_and_coverage(spark):
    words = [f"w{i}" for i in range(120)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    chunks = sorted(
        chunk_table(df, chunk_words=50, overlap=10).collect(),
        key=lambda r: r.chunk_id,
    )
    # 120 words, stride 40 -> ceil((120-10)/40) = 3 chunks
    assert [r.chunk_id for r in chunks] == [0, 1, 2]
    assert chunks[0].chunk_text.split(" ") == words[0:50]
    assert chunks[1].chunk_text.split(" ") == words[40:90]
    assert chunks[2].chunk_text.split(" ") == words[80:120]
    # overlap: last 10 of chunk0 == first 10 of chunk1
    assert chunks[0].chunk_text.split(" ")[-10:] == chunks[1].chunk_text.split(" ")[:10]
    # full coverage: union of chunks == original words
    seen = set()
    for c in chunks:
        seen.update(c.chunk_text.split(" "))
    assert seen == set(words)


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = chunk_table(df, chunk_words=50, overlap=10).collect()
    assert len(out) == 1 and out[0].chunk_text == "a b c" and out[0].n_words == 3


def test_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_table(df, chunk_words=10, overlap=10)


def test_empty_and_null_documents_report_zero_words(spark):
    from nursing_home_data_etl_pipeline_spark.operators.chunking import chunk_table

    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    rows = chunk_table(df).collect()
    assert all(r.n_words == 0 for r in rows)
