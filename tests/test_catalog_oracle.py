"""Run every catalog query against its DuckDB oracle at sf0.001 (fast guard;
the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from nursing_home_data_etl_pipeline_spark.plans import catalog
from nursing_home_data_etl_pipeline_spark.plans.verify import (
    compare_query,
    duckdb_connection,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(catalog.entries()))
def test_query_matches_oracle(spark, con, name):
    e = catalog.entries()[name]
    problems = compare_query(spark, con, e.spark, e.oracle, SF_DIR)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_register_rejects_misnamed_function():
    """VERDICT r14 #2: a helper def inserted between @register and the
    query def must raise at import time, not silently become the entry."""
    with pytest.raises(ValueError, match="same name"):

        @catalog.register("some_query", None)
        def a_helper(spark, sf_dir):  # pragma: no cover - never registered
            raise AssertionError
    assert "some_query" not in catalog.entries()


def test_tag_union_rejects_unknown_kwargs(spark):
    """ADVICE r9: a typoed column kwarg must raise, not NULL-fill silently."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    with pytest.raises(ValueError, match="typo_col"):
        catalog.tag_union(df, "v", {"a": "int"}, typo_col=F.lit(1))


def test_union_find_offload_oracle_detects_corruption(spark, con, tmp_path):
    """Round-12 #1: the sf10 offload gate replaces dedup_clusters'
    recursive-reachability oracle (OOM at sf10) with a streamed union-find.
    Prove the override (a) agrees with the exact comparator on the true
    result and (b) actually REJECTS each corruption class — wrong sizes,
    wrong labels, missing rows, and a duplicate-id row set whose total
    count still matches."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import _clusters_offloaded

    from pyspark.sql import functions as F

    good = catalog.entries()["dedup_clusters"].spark
    tmp = str(tmp_path)

    def run(fn, tag):
        return _clusters_offloaded(spark, con, tag, fn, None, SF_DIR, tmp)

    assert run(good, "g") == []
    assert "values" in run(
        lambda s, d: good(s, d).withColumn(
            "cluster_size", F.col("cluster_size") + 1), "b1")[0]
    assert "values" in run(
        lambda s, d: good(s, d).withColumn(
            "cluster_id",
            F.col("cluster_id")
            + F.when(F.col("cluster_size") > 1, 1).otherwise(0)), "b2")[0]
    assert "rowcount" in run(lambda s, d: good(s, d).limit(100), "b3")[0]

    def dup_and_drop(s, d):
        # deterministic by construction (ADVICE r12: limit()'s row choice
        # is unspecified — it could drop one of the duplicated copies and
        # yield the GOOD result): drop the min-id row, duplicate the max-id
        # row, so the total count matches but distinct ids are one short.
        df = good(s, d)
        lo, hi = df.agg(F.min("doc_id"), F.max("doc_id")).first()
        return df.filter(F.col("doc_id") != lo).unionAll(
            df.filter(F.col("doc_id") == hi))

    assert "distinct" in run(dup_and_drop, "b4")[0]


def test_streamed_offload_oracles_detect_corruption(spark, con, tmp_path):
    """Round-13 #3 twins of the union-find test: the streamed
    chunker/shingler overrides must (a) pass the true result, (b) build an
    ``_o`` that equals the SQL oracle's multiset EXACTLY at this sf
    (parity), and (c) reject a value edit, dropped rows, and a
    duplicate+drop whose total count still matches."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import (
        _chunks_offloaded,
        _near_pairs_offloaded,
        _training_offloaded,
    )

    from pyspark.sql import functions as F

    tmp = str(tmp_path)
    cases = (("chunk_documents", _chunks_offloaded, "n_words"),
             ("dedup_near_pairs", _near_pairs_offloaded, "n"),
             ("training_corpus", _training_offloaded, "n_words"))
    for name, ovr, valcol in cases:
        e = catalog.entries()[name]
        assert ovr(spark, con, f"{name}_g", e.spark, None, SF_DIR, tmp) == []
        ndiff, = con.execute(
            f"SELECT COUNT(*) FROM ("
            f"(SELECT * FROM _o EXCEPT ALL SELECT * FROM ({e.oracle}))"
            f" UNION ALL "
            f"(SELECT * FROM ({e.oracle}) EXCEPT ALL SELECT * FROM _o))"
        ).fetchone()
        assert ndiff == 0, f"{name}: override _o diverges from SQL oracle"
        bad = ovr(spark, con, f"{name}_b1",
                  lambda s, d, q=e.spark, v=valcol:
                  q(s, d).withColumn(v, F.col(v) + 1),
                  None, SF_DIR, tmp)
        assert bad and "values" in bad[0], name
        bad = ovr(spark, con, f"{name}_b2",
                  lambda s, d, q=e.spark: q(s, d).limit(5),
                  None, SF_DIR, tmp)
        assert bad and "rowcount" in bad[0], name

    e = catalog.entries()["chunk_documents"]

    def dup_and_drop(s, d):
        df = e.spark(s, d)
        lo, hi = df.agg(F.min("doc_id"), F.max("doc_id")).first()
        gone = (F.col("doc_id") == lo) & (F.col("chunk_id") == 0)
        twice = (F.col("doc_id") == hi) & (F.col("chunk_id") == 0)
        return df.filter(~gone).unionAll(df.filter(twice))

    bad = _chunks_offloaded(
        spark, con, "chunk_b4", dup_and_drop, None, SF_DIR, tmp)
    assert bad and "values" in bad[0]
