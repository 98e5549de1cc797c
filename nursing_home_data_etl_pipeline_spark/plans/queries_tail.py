"""Catalog TAIL: the last batch registration block of the 50-entry driver
window (import order IS catalog order — see plans/__init__.py). Cohesion
here is POSITION, not topic — file index:
  dedup_clusters | tfidf_terms | similarity_ann_ivf |
  pack_training_sequences | tpch_shapes_q4_q13_q18
The four streaming drains live in queries_streaming (round-11 split)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import duck_words_sql, words
from ..functions.vectors import cosine_prenorm_sql, l2_sql, norm_sql
from ..operators.similarity import _rank_topk
from ..operators.components import dup_clusters
from ..operators.dedup import hex_to_bigint_sql, minhash_dedup_pairs
from ..operators.packing import pack_sequences
from ..sources.readers import read_table
from .catalog import register
from .queries_northstar import _cc_comp_cte, _minhash_pairs_cte


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte()},
    {_cc_comp_cte("documents WHERE doc_id IS NOT NULL")},
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size
    FROM comp JOIN sizes USING (cluster_id)
    """


@register(
    "dedup_clusters",
    oracle=_clusters_oracle(),
    doc="Near-dup CLUSTERS from MinHash-LSH pairs via distributed connected "
    "components (min-label propagation). Full contract: "
    "docs/CONTRACTS.md#dedup_clusters",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    pairs = minhash_dedup_pairs(docs)
    return dup_clusters(docs, pairs)

# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


@register(
    "tfidf_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({duck_words_sql('lower(text)')}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term,
             COUNT(*) AS n,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len
      FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n_docs AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id,
           tf.term,
           ROUND((CAST(tf.n AS DOUBLE) / tf.doc_len)
                 * (ln((n_docs.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n_docs
    """,
    doc="TF-IDF: per-doc term frequency x smoothed IDF — explode + two hash "
    "aggregations + an equi-join on the vocabulary-sized df table (AQE sizes "
    "the join. Full contract: docs/CONTRACTS.md#tfidf_terms",
)
def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(words(F.lower(F.col("text")))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    # doc_len over tf (the (doc, term)-sized aggregate): NULL-id docs
    # merge into ONE group whose doc_len must SUM across them — the
    # window IS the semantic, not a row-local size(words).
    tf = tf.withColumn("doc_len", F.sum("n").over(Window.partitionBy("doc_id")))
    # df as a count over tf reuses tf's exchange (countDistinct over toks
    # would plan Expand + two extra shuffles); count("doc_id") skips
    # NULL-id docs, matching COUNT(DISTINCT doc_id).
    df = tf.groupBy("term").agg(F.count("doc_id").alias("df"))
    # Corpus size as a broadcast 1-row aggregate instead of a driver-side
    # .count(): the whole query stays one lazy plan, no extra job.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    return (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("n").cast("double") / F.col("doc_len"))
                * (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-style ANN
# ---------------------------------------------------------------------------

_N_CELLS = 8
_N_PROBE = 2  # query probes its 2 nearest cells — the IVF recall/cost knob

#: Long-form embeddings/norms, dim contract, batch/top-k sizes, and SQL
#: tails: ONE definition each in queries_northstar — no hand-kept copy.
from .queries_similarity import _DIM_CONTRACT, _N_QUERIES, _TOP_K  # noqa: E402
from .queries_similarity import _DUCK_COSINE_BASE as _DUCK_EX  # noqa: E402
from .queries_similarity import _TOPK_TAIL, _cand_scored_sql  # noqa: E402


def _ivf_oracle() -> str:
    return f"""
    WITH {_DUCK_EX},
    cents AS (
      -- seed slots restricted to VALID vectors (full-dim, non-NULL
      -- elements, nonzero norm) — full rationale at the engine's cents
      -- filter in similarity_ann_ivf below
      SELECT vec_id AS cent_id, i, x FROM ex
      WHERE vec_id < {_N_CELLS} AND vec_id IN (SELECT vec_id FROM norms)
    ),
    assign AS (
      SELECT e.vec_id, c.cent_id,
             SUM((e.x - c.x) * (e.x - c.x)) AS d2
      FROM ex e JOIN cents c USING (i)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT vec_id, cent_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
      FROM assign
    ),
    cells AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
    qprobe AS (
      SELECT vec_id, cent_id AS cell FROM ranked
      WHERE rn <= {_N_PROBE} AND vec_id < {_N_QUERIES}
    ),
    {_cand_scored_sql('''
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qprobe q JOIN cells c ON q.cell = c.cell
      WHERE c.vec_id <> q.vec_id''')}
    {_TOPK_TAIL}
    """


@register(
    "similarity_ann_ivf",
    oracle=_ivf_oracle(),
    doc="IVF-style ANN: coarse quantizer (first 8 vectors as fixed cells, training- "
    "free), corpus assigned to nearest cell by L2 (min_by with (distance, "
    "cell_id) tiebreak). Full contract: docs/CONTRACTS.md#similarity_ann_ivf",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-dim contract: a ragged vector would NULL out its L2 distance
    # to every centroid (zip_with NULL-pads) while the long-form oracle
    # would rank it by a partial distance.
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == _DIM_CONTRACT
    )
    # Seed slots must be VALID vectors (non-NULL elements, nonzero norm):
    # one broken seed would NULL every d2 and collapse the corpus into
    # its cell. Mirrors the cents CTE.
    cents = (
        emb.filter(
            (F.col("vec_id") < _N_CELLS)
            & (F.expr(norm_sql("embedding")) > 0)
        )
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    # L2 distance via zip_with fold; min_by with deterministic tiebreak.
    scored_cells = emb.join(F.broadcast(cents)).select(
        "vec_id", "embedding", "cent_id",
        F.expr(l2_sql("embedding", "cvec")).alias("d2"),
    )
    # Corpus side: ONE cell per vector via a single hash aggregate (never a
    # window over the full corpus). The norm is computed here — once per
    # VECTOR, not per candidate pair (HOF folds are the per-pair cost).
    assigned = (
        scored_cells.groupBy("vec_id")
        .agg(
            F.expr("min_by(cent_id, struct(d2, cent_id))").alias("cell"),
            F.first("embedding").alias("embedding"),
        )
        .withColumn("_nrm", F.expr(norm_sql("embedding")))
        # NULL/zero-norm vectors have no cosine — excluded (same contract
        # as operators.similarity; one dirty row must not abort the job).
        .filter(F.col("_nrm") > 0)
    )
    # Query side is a bounded batch — the nprobe ranking window only ever
    # sees n_queries x n_cells rows.
    wq = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cent_id"))
    q = (
        scored_cells.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= _N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cent_id").alias("cell"),
            F.col("embedding").alias("_qv"),
            F.expr(norm_sql("embedding")).alias("_qn"),
        )
        .filter(F.col("_qn") > 0)
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell"),
        F.col("embedding").alias("_cv"),
        F.col("_nrm").alias("_cn"),
    )
    # A query appears once per probed cell and each neighbor owns ONE cell,
    # so (query, neighbor) pairs are already distinct — no dedup needed.
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.expr(cosine_prenorm_sql("_qv", "_cv", "_qn", "_cn")).alias("cos_sim"),
    )
    return _rank_topk(scored, _TOP_K)


# ===========================================================================
# Sequence-packing catalog query: documents -> fixed-budget training
# ===========================================================================

_BUDGET = 512
_N_SHARDS = 64
_DUCK_SHARD = (
    hex_to_bigint_sql(
        "md5('pack' || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || '<null>'))",
        n_chars=8,
    )
    + f" % {_N_SHARDS}"
)


def _packing_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             len({duck_words_sql("text")}) AS tok,
             {_DUCK_SHARD} AS shard
      FROM documents
      -- blank/NULL-text docs own no token interval (pack_sequences
      -- filters _tok > 0)
      WHERE tok > 0
    ),
    placed AS (
      SELECT doc_id, tok,
             CAST(COALESCE(SUM(tok) OVER (
               -- tok mirrors pack_sequences' duplicate-id tiebreaker:
               -- two NULL-id docs tie on (shard, id) alone and their
               -- placement order was engine-partition-dependent
               ORDER BY shard, doc_id NULLS FIRST, tok NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS s0
      FROM toks
    ),
    spans AS (
      SELECT doc_id, s0, tok,
             unnest(generate_series(s0 // {_BUDGET}, (s0 + tok - 1) // {_BUDGET}))
               AS seq_id
      FROM placed
    )
    SELECT doc_id,
           seq_id,
           GREATEST(s0, seq_id * {_BUDGET}) - seq_id * {_BUDGET} AS seq_offset,
           LEAST(s0 + tok, (seq_id + 1) * {_BUDGET})
             - GREATEST(s0, seq_id * {_BUDGET}) AS n_tokens,
           GREATEST(s0, seq_id * {_BUDGET}) = s0 AS is_head
    FROM spans
    """


@register(
    "pack_training_sequences",
    oracle=_packing_oracle(),
    doc="GPT-style concat-and-chunk sequence packing: place every document's word- "
    "token interval into a stream of back-to-back. Full contract: "
    "docs/CONTRACTS.md#pack_training_sequences",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", F.size(words(F.col("text"))).cast("long").alias("n_tok")
    )
    return pack_sequences(
        with_tok, "n_tok", budget=_BUDGET, id_col="doc_id", n_shards=_N_SHARDS
    )

# ===========================================================================
# TPC-H-shaped multi-join queries beyond Q3/Q5/Q10/Q14: Q4 (EXISTS
# ===========================================================================

_NULL_COLS_SQL = (
    "CAST(NULL AS BIGINT) AS k_id, CAST(NULL AS BIGINT) AS k_id2, "
    "CAST(NULL AS VARCHAR) AS k_date, CAST(NULL AS DOUBLE) AS price, "
    "CAST(NULL AS DOUBLE) AS qty"
)


@register(
    "tpch_shapes_q4_q13_q18",
    oracle=f"""
    SELECT 'q4' AS variant,
           o.o_orderpriority AS k_str,
           {_NULL_COLS_SQL},
           COUNT(*) AS cnt
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    UNION ALL
    SELECT 'q13',
           CAST(NULL AS VARCHAR),
           c_count,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           COUNT(*)
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    UNION ALL
    SELECT 'q18',
           c.c_name,
           o.o_orderkey,
           c.c_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d'),
           ROUND(o.o_totalprice, 2),
           -- qty rounded like price: a raw double SUM is summation-order
           -- sensitive (Spark partial-merge vs DuckDB scan order) past the
           -- verifier's 6-decimal canon under catastrophic cancellation
           ROUND(SUM(l.l_quantity), 2),
           CAST(NULL AS BIGINT)
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 260
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="Three TPC-H shapes, one tagged row set per query. Full contract: "
    "docs/CONTRACTS.md#tpch_shapes_q4_q13_q18",
)
def tpch_shapes_q4_q13_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import tag_union

    types = {
        "k_str": "string", "k_id": "long", "k_id2": "long",
        "k_date": "string", "price": "double", "qty": "double", "cnt": "long",
    }

    def tag(df: DataFrame, variant: str, **cols) -> DataFrame:
        return tag_union(df, variant, types, **cols)

    # --- q4: EXISTS semi-join with correlated date bound ------------------
    o4 = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l4 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o4.join(
        l4,
        (o4["o_orderkey"] == l4["l_orderkey"])
        & (l4["l_shipdate"] > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    q4 = tag(
        late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt")),
        "q4",
        k_str=F.col("o_orderpriority"),
        cnt=F.col("cnt"),
    )

    # --- q13: outer-join count distribution -------------------------------
    c13 = read_table(spark, sf_dir, "customer").select("c_custkey")
    o13 = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c13.join(o13, c13["c_custkey"] == o13["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    q13 = tag(
        per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("cnt")),
        "q13",
        k_id=F.col("c_count"),
        cnt=F.col("cnt"),
    )

    # --- q18: having-subquery detail join ---------------------------------
    l18 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l18.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_s"))
        .filter(F.col("_s") > 260)
        .select("l_orderkey")
    )
    # Only the tiny big-order key set gets an explicit broadcast hint; the
    # orders/customer sides are data-dependent — AQE picks their strategy.
    o18 = read_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c18 = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = l18.join(o18, l18["l_orderkey"] == o18["o_orderkey"]).join(
        c18, o18["o_custkey"] == c18["c_custkey"]
    )
    q18 = tag(
        joined.groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        ).agg(F.round(F.sum("l_quantity"), 2).alias("qty")),
        "q18",
        k_str=F.col("c_name"),
        k_id=F.col("o_orderkey"),
        k_id2=F.col("c_custkey"),
        k_date=F.date_format("o_orderdate", "yyyy-MM-dd"),
        price=F.round(F.col("o_totalprice"), 2),
        qty=F.col("qty"),
    )

    return q4.unionByName(q13).unionByName(q18)
