"""Second north-star batch: TF-IDF term weighting and an IVF-style ANN
variant (coarse-quantizer cells instead of hyperplane buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_rounded_prenorm
from ..functions.vectors import norm as vec_norm
from ..operators.components import dup_clusters
from ..operators.dedup import minhash_dedup_pairs
from ..sources.readers import read_table
from .catalog import register
from .queries_northstar import _minhash_pairs_cte


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte()},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM mh_pairs
      UNION
      SELECT id_b, id_a FROM mh_pairs
    ),
    reach(v, l) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.v
    ),
    comp AS (SELECT v AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY v),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size
    FROM comp JOIN sizes USING (cluster_id)
    """


@register(
    "dedup_clusters",
    oracle=_clusters_oracle(),
    doc="Near-dup CLUSTERS from MinHash-LSH pairs via distributed connected "
    "components (min-label propagation, converges in diameter rounds; "
    "each round is two hash joins). The keep-one dedup is then "
    "doc_id == cluster_id. Oracle: DuckDB recursive-CTE reachability.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs)
    return dup_clusters(docs, pairs)

# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


@register(
    "tfidf_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
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
    doc="TF-IDF term weighting: term frequency per doc x smoothed inverse "
    "document frequency — explode + two hash aggregations + one broadcast "
    "join on the (vocabulary-sized) df table; no Python.",
)
def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    tf = tf.withColumn("doc_len", F.sum("n").over(Window.partitionBy("doc_id")))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # Corpus size as a broadcast 1-row aggregate instead of a driver-side
    # .count(): the whole query stays one lazy plan, no extra job.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    return (
        tf.join(F.broadcast(df), "term")
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
_N_QUERIES = 20
_TOP_K = 10
_N_PROBE = 2  # query probes its 2 nearest cells — the IVF recall/cost knob

#: Long-form embeddings + norms and the fixed-dim contract: ONE
#: definition, imported from queries_northstar — a contract change there
#: (dim filter, zero-norm, NULL-element clauses) reaches the IVF oracle
#: automatically instead of via a hand-kept copy.
from .queries_northstar import _DIM_CONTRACT  # noqa: E402
from .queries_northstar import _DUCK_COSINE_BASE as _DUCK_EX  # noqa: E402


def _ivf_oracle() -> str:
    return f"""
    WITH {_DUCK_EX},
    cents AS (SELECT vec_id AS cent_id, i, x FROM ex WHERE vec_id < {_N_CELLS}),
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
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qprobe q JOIN cells c ON q.cell = c.cell
      WHERE c.vec_id <> q.vec_id
    ),
    dots AS (
      SELECT cand.query_id, cand.neighbor_id, SUM(a.x * b.x) AS dot
      FROM cand
      JOIN ex a ON a.vec_id = cand.query_id
      JOIN ex b ON b.vec_id = cand.neighbor_id AND b.i = a.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id, ROUND(dot / (na.n * nb.n), 6) AS cos_sim
      FROM dots
      JOIN norms na ON na.vec_id = query_id
      JOIN norms nb ON nb.vec_id = neighbor_id
    )
    SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """


@register(
    "similarity_ann_ivf",
    oracle=_ivf_oracle(),
    doc="IVF-style ANN: coarse quantizer (first 8 vectors as fixed cells — "
    "deterministic, training-free), assign every corpus vector to its "
    "nearest cell by L2 (min_by with (distance, cell_id) tiebreak), probe "
    "each query's nprobe=2 nearest cells with exact cosine — the standard "
    "IVF recall/cost knob; near-boundary queries recover neighbors their "
    "own cell misses for 2x candidate work on the (bounded, broadcast) "
    "query side only. The cell equi-join replaces the cross join, same "
    "contract as the RHP variant.",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-dim contract: a ragged vector would NULL out its L2 distance
    # to every centroid (zip_with NULL-pads) while the long-form oracle
    # would rank it by a partial distance.
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == _DIM_CONTRACT
    )
    cents = (
        emb.filter(F.col("vec_id") < _N_CELLS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    # L2 distance via zip_with fold; min_by with deterministic tiebreak.
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cvec"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored_cells = emb.join(F.broadcast(cents)).select(
        "vec_id", "embedding", "cent_id", d2.alias("d2")
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
        .withColumn("_nrm", vec_norm(F.col("embedding")))
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
            vec_norm(F.col("embedding")).alias("_qn"),
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
        cosine_rounded_prenorm(
            F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _TOP_K
    )
