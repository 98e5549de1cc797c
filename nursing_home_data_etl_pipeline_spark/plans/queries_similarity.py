"""Similarity-search and multimodal queries (split from queries_northstar,
round-13 #6 — that file passed the ~600-LoC plans guidance): brute-force +
RHP-LSH cosine top-k, embedding near-duplicate pairs, and the mapInArrow
multimodal decode. Catalog names and semantics unchanged. Oracle
portability rules: see queries_northstar's module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import duck_round_sql
from ..operators.dedup import hex_to_bigint_sql
from ..operators.multimodal import decode_fake, with_binary_payload
from ..operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    hyperplanes,
)
from ..sources.readers import read_table
from .catalog import register


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_N_QUERIES = 20
_TOP_K = 10

#: Declared embedding dimensionality; vectors of any OTHER length are
#: excluded from similarity search (engine contract): a ragged vector has
#: no defined cosine against the corpus — Spark's zip_with would NULL-pad
#: it while a long-form SQL join would silently compute a partial dot.
_DIM_CONTRACT = 64

#: PRECONDITION of every query built on this CTE: ``vec_id`` is unique —
#: the long-form oracle GROUPs BY vec_id, so two rows sharing an id would
#: conflate into one 2x-dim group while the engine scores each row
#: independently. Resolve duplicates upstream (latest_per_key) before ANN.
_DUCK_COSINE_BASE = f"""
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
           WHERE len(embedding) = {_DIM_CONTRACT}),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM ex GROUP BY vec_id
              HAVING sum(x * x) > 0
                 -- COUNT(x) counts NON-NULL components: DuckDB SUM skips
                 -- NULL addends (partial dot), Spark's fold NULLs the whole
                 -- product -- vectors with any NULL element are excluded
                 AND COUNT(x) = {_DIM_CONTRACT})
"""


def _cand_scored_sql(cand_sql: str) -> str:
    """Exact cosine over a candidate-pair CTE — the tail shared by every
    ANN oracle (brute/LSH here, IVF in queries_tail). Joining ``norms``
    drops pairs with an invalid side (zero-norm / NULL-element vectors),
    mirroring the engine's dirty-input contract."""
    return f"""
    cand AS ({cand_sql}),
    dots AS (
      SELECT cand.query_id, cand.neighbor_id, SUM(a.x * b.x) AS dot
      FROM cand
      JOIN ex a ON a.vec_id = cand.query_id
      JOIN ex b ON b.vec_id = cand.neighbor_id AND b.i = a.i
      GROUP BY 1, 2
    ),
    scored AS (
      -- duck_round_sql mirrors round_half_away: cos ratios sit at repr
      -- midpoints where ROUND and F.round disagree (323/640 — round 8)
      SELECT query_id, neighbor_id, {duck_round_sql("dot / (nq.n * nc.n)")} AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    )"""


#: Deterministic per-query top-k over ``scored``: rounded cosine desc,
#: neighbor id tiebreak (NULLS FIRST per the pinned oracle contract).
_TOPK_TAIL = f"""
    SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id NULLS FIRST) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """

#: Brute force = every valid (norms-member) query x corpus pair.
_BRUTE_CAND = f"""
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}"""

_BRUTE_TOPK_SQL = f"""
    WITH {_DUCK_COSINE_BASE},
    {_cand_scored_sql(_BRUTE_CAND)}
    {_TOPK_TAIL}
    """


_N_PLANES = 6
_DIM = 64


def _planes_values_sql(n_planes: int = _N_PLANES) -> str:
    rows = []
    for p, plane in enumerate(hyperplanes(n_planes, _DIM)):
        for i, v in enumerate(plane, start=1):
            rows.append(f"({p}, {i}, {v!r})")
    return "planes(p, i, v) AS (SELECT * FROM (VALUES " + ", ".join(rows) + "))"


def _rhp_buckets_sql(planes_sql: str, mask: str = "") -> str:
    """RHP signature CTEs (per-plane dots -> sign-bit bucket), shared by
    the LSH top-k and near-dup oracles; ``mask`` optionally bounds the
    plane set (the near-dup derived count)."""
    return f"""
    {planes_sql},
    pdots AS (
      SELECT ex.vec_id, planes.p, SUM(ex.x * planes.v) AS d
      FROM ex JOIN planes ON ex.i = planes.i{mask}
      GROUP BY 1, 2
    ),
    buckets AS (
      SELECT vec_id, SUM(CASE WHEN d > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS bucket
      FROM pdots GROUP BY vec_id
    )"""


def _ann_lsh_oracle() -> str:
    cand = f"""
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket
      WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id"""
    return f"""
    WITH {_DUCK_COSINE_BASE},
    {_rhp_buckets_sql(_planes_values_sql())},
    {_cand_scored_sql(cand)}
    {_TOPK_TAIL}
    """


@register(
    "similarity_topk",
    oracle=f"""
    SELECT 'brute' AS variant, query_id, neighbor_id, cos_sim, rank
    FROM ({_BRUTE_TOPK_SQL})
    UNION ALL
    SELECT 'lsh', query_id, neighbor_id, cos_sim, rank
    FROM ({_ann_lsh_oracle()})
    """,
    doc="Cosine top-k both ways. Full contract: docs/CONTRACTS.md#similarity_topk",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-dim contract: off-dimension vectors are excluded (see
    # _DIM_CONTRACT) — zip_with would NULL-pad a ragged pair into a NULL
    # cosine while the long-form oracle would compute a partial dot.
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == _DIM_CONTRACT
    )
    queries_batch = emb.filter(F.col("vec_id") < _N_QUERIES)
    cols = ["query_id", "neighbor_id", "cos_sim", "rank"]
    brute = cosine_topk_bruteforce(queries_batch, emb, k=_TOP_K).select(
        F.lit("brute").alias("variant"), *cols
    )
    lsh = cosine_topk_lsh(
        queries_batch, emb, n_planes=_N_PLANES, dim=_DIM, k=_TOP_K
    ).select(F.lit("lsh").alias("variant"), *cols)
    return brute.unionByName(lsh)


_NEAR_DUP_THRESHOLD = 0.3


def _near_dup_oracle() -> str:
    from ..operators.similarity import RHP_MAX_PLANES, RHP_TARGET_OCCUPANCY

    cand = """
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"""
    return f"""
    WITH {_DUCK_COSINE_BASE},
    np AS (
      SELECT GREATEST(4, LEAST({RHP_MAX_PLANES},
             CAST(CEIL(LOG2(GREATEST(COUNT(*), 1) / {RHP_TARGET_OCCUPANCY}.0)) AS INT))) AS np
      -- GREATEST(.,1): DuckDB LOG2(0) errors; tiny corpora clamp to the
      -- same lower bound as the engine's derive_n_planes
      FROM embeddings WHERE len(embedding) = {_DIM_CONTRACT}
    ),
    {_rhp_buckets_sql(
        _planes_values_sql(RHP_MAX_PLANES),
        " CROSS JOIN np WHERE planes.p < np.np",
    )},
    {_cand_scored_sql(cand)}
    SELECT query_id AS id_a, neighbor_id AS id_b, cos_sim
    FROM scored WHERE cos_sim >= {_NEAR_DUP_THRESHOLD}
    """


@register(
    "embedding_near_dup",
    oracle=_near_dup_oracle(),
    doc="Embedding-cosine near-duplicate pairs: RHP bucket collision + cosine >= "
    "threshold (0.3 fits this corpus's random-vector range; real corpora use "
    "~0.95). Full contract: docs/CONTRACTS.md#embedding_near_dup",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-dim contract (also keeps the derived plane count — a function
    # of the corpus COUNT — identical on both sides).
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == _DIM_CONTRACT
    )
    return embedding_near_dup_pairs(emb, threshold=_NEAR_DUP_THRESHOLD, dim=_DIM)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)        AS n_bytes,
           -- first 8 BYTES of the encoded payload = first 16 hex chars
           -- (this DuckDB lacks BLOB substring). A char slice of the text
           -- would diverge on multibyte input: the engine's header read is
           -- a byte op.
           substr(lower(hex(encode(text))), 1, 16)           AS header_hex,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
           -- first BYTE of the payload (via 2 hex chars), not the first
           -- CHARACTER's code point: ascii('é') is 233 but the engine
           -- reads payload[0] = 195 (the first UTF-8 byte)
           CAST({hex_to_bigint_sql("lower(hex(encode(text)))", 1, 2)} AS INTEGER) AS fake_height
    FROM documents
    """,
    doc="Multimodal plumbing: BinaryType payload + metadata struct decoded by an "
    "Arrow-batched mapInArrow fake codec. Full contract: "
    "docs/CONTRACTS.md#multimodal_decode",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return decode_fake(with_binary_payload(docs))
