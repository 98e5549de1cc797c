"""Sequence-packing catalog query: documents -> fixed-budget training
sequence spans (operators/packing.py), with a DuckDB oracle that replays the
identical placement arithmetic through one flat window cumsum (fine at
oracle scale; the Spark side uses the two-level distributed scan).

Registration-order note: the round driver evaluates queries in
registration order and has historically capped how many it checks (50).
The round-6 consolidation fixed the catalog at EXACTLY 50 entries, so
every entry is driver-checked; this module registers near the tail
(plans/__init__.py order), followed by queries_streamjoin_cms and
queries_tail2 — the cap discipline now lives in keeping the catalog at
<= 50, not in any single module being literally last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import duck_words_sql, words
from ..operators.dedup import hex_to_bigint_sql
from ..operators.packing import pack_sequences
from ..sources.readers import read_table
from .catalog import register

_BUDGET = 512
_N_SHARDS = 64

#: DuckDB twin of operators.packing._shard: first 8 md5 hex chars of
#: 'pack' || doc_id as an integer, mod n_shards (conv() is Spark-only).
#: NULL ids coalesce to the SAME chr(0)-sentinel as _shard — a NULL
#: concat would shard NULL and desync the whole packed stream's offsets.
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
      -- pack_sequences filters _tok > 0: blank and NULL-text docs own no
      -- token interval (len of the blank-safe words twin is 0 or NULL;
      -- the alias keeps the two-regex words expression evaluated once)
      WHERE tok > 0
    ),
    placed AS (
      SELECT doc_id, tok,
             CAST(COALESCE(SUM(tok) OVER (
               ORDER BY shard, doc_id NULLS FIRST
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
    doc="GPT-style concat-and-chunk sequence packing: place every document's "
    "word-token interval into a stream of back-to-back 512-token training "
    "sequences; long documents straddle boundaries. Spark side is the "
    "two-level distributed prefix sum (per-shard window cumsum + broadcast "
    "shard offsets — no corpus-sized single-partition stage); the oracle "
    "replays the same placement with one flat window.",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", F.size(words(F.col("text"))).cast("long").alias("n_tok")
    )
    return pack_sequences(
        with_tok, "n_tok", budget=_BUDGET, id_col="doc_id", n_shards=_N_SHARDS
    )
