"""Sequence packing (GPT-style concat-and-chunk): deterministic global
order, fixed-budget cuts. The scale hazard is the global exclusive prefix
sum — a naive Window.orderBy funnels the corpus through ONE task; here it
is the classic two-level scan (content-hash shards -> per-shard windowed
cumsum -> tiny shard-total cumsum broadcast back), every corpus-sized
stage hash-partitioned; the (shard, order_key) order is arbitrary but
total and engine-reproducible."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Content-hash shard in [0, n_shards): first 8 md5 hex chars as an int.
#: NULL ids hash via a sentinel: a NULL shard would be included in the
#: offset cumsum (NULLs sort first) yet dropped by the inner offset join —
#: silently losing the rows AND leaving a hole in the packed stream.
def _shard(key, n_shards: int):
    safe = F.coalesce(key.cast("string"), F.lit("\x00<null>"))
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("pack"), safe)), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Assign every document its span(s) in a stream of back-to-back
    ``budget``-token training sequences. Design notes:
    docs/DESIGN.md#packing-pack-sequences"""
    if budget <= 0:
        raise ValueError("budget must be positive")
    tok = F.col(token_col).cast("long")
    base = df.select(
        F.col(id_col),
        tok.alias("_tok"),
        _shard(F.col(id_col), n_shards).alias("_shard"),
    ).filter(F.col("_tok") > 0)

    # 2) per-shard EXCLUSIVE cumsum: parallel across shards. _tok breaks
    # duplicate-id ties deterministically (see docstring).
    w = (
        Window.partitionBy("_shard")
        .orderBy(id_col, "_tok")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = base.withColumn("_intra", F.coalesce(F.sum("_tok").over(w), F.lit(0)))

    # 3) exclusive cumsum of per-shard totals -> broadcast back; totals
    # derive from the WINDOW OUTPUT (map-side only), not a second corpus
    # scan branch (docs/DESIGN.md#packing-prefix-sum).
    totals = intra.groupBy("_shard").agg(F.sum("_tok").alias("_shard_tok"))
    w_sh = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_shard", F.coalesce(F.sum("_shard_tok").over(w_sh), F.lit(0)).alias("_shard_off")
    )
    placed = intra.join(F.broadcast(offsets), "_shard").select(
        id_col,
        "_tok",
        (F.col("_shard_off") + F.col("_intra")).alias("_start"),
    )

    # 4) explode each document's [start, start+tok) interval into per-
    # sequence spans: row-local, no further shuffle. Integer `div`, not
    # floor(x / y): double division loses exactness past ~2^53 total
    # tokens, and the oracle twin uses exact integer division.
    first_seq = F.expr(f"_start div {budget}")
    last_seq = F.expr(f"(_start + _tok - 1) div {budget}")
    spans = placed.select(
        id_col,
        "_start",
        "_tok",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    span_begin = F.greatest(F.col("_start"), F.col("seq_id") * budget)
    span_end = F.least(F.col("_start") + F.col("_tok"), (F.col("seq_id") + 1) * budget)
    return spans.select(
        F.col(id_col),
        F.col("seq_id").cast("long").alias("seq_id"),
        (span_begin - F.col("seq_id") * budget).cast("long").alias("seq_offset"),
        (span_end - span_begin).cast("long").alias("n_tokens"),
        (span_begin == F.col("_start")).alias("is_head"),
    )
