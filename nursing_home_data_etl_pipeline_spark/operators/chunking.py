"""Document chunking — the context-window preparation op of an LLM data
pipeline: split documents into fixed-size overlapping word windows.

Row-local (explode of a per-row start sequence; no shuffle) and entirely
builtin expressions — chunking 100 TB of text is a map-only stage here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def chunk_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Output (id, chunk_id, chunk_text, n_words), one row per chunk;
    documents shorter than ``chunk_words`` yield a single chunk, and
    NULL/blank documents yield NO chunks (an empty chunk is useless to any
    downstream consumer, and a NULL one would poison concat/token counts).
    Chunk i starts at word i*(chunk_words-overlap), so consecutive chunks
    share ``overlap`` words. The word array is materialized before the
    slicing lambda (see dedup.shingle_table for why that matters)."""
    if not 0 <= overlap < chunk_words:
        # A negative overlap would silently DROP the words between
        # consecutive chunks (stride > chunk_words) — loud, not lossy.
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    # Normalize ONCE into a projected column, filter on the column, then
    # split the column (same reasoning as dedup.shingle_table: filtering
    # on the expression and then splitting it would run the regex chain
    # twice per row).
    normed = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
    )
    base = normed.filter(
        F.col("_norm").isNotNull() & (F.col("_norm") != "")
    ).select(F.col(id_col), F.split(F.col("_norm"), " ").alias("_w"))
    n = F.size("_w")
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.concat_ws(" ", F.slice(F.col("_w"), i * stride + 1, chunk_words)).alias(
                "chunk_text"
            ),
        ),
    )
    out = base.select(F.col(id_col), F.explode(chunks).alias("c"))
    # Every emitted chunk holds >= 1 word: blank/NULL docs were filtered
    # above, and the last chunk's start (n_chunks-1)*stride + 1 <= n, so
    # no slice is empty — chunk_text is never '' and the split is a true
    # word count.
    n_words = F.size(F.split(F.col("c.chunk_text"), " "))
    return out.select(
        F.col(id_col),
        F.col("c.chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        n_words.cast("long").alias("n_words"),
    )
