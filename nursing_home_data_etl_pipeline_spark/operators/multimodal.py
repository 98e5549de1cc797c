"""Multimodal (binary) column operators (north star).

Design: image/audio/video payloads are opaque ``BinaryType`` columns with a
typed metadata struct alongside. All per-item processing (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched pandas functions
over ``mapInPandas`` — bytes never round-trip through Python row objects,
and each task processes a whole Arrow batch at a time. That is the Spark
plumbing that matters at 100 TB; the codec itself is pluggable.

This container ships no image/audio libraries, so the real codecs are
STUBBED (clearly marked, import-gated) and a deterministic fake decoder
exercises the full plumbing — schema, partitioning, UDF signature, batch
shape — end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the (fake) decoder — what a real image decode would
#: produce: dimensions + a small feature header.
DECODE_SCHEMA = (
    "doc_id long, n_bytes long, header_hex string, fake_width int, fake_height int"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a multimodal table: payload bytes + metadata struct. (Test data
    has no real media, so the payload is the UTF-8 text — the engine-side
    handling is identical for real image/audio bytes.)"""
    payload = F.col(text_col).cast("binary")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.lit("synthetic").alias("source"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def decode_fake(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake decode over mapInPandas: per-batch pandas ops on
    the raw bytes (length, 8-byte header hex, fake dimensions derived from
    byte content). Exercises the exact plumbing a real decoder uses.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            # NULL payload (row never had media attached) decodes to NULL
            # metadata — distinct from an EMPTY payload (0 bytes, header "").
            # pandas nullable Int64/Int32 carries the NA through Arrow.
            n_bytes = payload.map(lambda b: len(b) if b is not None else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("Int64"),
                    "header_hex": payload.map(
                        lambda b: bytes(b[:8]).hex() if b is not None else None
                    ),
                    "fake_width": (n_bytes % 640).astype("Int32"),
                    "fake_height": payload.map(
                        lambda b: (b[0] if len(b) else 0) if b is not None else None
                    ).astype("Int32"),
                }
            )

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


#: Output schema of the real image decode — true dimensions + color mode.
IMAGE_DECODE_SCHEMA = "doc_id long, n_bytes long, width int, height int, mode string"


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real image decode over the same mapInPandas plumbing as
    :func:`decode_fake` — the ENVIRONMENT is the only gate: Pillow is not
    in this container (verified by import), so the import check raises
    NotImplementedError here, but the body is complete and runs wherever
    Pillow is installed on the executors (covered by a skipif(no PIL) test).

    Same contracts as the fake: bytes stay in Arrow buffers between stages;
    a NULL payload decodes to NULL metadata (distinct from an EMPTY payload,
    which is a decode ERROR — Pillow raises, failing the task loudly rather
    than emitting fabricated dimensions). The per-item loop inside the
    Arrow batch is inherent to codecs (Pillow decodes one image at a time);
    the batch boundary is still Arrow-sized, never row-at-a-time Python.
    """
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow on the executors; "
            "use decode_fake() for plumbing tests"
        ) from exc
    import io

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            widths: list[int | None] = []
            heights: list[int | None] = []
            modes: list[str | None] = []
            for b in payload:
                if b is None:
                    widths.append(None)
                    heights.append(None)
                    modes.append(None)
                else:
                    with Image.open(io.BytesIO(bytes(b))) as im:
                        widths.append(im.width)
                        heights.append(im.height)
                        modes.append(im.mode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payload.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "mode": pd.Series(modes, dtype="object"),
                }
            )

    return df.mapInPandas(decode, schema=IMAGE_DECODE_SCHEMA)


def resize_fake(df: DataFrame, factor: int = 4) -> DataFrame:
    """Resize analog — binary IN, binary OUT, metadata updated in the same
    pass: keeps every ``factor``-th byte of the payload (a real image resize
    is the same mapInPandas shape with ``PIL.Image.resize`` in the batch
    loop). The binary->binary contract is the one that matters for chained
    media pipelines (decode -> resize -> re-encode) — payload bytes stay in
    Arrow buffers between stages, never materialized as Python row objects.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"].map(
                lambda b: bytes(b[::factor]) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payload,
                    "n_bytes": payload.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                }
            )

    return df.mapInPandas(
        resize, schema="doc_id long, payload binary, n_bytes long"
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling STUB analog: real video frame sampling needs a codec;
    the deterministic stand-in samples every Nth byte as a 'frame marker' —
    same mapInPandas shape a real sampler uses."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pdf["payload"].map(
                        lambda b: max(len(b) // every_n_bytes, 0)
                        if b is not None
                        else None
                    ).astype("Int64"),
                }
            )

    return df.mapInPandas(sample, schema="doc_id long, n_frames long")
