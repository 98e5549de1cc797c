"""Round-5 tail addition: streaming dedup with bounded state.

Exactly checkable: union two independent file-stream reads of the SAME
events table (every row arrives twice), dedup on event_id with
``dropDuplicatesWithinWatermark`` (state evicted once the watermark passes
— bounded by the in-flight window, not by history; plain dropDuplicates
keeps every key forever), drain bounded -> exactly one row per event.

Product quantization stays OUT of the catalog deliberately: a
driver-visible rows-only row would cost ~25 s of Lloyd-training wall per
bench run (the trainer is m x iters driver-coordinated sweeps) for a check
weaker than the existing pytest, which pins reconstruction-exact recall
1.0 (`tests/test_dedup_similarity.py`).

Registered at the catalog tail (see queries_packing docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register
from .queries_streaming import _drain_to_memory, stream_events


@register(
    "streaming_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    doc="Streaming exact dedup with BOUNDED state: two identical event "
    "streams unioned (each event arrives twice), deduped on event_id via "
    "dropDuplicatesWithinWatermark — per-key state is dropped once the "
    "watermark passes, so state scales with the in-flight window instead "
    "of all history (the difference between a dedup that survives a year "
    "of stream and one that OOMs). Bounded drain => exactly the distinct "
    "event rows.",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["event_id", "user_id", "event_type", "ts"]
    a = stream_events(spark, sf_dir).select(cols)
    b = stream_events(spark, sf_dir).select(cols)
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return _drain_to_memory(deduped, "append")
