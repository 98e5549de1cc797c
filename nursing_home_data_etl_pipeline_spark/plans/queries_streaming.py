"""Streaming queries under the driver contract: each runs a bounded
Structured Streaming job over the events table (memory sink, drained with
processAllAvailable) and returns the result table — so the DuckDB oracle can
check STREAMING results against batch SQL, proving batch/stream equivalence.

The events parquet stores TIMESTAMP(NANOS): the streaming schema reads ts
as long (nanosAsLong) and converts to microseconds exactly as read_table
does for batch.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming.aggregations import (
    running_totals_stateful,
    session_counts,
    windowed_counts,
)
from .catalog import register

_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file stream over the events table, with ``ts`` normalized to
    TimestampType (LTZ, UTC session tz) — the streaming twin of
    ``sources.readers.read_table``. The on-disk encoding has varied across
    testdata generations (TIMESTAMP(NANOS) vs plain micros / NTZ), so probe
    the batch-inferred type once (footer-only) and build the matching
    streaming schema."""
    from ..sources.readers import (
        normalize_events_ts,
        path_is_dir,
        pin_events_time_confs,
    )

    pin_events_time_confs(spark)  # shared encoding contract (readers.py)
    events_path = f"{sf_dir}/events.parquet"
    ts_type = dict(spark.read.parquet(events_path).dtypes).get("ts")
    # A directory-shaped table (standard Spark-written output) streams
    # directly; a single-file table needs the glob filter to isolate it
    # within the sf dir. pathGlobFilter matches LEAF file names, so
    # applying it to a directory table would filter out every part-* file
    # and silently drain an empty stream.
    if path_is_dir(spark, events_path):
        reader, stream_path = spark.readStream, events_path
    else:
        reader = spark.readStream.option("pathGlobFilter", "events.parquet")
        stream_path = sf_dir
    # readStream needs an EXPLICIT schema: substitute the probed ts type,
    # then normalize through the same shared helper the batch reader uses.
    if ts_type == "bigint":  # nanos-as-long generation
        raw = reader.schema(_EVENTS_RAW_SCHEMA).parquet(stream_path)
    else:
        fields = [
            f if f.name != "ts" else T.StructField(
                "ts",
                T.TimestampNTZType()
                if ts_type == "timestamp_ntz"
                else T.TimestampType(),
            )
            for f in _EVENTS_RAW_SCHEMA.fields
        ]
        raw = reader.schema(T.StructType(fields)).parquet(stream_path)
    return normalize_events_ts(raw, ts_type)


def _drain_to_memory(
    df: DataFrame,
    output_mode: str,
    state_partitions: int = 8,
    require_single_batch: bool = False,
) -> DataFrame:
    """Run the streaming plan to completion into a memory sink; return the
    result table. Bounded input + processAllAvailable => deterministic.

    Stateful streaming cost scales with the number of state-store instances
    — one per shuffle partition, each with its own maintenance thread,
    checkpoint files, and (for applyInPandasWithState) its own Python
    worker. The batch default (cores, 32 here) is far past the sweet spot
    for these bounded drains, so pin the query's state partitioning low:
    shuffle-partition count is captured into the streaming checkpoint at
    query start, so this only affects the stream, and the conf is restored
    for subsequent batch plans. On a real cluster you'd size this to
    expected state volume / executor count instead.

    ``require_single_batch``: the exact-oracle contract for watermark-
    bearing drains (stream-stream join, dropDuplicatesWithinWatermark)
    holds because the file source delivers the whole bounded input in ONE
    microbatch (no maxFilesPerTrigger), so the watermark never advances
    past unprocessed rows. Pass True to ASSERT that assumption — a future
    trigger/option change then fails loudly instead of silently turning
    the exact contract probabilistic.

    Lifecycle: each drain registers one ``stream_out_<uuid>`` memory-sink
    table that the RETURNED DataFrame reads from, so it cannot be dropped
    here; the retained rows are the query's (result-sized, bounded)
    output. A long-lived service draining repeatedly would write to a
    real sink and own the cleanup instead.
    """
    spark = df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
        try:
            q.processAllAvailable()
            if require_single_batch:
                fed = [p for p in q.recentProgress if p.numInputRows > 0]
                if len(fed) > 1:
                    raise AssertionError(
                        f"bounded drain spanned {len(fed)} microbatches; "
                        "the exact-oracle watermark contract assumes one"
                    )
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(name)


@register(
    "streaming_windowed_agg",
    oracle="""
    -- FLOORED division to the window start: DuckDB's // truncates toward
    -- zero, which would snap a pre-epoch (negative-us) event to window 0
    -- instead of its true 1969 window; Spark's window() floors.
    SELECT make_timestamp(
             (epoch_ns(ts) // 1000)
               - ((((epoch_ns(ts) // 1000) % 21600000000) + 21600000000) % 21600000000)
           ) AS window_start,
           event_type,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 4)  AS sum_value
    FROM events
    -- event-time contract: a NULL event time belongs to no window; the
    -- streaming engine drops such rows at window assignment
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Streaming tumbling-window aggregation (watermark + complete mode, "
    "drained over the bounded events table) — must equal the batch window "
    "query exactly: the batch/stream equivalence contract.",
)
def streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return _drain_to_memory(windowed_counts(ev), "complete")


@register(
    "streaming_session_counts",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             ts,
             event_id,
             epoch_ns(ts) // 1000 AS us,
             CASE WHEN (epoch_ns(ts) // 1000) - LAG(epoch_ns(ts) // 1000) OVER w
                        >= 1800 * 1000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      -- event-time contract: NULL-ts rows belong to no session window, and
      -- PRE-EPOCH rows fall to Spark's initial watermark(0) late filter
      -- (event time < 0 is "late" in the very first microbatch) — the same
      -- boundary documented on the streaming dedup drain
      WHERE ts IS NOT NULL AND epoch_ns(ts) >= 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, us,
             -- same (ts, event_id) tiebreak as the flagged window: with a
             -- bare ORDER BY ts, equal-ts rows could order differently in
             -- the two windows and a session-start flag could land inside
             -- the PREVIOUS session's cumulative range
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(us)  AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Streaming session windows (30-min gap): the stream twin of batch "
    "sessionization. Note streaming session semantics: an event at exactly "
    "last+gap starts a NEW session (half-open window), hence >= in the "
    "oracle vs > in the batch query.",
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return _drain_to_memory(session_counts(ev), "complete")


@register(
    "streaming_stateful_totals",
    oracle="""
    SELECT user_id,
           COUNT(*)             AS n_events,
           -- NaN totals emit as NULL: the Arrow pandas-worker boundary
           -- uses NaN as its null sentinel, so the Python-side stateful
           -- operator cannot represent a NaN result (documented in
           -- streaming/aggregations._accumulate); Inf round-trips fine
           CASE WHEN isnan(SUM(value)) THEN NULL
                ELSE ROUND(SUM(value), 4) END AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState): per-user running "
    "totals. Over bounded single-batch input the final state equals the "
    "batch aggregate — checked against plain SQL. Single-batch delivery is "
    "ASSERTED: the update-mode memory sink appends one row per key per "
    "trigger, so a multi-batch drain would duplicate keys (the complete-"
    "mode drains above replace the table each trigger and don't need the "
    "guard).",
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return _drain_to_memory(
        running_totals_stateful(ev), "update", require_single_batch=True
    )
