"""Driver-visible query for the watermark-bearing streaming operators:
stream-stream interval join + bounded-state streaming dedup, drained and
unioned as one tagged row set (round-6 catalog consolidation of
streaming_interval_join + streaming_dedup; Count-Min heavy hitters moved
into queries_analytics.approx_stats_events as variant='cms_hh').

The oracle is EXACT despite the watermarks: over bounded input delivered in
a SINGLE microbatch (no maxFilesPerTrigger on the file source) the
watermark never advances past unprocessed rows, so the drained
stream-stream join emits exactly the batch interval join's rows and the
watermarked dedup keeps exactly one row per key. That single-batch
assumption is ASSERTED per drain (``require_single_batch=True``) — a
future trigger/option change fails loudly instead of silently turning the
exact contract probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register
from .queries_streaming import _drain_to_memory, stream_events

#: Attribution window: purchases within 1 hour after a click.
_WINDOW = "INTERVAL 1 HOUR"


@register(
    "streaming_join_dedup",
    oracle=f"""
    SELECT 'interval_join' AS variant,
           c.event_id,
           c.user_id,
           p.value AS num,
           CAST(epoch_ns(p.ts) // 1000 AS VARCHAR) AS tag
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + {_WINDOW}
    UNION ALL
    SELECT 'dedup', event_id, user_id, CAST(NULL AS DOUBLE), event_type
    FROM events
    -- event-time contract: a NULL watermark column drops the row before
    -- the stateful dedup (same as every watermark-bearing op). Rows AT or
    -- before the epoch are also dropped: Spark initializes the watermark
    -- to 0, and the late-row filter discards event times <= watermark even
    -- in the first microbatch — a documented boundary of the exact-oracle
    -- contract, not a data-dependent behavior.
    WHERE epoch_ns(ts) > 0
    """,
    doc="Watermark-bearing streaming operators, one tagged row set per "
    "drain. variant='interval_join' (num = purchase value, tag = purchase "
    "ts in micros): stream-stream interval join — clicks joined to same-"
    "user purchases within 1 hour; both sides buffer bounded state keyed "
    "by the watermark + time-range condition; drained over the bounded "
    "events table it must equal the batch interval join (the stream-stream "
    "twin of the batch/stream equivalence contract). variant='dedup' "
    "(tag = event_type): exact dedup with BOUNDED state — two identical "
    "event streams unioned (every event arrives twice), deduped on "
    "event_id via dropDuplicatesWithinWatermark; per-key state is dropped "
    "once the watermark passes, so state scales with the in-flight window "
    "instead of all history (the difference between a dedup that survives "
    "a year of stream and one that OOMs). Bounded drain => exactly the "
    "distinct event rows.",
)
def streaming_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_cols = ["variant", "event_id", "user_id", "num", "tag"]

    ev = stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(f"c_user = p_user AND p_ts >= c_ts AND p_ts < c_ts + {_WINDOW}"),
    ).select(
        F.lit("interval_join").alias("variant"),
        "event_id",
        F.col("c_user").alias("user_id"),
        F.col("value").alias("num"),
        F.unix_micros(F.col("p_ts")).cast("string").alias("tag"),
    )
    interval = _drain_to_memory(joined, "append", require_single_batch=True)

    cols = ["event_id", "user_id", "event_type", "ts"]
    # SELF-union of one stream DataFrame: each union leg re-reads the file
    # source, so every event still arrives twice — identical semantics to
    # two separately constructed streams. The DEFINITION `ev` is reused
    # from the joined drain above (a streaming DataFrame is a plan, not a
    # running query), avoiding a second stream_events call and its eager
    # driver-side footer probe.
    a = ev.select(cols)
    deduped = (
        # Event-time contract, made EXPLICIT here because
        # dropDuplicatesWithinWatermark (unlike window/session assignment)
        # would otherwise pass NULL-ts rows through its late-row filter
        # (NULL < watermark is NULL, not true): watermark-bearing ops take
        # non-NULL event time.
        a.unionByName(a)
        .filter(F.col("ts").isNotNull())
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            F.lit("dedup").alias("variant"),
            "event_id",
            "user_id",
            F.lit(None).cast("double").alias("num"),
            F.col("event_type").alias("tag"),
        )
    )
    dedup = _drain_to_memory(deduped, "append", require_single_batch=True)

    return interval.select(*out_cols).unionByName(dedup.select(*out_cols))
