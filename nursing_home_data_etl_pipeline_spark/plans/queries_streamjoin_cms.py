"""Driver-visible queries for the stream-stream interval join and Count-Min
heavy hitters (previously pytest-only surface).

Both oracles are EXACT despite the approximate machinery involved:

- a watermarked stream-stream inner join over bounded input, drained to
  completion, emits exactly the batch interval join's rows (watermarks only
  bound buffered state, they drop nothing when the input is fully replayed);
- a CMS estimate never under-counts, so "CMS-candidates then exact refine"
  returns exactly the true heavy-hitter set (the sketch merely prunes the
  long tail before the exact count — the 100 TB point of the pattern).

Registered at the catalog tail (see queries_packing docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import cms_build, cms_estimate
from ..sources.readers import read_table
from .catalog import register
from .queries_streaming import _drain_to_memory, stream_events

#: Attribution window: purchases within 1 hour after a click.
_WINDOW = "INTERVAL 1 HOUR"

#: Heavy-hitter threshold on events.user_id occurrence counts.
_HH_MIN = 80
_CMS_DEPTH, _CMS_WIDTH = 4, 1024


@register(
    "streaming_interval_join",
    oracle=f"""
    SELECT c.event_id,
           c.user_id,
           p.value AS purchase_value,
           epoch_ns(p.ts) // 1000 AS purchase_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + {_WINDOW}
    """,
    doc="Watermarked stream-stream interval join (click -> purchases within "
    "1 hour, same user): both sides buffer bounded state keyed by the "
    "watermark + time-range condition. Drained over the bounded events "
    "table it must equal the batch interval join — the stream-stream twin "
    "of the batch/stream equivalence contract.",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts < c_ts + {_WINDOW}"
        ),
    ).select(
        "event_id",
        F.col("c_user").alias("user_id"),
        F.col("value").alias("purchase_value"),
        F.unix_micros(F.col("p_ts")).alias("purchase_us"),
    )
    return _drain_to_memory(joined, "append")


@register(
    "cms_heavy_hitters",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(*) >= {_HH_MIN}
    """,
    doc="Heavy hitters via Count-Min sketch + exact refine: the sketch "
    "(depth*width counters, one pass, map-side combine) over-counts but "
    "never under-counts, so keys whose estimate clears the threshold are a "
    "SUPERSET of the true heavy hitters; exactly counting only those "
    "candidates yields the exact answer. At 100 TB the exact count runs "
    "over a semi-joined sliver of the corpus instead of every key.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL keys are excluded on BOTH sides: the semi-join refine would drop
    # the NULL group that SQL GROUP BY keeps, so align semantics explicitly.
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    cms = cms_build(ev, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    keys = ev.select("user_id").distinct()
    candidates = cms_estimate(
        cms, keys, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH
    ).filter(F.col("est") >= _HH_MIN)
    exact = (
        ev.join(F.broadcast(candidates.select("user_id")), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return exact.filter(F.col("n_events") >= _HH_MIN)
