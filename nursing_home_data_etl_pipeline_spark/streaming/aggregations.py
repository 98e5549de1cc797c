"""Streaming event-time aggregation: watermarked tumbling windows, session
windows, and a custom stateful operator via applyInPandasWithState.

Late data policy (the capability the reference handles only operationally,
SURVEY.md §2.7): a watermark bounds how late events may arrive; windows
older than the watermark finalize and their state is dropped — bounded
state at unbounded input, the streaming analog of "design for 100 TB".
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def windowed_counts(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count+sum with a watermark. In append mode only
    finalized (watermark-passed) windows emit; in complete mode all windows
    are maintained — used by the batch-equivalence check."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session-window aggregation: sessions close after ``gap`` inactivity.
    The streaming twin of the batch lag+cumsum sessionization (operators/
    windows.sessionize) — same (user, session) event counts, with session
    identity carried by the window start instead of a per-user ordinal."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_totals_stateful(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    event count + value total, emitted each trigger. The canonical shape
    for operators Spark's windowing can't express (per-key accumulators,
    custom eviction): Arrow-batched state updates, bounded per-key state."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _update_running_totals_ttl(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        # idle key: emit nothing, drop the accumulator — state stays bounded
        # by ACTIVE keys, not ever-seen keys.
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(_TTL_MS)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


_TTL_MS = 6 * 3600 * 1000


def running_totals_stateful_ttl(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """:func:`running_totals_stateful` with state EVICTION: keys idle for
    the TTL are dropped on the next trigger (ProcessingTimeTimeout). On an
    unbounded stream the NoTimeout variant's state grows with ever-seen key
    cardinality — this is the knob that keeps per-executor state bounded by
    the active working set, the same role the watermark plays for windowed
    aggregation state."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_running_totals_ttl,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
