"""Window operators (SURVEY.md §2.5 / §2.8 — absent from the reference).

Every helper takes an explicit deterministic ordering (callers must include a
unique tiebreaker column) so results are stable across partitionings — the
lesson of reference bug B5.

Scale notes: all windows here are PARTITIONED (per-key) — state stays
bounded per group and Spark distributes groups across executors. Global
(unpartitioned) windows funnel everything through one task; the only one we
expose is inside :func:`top_k_global` via orderBy+limit, which Spark executes
as a distributed TakeOrdered (per-partition top-k + merge), not a full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fresh(df: DataFrame, name: str, helper: str) -> str:
    """Collision guard: withColumn REPLACES an existing column, so a
    business column named e.g. 'rank' silently vanished under the window
    output (round-9 review; sketch helpers raise on the same clash)."""
    if name in df.columns:
        raise ValueError(
            f"{helper}: output column {name!r} already exists in the input "
            f"— pass a different name or rename the input column"
        )
    return name


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic given a total
    ordering). Catalyst rewrites rank<=k into a per-partition limit before
    the shuffle when possible (WindowGroupLimit), keeping it scale-safe.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(_fresh(df, rank_name, "top_k_per_group"), F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def top_k_global(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps merged on the driver, no global sort."""
    return df.orderBy(*order_by).limit(k)


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    agg_col: str,
    agg: str = "sum",
    out_name: str = "running",
) -> DataFrame:
    """Cumulative aggregate over unbounded-preceding..current — RANGE frame
    (peers of the current row by ``order_by`` are INCLUDED), the SQL
    default when ORDER BY is present. The frame choice is load-bearing for
    determinism: with a ROWS frame, rows TIED on the full ordering would
    take order-dependent running values (hit in practice — sf0.1 lineitem
    reuses (orderkey, linenumber), and one (suppkey, shipdate, orderkey,
    linenumber) collision flipped the cumulative sum between engines);
    with RANGE, every tie group shares the sum through its last member,
    deterministic for ANY data without needing ``order_by`` to be a
    provable total order. Design notes: docs/DESIGN.md#windows-running-agg"""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(_fresh(df, out_name, "running_agg"), getattr(F, agg)(agg_col).over(w))


def with_lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    out_name: str = "delta",
) -> DataFrame:
    """value - lag(value) per group; first row of each group yields null."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(_fresh(df, out_name, "with_lag_delta"),
                         F.col(value_col) - F.lag(value_col, 1).over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
    session_name: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``. session_id = cumulative count
    of session starts per user (1-based). Streaming variant:
    ``session_window`` (see streaming module). Design notes:
    docs/DESIGN.md#windows-sessionize"""
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(user_col).orderBy(*order)
    # Exact integer microsecond arithmetic — no float drift at the gap
    # threshold regardless of timestamp magnitude.
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us, 1).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(_fresh(df, session_name, "sessionize"),
                         F.sum(is_start).over(cum).cast("long"))
