"""Count-Min Sketch over a DataFrame column — distributed heavy-hitter
frequency estimation with sublinear state.

At 100 TB an exact token-frequency table is itself huge (vocabulary grows
with corpus size); a CMS bounds the state at d x w counters while
guaranteeing ``estimate >= true count`` (overestimate-only) with error
``<= eN / w`` at confidence ``1 - (1/2)^d``. The sketch here is a tiny
(d*w)-row DataFrame, built with ONE hash aggregate over the exploded
items — no UDF, no driver-side counting — and two sketches merge by
summing counters (the standard CMS property), so per-partition /
per-day sketches roll up without touching raw data again.

Hashing: md5-derived (row-seeded) bucket index via the JVM conv()
intrinsic — portable, deterministic, no murmur3 (Spark ``hash()``) so any
external system can reproduce bucket assignment from the spec alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "cms_merge"]


def _bucket(item: Column, row: int, width: int) -> Column:
    """Bucket of ``item`` under hash row ``row``: first 12 hex chars of
    md5(row|item) as an integer, mod width. 48 bits of hash >> any sane
    width, so the mod bias is negligible."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}|"), item)), 1, 12), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a CMS over ``df[item_col]`` (one occurrence per input row;
    pre-weight by exploding or repeating upstream if needed).

    Output: (row int, bucket int, cnt long) — at most depth*width rows.
    Plan: one Expand (depth copies) + one hash aggregate; the partial
    aggregate collapses each executor's counts before the single shuffle.
    """
    item = F.col(item_col).cast("string")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"), _bucket(item, r, width).alias("bucket")
                )
                for r in range(depth)
            ]
        )
    ).alias("rb")
    return (
        df.select(rows)
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counters add."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each DISTINCT row of ``items`` (rows are
    grouped by all items columns — duplicate probe rows collapse to one
    output row): the estimate is the MIN over the d hash rows of the
    addressed counter (absent counter = 0). The sketch side is depth*width
    rows — always broadcast; the items side streams, so estimating a
    10^9-row candidate list is a map-side join + small aggregate, never a
    shuffle of the corpus.

    Output: items columns + ``est`` (long, >= true count).
    """
    clash = {"row", "bucket", "cnt", "rb", "est"} & set(items.columns)
    if clash:
        raise ValueError(f"items columns collide with CMS internals: {clash}")
    item = F.col(item_col).cast("string")
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(item, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["row", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return (
        joined.groupBy(*items.columns)
        .agg(F.min("cnt").alias("est"))
    )
