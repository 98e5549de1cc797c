"""Range (interval) join — points-in-interval without the nested loop
Spark would plan for a raw theta join. The standard bucketization
rewrite: point -> bucket floor(x/width), interval -> every bucket it
overlaps, equi-join on (keys..., bucket) with the exact range predicate
folded in as a refine filter. One point = ONE bucket, so no post-join
dedup and left-outer falls out of the join. Same rewrite as Databricks'
RANGE_JOIN hint / Flink's interval join; open-source Spark has no native
operator (SURVEY §2.8). Cost model: docs/DESIGN.md#ranges-module."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_points"]


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: str | Sequence[str] | None = None,
    bucket_width: int = 3_600_000_000,
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row whose half-open range ``[lo,
    hi)`` contains the point (and whose ``on`` keys match, if given).
    Design notes: docs/DESIGN.md#ranges-range-join-points"""
    if how not in {"inner", "left"}:
        raise ValueError(
            f"range_join_points supports how='inner'|'left', got {how!r}: "
            "the interval side is replicated per bucket, so right/full-outer "
            "would emit unmatched intervals once per overlapped bucket"
        )
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    clash = {"_rj_bucket"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"input columns collide with range-join internals: {clash}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    shared = (set(points.columns) & set(intervals.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(shared)}: "
            "both would appear in the output under the same name "
            "(AMBIGUOUS_REFERENCE downstream) — rename one side first"
        )

    def _bucket(c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(float(bucket_width))).cast("long")

    # Alias both sides: points and intervals often derive from the same
    # source table (a self-join), and plan-id disambiguation via df[col]
    # fails on shared lineage.
    p = points.withColumn("_rj_bucket", _bucket(F.col(point_col))).alias("_rj_p")
    # Explode each interval to its overlapped buckets; the span + fan-out
    # guard fails fast on open-ended/±inf/inverted/NaN bounds —
    # docs/DESIGN.md#ranges-guard.
    lo_b, hi_b = _bucket(F.col(lo_col)), _bucket(F.col(hi_col))
    span = hi_b.cast("double") - lo_b.cast("double")
    empty = F.array().cast("array<long>")
    guarded = (
        F.when(
            F.isnan(F.col(lo_col).cast("double"))
            | F.isnan(F.col(hi_col).cast("double")),
            empty,
        )
        .when(span < 0, empty)
        .when(
            span + 1 > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join_points: interval explodes to more than "
                        f"{max_buckets_per_interval} buckets of width "
                        f"{bucket_width} ([lo, hi) = ["
                    ),
                    F.col(lo_col).cast("string"),
                    F.lit(", "),
                    F.col(hi_col).cast("string"),
                    F.lit(
                        ")) — widen bucket_width, cap open-ended intervals, "
                        "or raise max_buckets_per_interval"
                    ),
                )
            ).cast("array<long>"),
        )
        .otherwise(F.sequence(lo_b, hi_b))
    )
    i = intervals.withColumn("_rj_bucket", F.explode(guarded)).alias("_rj_i")
    cond = F.col("_rj_p._rj_bucket") == F.col("_rj_i._rj_bucket")
    for k in keys:
        cond = cond & (F.col(f"_rj_p.{k}") == F.col(f"_rj_i.{k}"))
    cond = (
        cond
        & (F.col(f"_rj_p.{point_col}") >= F.col(f"_rj_i.{lo_col}"))
        & (F.col(f"_rj_p.{point_col}") < F.col(f"_rj_i.{hi_col}"))
    )
    joined = p.join(i, cond, how)
    out_cols = [F.col(f"_rj_p.{c}").alias(c) for c in points.columns] + [
        F.col(f"_rj_i.{c}").alias(c)
        for c in intervals.columns
        if c not in keys
    ]
    return joined.select(*out_cols)
