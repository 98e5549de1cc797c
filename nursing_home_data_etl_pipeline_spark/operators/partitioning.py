"""Partitioning levers (SURVEY.md §4.3): the knobs that matter at 100 TB,
exposed as intention-revealing helpers so pipelines state WHY they move
data, not just that they do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_count(df: DataFrame) -> int:
    return df.rdd.getNumPartitions()


def repartition_for_join(df: DataFrame, keys: Sequence[str], n: int | None = None) -> DataFrame:
    """Hash-partition on the join/agg keys ahead of several operations that
    reuse the same keys — pay one shuffle, reuse the partitioning (Catalyst
    recognizes the child distribution and skips re-shuffling)."""
    return df.repartition(n, *[F.col(k) for k in keys]) if n else df.repartition(
        *[F.col(k) for k in keys]
    )


def repartition_by_range(df: DataFrame, cols: Sequence[str], n: int) -> DataFrame:
    """Range partitioning — for globally sorted output files or
    partition-pruned range predicates downstream."""
    return df.repartitionByRange(n, *[F.col(c) for c in cols])


def coalesce_output(df: DataFrame, n: int) -> DataFrame:
    """Shrink partition count without a shuffle — the 'don't write 10k tiny
    files' knob right before a sink. (AQE coalescing already handles the
    post-shuffle case; this is for narrow pipelines.)"""
    return df.coalesce(n)


def with_salt(df: DataFrame, buckets: int, name: str = "_salt", seed: int = 42) -> DataFrame:
    """Add a uniform salt column: prepend to a hot key to spread one
    pathological group across ``buckets`` reducers. Pair with a second-stage
    merge (see aggregates.salted_group_agg) or replicate the other join side
    per salt value."""
    return df.withColumn(name, (F.rand(seed=seed) * buckets).cast("int"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, REPLICATE the other
    side once per salt value, join on (keys + salt). A hot key that would
    pin one reducer spreads across ``buckets`` of them, at the cost of
    ``buckets``x duplication of the other side's matching rows in the
    shuffle — use when the other side is small-ish but above the broadcast
    threshold (below it, broadcast join already solves skew; above both,
    AQE skew-join splitting is the first resort, this the explicit
    second). Design notes: docs/DESIGN.md#partitioning-salted-join"""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports skewed-side-preserving joins only "
            f"(inner/left/semi/anti); got how={how!r} — the replicated side "
            f"would duplicate unmatched rows once per salt bucket"
        )
    clash = {"_salt"} & (set(skewed.columns) | set(other.columns))
    if clash:
        # same contract as salted_group_agg: a pre-existing _salt column
        # would be silently overwritten, joined on, and dropped
        raise ValueError(f"input columns collide with salting internals: {clash}")
    keys = list(on)
    salted = with_salt(skewed, buckets, "_salt", seed)
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted.join(replicated, on=keys + ["_salt"], how=how).drop("_salt")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: int = 8,
    name: str = "_zorder",
) -> DataFrame:
    """Append a Morton (Z-order) clustering key interleaving up to 4 numeric
    columns, each quantile-bucketed into ``2**bits_per_col`` ranks. Design
    notes: docs/DESIGN.md#partitioning-zorder-key"""
    cols = list(cols)
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder interleaves 1-4 columns")
    n_buckets = 1 << bits_per_col
    zval = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cuts = df.approxQuantile(
            c, [j / n_buckets for j in range(1, n_buckets)], 1.0 / (4 * n_buckets)
        )
        # strictly increasing unique cuts; duplicates appear on low-cardinality
        # columns where several quantiles share a value
        uniq = sorted(set(cuts))
        arr = F.array(*[F.lit(float(x)) for x in uniq])
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, x: acc
            + F.when(F.col(c).cast("double") >= x, F.lit(1)).otherwise(F.lit(0)),
        )
        bucket = F.coalesce(bucket, F.lit(0))
        for b in range(bits_per_col):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            zval = zval + (
                F.shiftleft(bit.cast("long"), b * len(cols) + i)
            )
    return df.withColumn(name, zval)
