"""Synthetic identifier / ETL-metadata operators (SURVEY.md §2.5 W1, §2.6 F2).

The reference stamps every output row with ``row_id`` from
``monotonically_increasing_id()`` and ``etl_date`` from ``current_date()``
(``nh-etl-universal-cleaning.py:84-85``; ``nh-etl-quality-transform.py:50-51``;
``nh-etl-provider-transform.py:121-122``).

Reference bug B5: ``monotonically_increasing_id`` encodes
``partition_id << 33 | row_in_partition`` — not dense, not stable across
partitioning or reruns, unusable as a durable key. The engine keeps it as the
*fast* id (zero-shuffle, fine for lineage tags) and adds a *dense* id variant
that is deterministic given an ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_fast_id(df: DataFrame, name: str = "row_id") -> DataFrame:
    """W1 (reference-parity): opaque, non-dense, partition-dependent id.
    Free (no shuffle); do NOT use as a durable business key (bug B5)."""
    return df.withColumn(name, F.monotonically_increasing_id().cast("long"))


def with_dense_id(
    df: DataFrame, order_by: Sequence[str], name: str = "row_id"
) -> DataFrame:
    """Stable, dense 1..N id given a total ordering — FLAT variant.

    Costs a global sort through a single ordered window (one task holds
    every row). Correct and cheapest for dimension-sized frames (the
    reference's actual use: ~15k facilities); for fact-table-sized frames
    use :func:`with_dense_id_sharded`, which computes the identical ids
    without any corpus-sized single-partition stage.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(name, F.row_number().over(w).cast("long"))


def with_dense_id_sharded(
    df: DataFrame,
    order_by: Sequence[str],
    name: str = "row_id",
    n_shards: int | None = None,
) -> DataFrame:
    """Stable, dense 1..N id given a total ordering — DISTRIBUTED variant.

    Same ids as :func:`with_dense_id` (1..N following ``order_by``; pass a
    unique key list — ties make row_number nondeterministic in either
    variant), but no stage ever holds the whole frame. Two-level scan,
    the same pattern as ``operators.packing.pack_sequences``:

    1. ONE bounded job collects an equi-depth boundary sample of the key
       space (exact hash-ordered top-N — deterministic for a given input,
       unlike reservoir sampling) and embeds the cut points as LITERALS;
       every row's shard id ``_pid`` is then a pure row-local function of
       its key — the count of boundaries <= key — so it is monotone in key
       order and IDENTICAL in every physical instantiation of the subtree.
       (An earlier ``repartitionByRange`` + ``spark_partition_id``
       formulation was only correct while Catalyst reused the range
       exchange between the window side and the counts side: with
       ``spark.sql.exchange.reuse=false`` the two materializations sampled
       different boundaries and ids duplicated. Literal boundaries cannot
       diverge.)
    2. per-shard ``row_number`` (window partitioned by ``_pid`` — one
       corpus shuffle, parallel),
    3. one count per shard (``n_shards`` rows), exclusive cumsum of THOSE
       on a single partition, broadcast the offsets back.

    Rows whose key contains a NULL land in shard 0 (struct comparison with
    a null component is null) — consistent with the flat variant's
    nulls-first sort order. ``n_shards`` is capped at 1024 because the cut
    points live in the plan as literals; at 100 TB that still bounds the
    offset table and each shard holds ~corpus/1024.
    """
    spark = df.sparkSession
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_shards = max(1, min(n_shards, 1024))
    cols = [F.col(c) for c in order_by]
    internals = {"_pid", "_intra", "_n", "_off", "_k"}
    clash = internals & set(df.columns)
    if clash:
        raise ValueError(f"df columns collide with dense-id internals: {clash}")

    oversample = 32
    sample = (
        df.select(F.struct(*cols).alias("_k"))
        .orderBy(F.xxhash64(*cols))
        .limit(n_shards * oversample)
        .collect()
    )
    vals = sorted(
        tuple(r["_k"]) for r in sample if None not in tuple(r["_k"])
    )
    step = max(1, len(vals) // n_shards) if vals else 1
    cuts = vals[step::step][: n_shards - 1]

    key = F.struct(*[F.col(c).alias(c) for c in order_by])
    pid = F.lit(0)
    for cut in cuts:
        blit = F.struct(*[F.lit(v).alias(c) for v, c in zip(cut, order_by)])
        pid = pid + F.when(key >= blit, 1).otherwise(0)

    sharded = df.withColumn("_pid", pid)
    w = Window.partitionBy("_pid").orderBy(*cols)
    intra = sharded.withColumn("_intra", F.row_number().over(w))
    counts = intra.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        intra.join(F.broadcast(offsets), "_pid")
        .withColumn(name, (F.col("_off") + F.col("_intra")).cast("long"))
        .drop("_pid", "_intra", "_off")
    )


def with_etl_date(df: DataFrame, name: str = "etl_date") -> DataFrame:
    """F2: batch-date stamp (current_date, DateType)."""
    return df.withColumn(name, F.current_date().cast("date"))


#: Above this estimated plan size, with_etl_metadata's dense id switches to
#: the sharded two-level scan (roughly one task's comfortable sort input).
DENSE_ID_SHARD_THRESHOLD_BYTES = 64 * 1024 * 1024


def _estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimizer size estimate for the frame — file-size based
    for scans, propagated through projections/filters. NO job runs; when
    Spark can't estimate it returns defaultSizeInBytes (huge), which here
    safely selects the sharded path."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def with_etl_metadata(
    df: DataFrame,
    order_by: Sequence[str] | None = None,
    id_name: str = "row_id",
    date_name: str = "etl_date",
    shard_threshold_bytes: int = DENSE_ID_SHARD_THRESHOLD_BYTES,
) -> DataFrame:
    """row_id + etl_date, the reference's universal output stamp.
    ``order_by=None`` -> fast (unstable) ids, else dense deterministic ids.

    Dense ids pick their physical strategy by size: below
    ``shard_threshold_bytes`` of ESTIMATED plan output (Catalyst stats —
    zero extra jobs; an exact count would re-execute the upstream plan
    once per stamp), the flat single-window sort (cheapest for dimension
    frames); above it, :func:`with_dense_id_sharded`, so a fact-table
    stamp never funnels the corpus through one task. Unknown sizes
    estimate huge and take the sharded path. Both strategies emit
    identical ids, so the switch can't change results.
    ``shard_threshold_bytes=0`` forces the sharded path."""
    if order_by:
        if (
            shard_threshold_bytes > 0
            and _estimated_size_bytes(df) <= shard_threshold_bytes
        ):
            df = with_dense_id(df, order_by, id_name)
        else:
            df = with_dense_id_sharded(df, order_by, id_name)
    else:
        df = with_fast_id(df, id_name)
    return with_etl_date(df, date_name)
