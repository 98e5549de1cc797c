"""Synthetic identifier / ETL-metadata operators (SURVEY.md §2.5 W1,
§2.6 F2): the reference stamps row_id via monotonically_increasing_id()
and etl_date via current_date() (nh-etl-universal-cleaning.py:84-85;
nh-etl-quality-transform.py:50-51; nh-etl-provider-transform.py:121-122).
Bug B5: that id is neither dense nor rerun-stable — kept only as the
FAST id; the dense variant is deterministic given an ordering."""

from __future__ import annotations

from collections import Counter
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_fast_id(df: DataFrame, name: str = "row_id") -> DataFrame:
    """W1 (reference-parity): opaque, non-dense, partition-dependent id.
    Free (no shuffle); do NOT use as a durable business key (bug B5)."""
    return df.withColumn(name, F.monotonically_increasing_id().cast("long"))


def _tiebreak(df: DataFrame, order_by: Sequence[str]) -> list[Column]:
    """Deterministic tie contract for dense ids: row_number over a tied
    ordering is rerun-nondeterministic, so the remaining columns'
    ``joins.ordering_struct`` is appended to the sort — the output
    multiset is then deterministic whenever tied rows differ anywhere the
    struct can see (fully-orderable-identical rows are interchangeable).
    Free when keys are unique. Design notes: docs/DESIGN.md#ids--tiebreak"""
    from .joins import ordering_struct

    rest = [c for c in df.columns if c not in order_by]
    if not rest:
        return []
    return [ordering_struct(df, rest)]


def with_dense_id(
    df: DataFrame,
    order_by: Sequence[str],
    name: str = "row_id",
    tiebreak: bool = True,
) -> DataFrame:
    """Stable, dense 1..N id given a total ordering — FLAT variant. Design
    notes: docs/DESIGN.md#ids-with-dense-id"""
    cols = [F.col(c) for c in order_by]
    tb = _tiebreak(df, order_by) if tiebreak else []
    w = Window.orderBy(*cols, *tb)
    return df.withColumn(name, F.row_number().over(w).cast("long"))


def _shard_case_tree(
    key: Column, cuts: list[tuple], order_by: Sequence[str]
) -> tuple[Column, int]:
    """Log-depth binary-search CASE tree computing ``#cuts <= key`` (the
    shard id). A flat ``sum(when(key >= cut, 1))`` chain is O(n_shards)
    struct comparisons PER ROW and nests the plan n_shards deep — at the
    1024-shard cap that risks codegen's interpreted fallback exactly where
    the operator must shine. The binary tree evaluates ceil(log2(n+1))
    comparisons per row with matching expression depth; the cut literals
    still appear once each (O(n) plan size, unavoidable — they ARE the
    routing table). Design notes: docs/DESIGN.md#ids--shard-case-tree"""

    def lit_struct(cut: tuple) -> Column:
        return F.struct(*[F.lit(v).alias(c) for v, c in zip(cut, order_by)])

    def build(lo: int, hi: int) -> tuple[Column, int]:
        # shard index for keys whose answer lies in [lo, hi]
        if lo == hi:
            return F.lit(lo), 0
        mid = (lo + hi) // 2
        left, dl = build(lo, mid)
        right, dr = build(mid + 1, hi)
        return F.when(key >= lit_struct(cuts[mid]), right).otherwise(left), (
            1 + max(dl, dr)
        )

    return build(0, len(cuts))


def order_key_segments(
    df: DataFrame, order_by: Sequence[str], n_segments: int,
    hot_share_of: Sequence[str] | None = None,
) -> Column | tuple[Column, float]:
    """Deterministic, ORDER-CONSISTENT segment id (0..n_segments-1) for the
    ``order_by`` key struct: exact cuts from a bounded hash-ordered sample
    (stable across plan re-evaluations — spark_partition_id over
    repartitionByRange is NOT; see queries_windows' ntile note), applied
    as a pure column function via the log-depth case tree. Rows tied on
    the full key share a segment; NULL-bearing keys route consistently
    with NULLS FIRST (a NULL comparison falls to the left branch, exactly
    where NULLS FIRST sorts the key). Shared by the sharded dense-id scan
    and the segmented window rewrites (round-13 #1).

    With ``hot_share_of`` (round-14 #3) the SAME sample job also returns
    the observed top-key share of those columns — rows are hash-ordered
    by the near-unique order key, so the sample is ~uniform over rows —
    at a larger floor (64k rows, a bounded driver-side collect) so shares
    down to ~1e-4 resolve; callers gate segmentation on share x size."""
    cols = [F.col(c) for c in order_by]
    n = n_segments * 32 if hot_share_of is None else max(n_segments * 32, 65536)
    # 8-byte key HASH, not the struct: a wide partition_by would multiply
    # the bounded driver collect (ADVICE r14); a collision only merges
    # two keys, overstating the share — conservative toward segmenting
    extra = ([F.xxhash64(*[F.col(c) for c in hot_share_of]).alias("_p")]
             if hot_share_of else [])
    sample = (
        df.select(F.struct(*cols).alias("_k"), *extra)
        .orderBy(F.xxhash64(*cols))
        .limit(n)
        .collect()
    )
    vals = sorted(
        tuple(r["_k"]) for r in sample if None not in tuple(r["_k"])
    )
    step = max(1, len(vals) // n_segments) if vals else 1
    cuts = vals[step::step][: n_segments - 1]
    key = F.struct(*[F.col(c).alias(c) for c in order_by])
    col = _shard_case_tree(key, cuts, order_by)[0]
    if hot_share_of is None:
        return col
    counts = Counter(r["_p"] for r in sample)
    share = max(counts.values()) / len(sample) if sample else 0.0
    return col, share


def with_dense_id_sharded(
    df: DataFrame,
    order_by: Sequence[str],
    name: str = "row_id",
    n_shards: int | None = None,
    tiebreak: bool = True,
) -> DataFrame:
    """Stable, dense 1..N id given a total ordering — DISTRIBUTED variant.
    Design notes: docs/DESIGN.md#ids-with-dense-id-sharded"""
    spark = df.sparkSession
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_shards = max(1, min(n_shards, 1024))
    cols = [F.col(c) for c in order_by]
    internals = {"_pid", "_intra", "_n", "_off", "_k"}
    clash = internals & set(df.columns)
    if clash:
        raise ValueError(f"df columns collide with dense-id internals: {clash}")

    sharded = df.withColumn("_pid", order_key_segments(df, order_by, n_shards))
    tb = _tiebreak(df, order_by) if tiebreak else []
    w = Window.partitionBy("_pid").orderBy(*cols, *tb)
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
    ``order_by=None`` -> fast (unstable) ids, else dense deterministic
    ids. Design notes: docs/DESIGN.md#ids-with-etl-metadata"""
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
