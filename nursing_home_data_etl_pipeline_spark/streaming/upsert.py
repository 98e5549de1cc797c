"""Streaming upsert sink: maintain an SCD1 dimension from a stream.

``foreachBatch`` hands each micro-batch to ordinary batch code — here the
same :func:`operators.joins.merge_scd1` the batch pipeline uses — giving a
continuously-maintained warehouse dim with the stream source's exactly-once
file ledger. Batch and streaming therefore share ONE merge implementation
(no drift between the two paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.joins import latest_per_key, merge_scd1
from ..sources.readers import path_exists, read_parquet
from ..sources.writers import replace_dir


def start_upsert_sink(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Merge every micro-batch into the Parquet dim at ``target_path``.

    ``order_col`` resolves multi-row-per-key batches (latest wins) before
    the merge — a micro-batch can easily contain several updates to one key.
    The double-buffered overwrite matches pipeline.merge_warehouse.
    """
    spark = stream.sparkSession

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        source = (
            latest_per_key(batch, keys, order_col) if order_col else batch
        )
        # Bootstrap ONLY when the target verifiably does not exist: inside
        # foreachBatch a broad except would treat any transient merge error
        # on a later micro-batch as "first batch" and silently wipe the
        # maintained dim down to that batch's rows (ADVICE round 1). By
        # re-raising instead, the streaming query fails and the checkpoint
        # replays the batch safely.
        if path_exists(spark, target_path):
            target = read_parquet(spark, target_path)
            if order_col:
                # Version-aware merge: out-of-order batches cannot regress a
                # key — max(order_col) wins across target AND source, not
                # arrival order. Without order_col, SCD1 arrival-order wins.
                result = latest_per_key(
                    target.unionByName(source.select(*target.columns)),
                    keys,
                    order_col,
                )
            else:
                result = merge_scd1(target, source.select(*target.columns), keys)
        else:
            result = source  # first batch bootstraps the dim
        replace_dir(result, target_path)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_agg(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    value_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally maintain per-key aggregates (count/sum/min/max — the
    distributive set; avg derives as sum/count) in a Parquet table, merging
    each micro-batch's PARTIAL aggregate into the stored state.

    The 100 TB property: history is never re-scanned. Each batch reduces to
    #distinct-keys rows map-side, then merges with the (aggregate-sized)
    target by the same algebra Spark uses for partial aggregation — counts
    and sums add, min/max fold. Contrast with withWatermark+window state
    (bounded by watermark, results only on emit): this keeps an unbounded
    all-time aggregate queryable between batches, exactly-once via the
    checkpoint + batch replay.
    """
    spark = stream.sparkSession
    from pyspark.sql import functions as F

    def agg_exprs(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(value_col).alias("cnt"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        partial = agg_exprs(batch)
        # Same bootstrap-only-when-absent rule as start_upsert_sink: merge
        # errors must fail the query so the checkpoint replays the batch.
        if path_exists(spark, target_path):
            target = read_parquet(spark, target_path)
            merged = (
                target.unionByName(partial)
                .groupBy(*keys)
                .agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("total").alias("total"),
                    F.min("vmin").alias("vmin"),
                    F.max("vmax").alias("vmax"),
                )
            )
        else:
            merged = partial
        replace_dir(merged, target_path)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
