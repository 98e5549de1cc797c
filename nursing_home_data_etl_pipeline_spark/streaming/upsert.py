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
