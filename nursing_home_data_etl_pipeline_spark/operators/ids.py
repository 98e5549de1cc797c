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
    """Stable, dense 1..N id given a total ordering.

    Costs a global sort (single ordered window). At 100 TB prefer
    :func:`with_fast_id` or a key derived from the data; dense ids over an
    unpartitioned window funnel through one task and exist here for
    dimension-sized frames (the reference's actual use: ~15k facilities).
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(name, F.row_number().over(w).cast("long"))


def with_etl_date(df: DataFrame, name: str = "etl_date") -> DataFrame:
    """F2: batch-date stamp (current_date, DateType)."""
    return df.withColumn(name, F.current_date().cast("date"))


def with_etl_metadata(
    df: DataFrame,
    order_by: Sequence[str] | None = None,
    id_name: str = "row_id",
    date_name: str = "etl_date",
) -> DataFrame:
    """row_id + etl_date, the reference's universal output stamp.
    ``order_by=None`` -> fast (unstable) ids, else dense deterministic ids.
    """
    df = with_dense_id(df, order_by, id_name) if order_by else with_fast_id(df, id_name)
    return with_etl_date(df, date_name)
