"""As-of (time-travel) join — Spark lacks it natively. For each left row
(key, ts): the right row with the greatest right-ts <= left-ts (backward;
ties inclusive). Union+window trick, NOT per-group merge_asof: tag sides,
union, carry the latest right ROW forward as ONE struct via
``last(struct, ignorenulls=True)`` (independent columns would tear on
legitimate NULLs — ADVICE r1); right sorts before left at equal ts. ONE
shuffle, no Python — survives 100 TB where applyInPandas OOMs on hot
keys."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_orderable(dt: T.DataType) -> bool:
    """Whether a type can be a sort key: maps (and anything containing
    them) cannot (Catalyst INVALID_ORDERING_TYPE)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _is_orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. ``value_cols`` are the right-side columns to
    attach (default: all non-key, non-ts columns); each appears in the
    output as ``<col><suffix>``, plus ``<right_ts><suffix>`` for the
    matched timestamp. Unmatched left rows keep nulls.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in {*keys, right_ts}]
    )
    if "__rts" in value_cols:
        raise ValueError("value column name '__rts' is reserved by asof_join")
    if right_ts in value_cols:
        raise ValueError(
            f"{right_ts!r} is already emitted as {right_ts}{suffix}; listing "
            "it in value_cols would duplicate that output column"
        )
    # Output-name collisions fail HERE, not as an AMBIGUOUS_REFERENCE far
    # downstream: the select happily emits two columns with one name (e.g.
    # chaining two asof_joins, or a left frame already carrying a
    # '<col><suffix>' column).
    emitted = [f"{c}{suffix}" for c in [*value_cols, right_ts]]
    clashes = (set(emitted) & set(left.columns)) | {
        n for n in emitted if emitted.count(n) > 1
    }
    if clashes:
        raise ValueError(
            f"asof_join output name collision on {sorted(clashes)!r}; "
            "rename the left columns or pass a different suffix"
        )

    # NULL-key/NULL-ts RIGHT rows can never satisfy the asof predicate —
    # drop up front; NULL LEFT rows emit with a null match naturally
    # (docs/DESIGN.md#asof-null-and-ties).
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())

    # Struct types derived by analysis only — no job runs here.
    lrow_type = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType
    rrow_type = right.select(
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("s")
    ).schema["s"].dataType

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("_rrow"),
    )
    unioned = lhs.unionByName(rhs)
    # _rord: deterministic tiebreaker for duplicate (key, ts) right rows,
    # built from the ORDERABLE value columns only (maps can't sort; full
    # ties differ only in non-orderable payloads) —
    # docs/DESIGN.md#asof-null-and-ties.
    rrow_fields = {f.name: f.dataType for f in rrow_type.fields}
    ord_cols = [
        F.col("_rrow").getField(c)
        for c in [*value_cols, "__rts"]
        if _is_orderable(rrow_fields[c])
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"), *ord_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE last() over the struct: the struct is non-null for every right row
    # (even when its fields are null), so the matched row's values and
    # timestamp always come from the SAME right row and real nulls survive.
    carried = unioned.select(
        "_side",
        "_lrow",
        F.last(F.col("_rrow"), ignorenulls=True).over(w).alias("_rrow"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col("_lrow").getField(c).alias(c) for c in left.columns],
        *[F.col("_rrow").getField(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col("_rrow").getField("__rts").alias(f"{right_ts}{suffix}"),
    )
