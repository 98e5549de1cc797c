"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (zip_with / aggregate), fully JVM-side.

No Python UDF and no MLlib dependency: at 100 TB the embedding column stays
in Tungsten rows and the dot products run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_away(col: Column, decimals: int = 6) -> Column:
    """Half-away-from-zero rounding of the BINARY double, in primitive IEEE
    ops both engines evaluate identically: sign * floor(|x| * 10^d + 0.5).
    Design notes: docs/DESIGN.md#vectors-round-half-away"""
    s = F.lit(float(10**decimals))
    mag = F.floor(F.abs(col) * s + F.lit(0.5)) / s
    signed = F.when(col < 0, -mag).otherwise(mag)
    return F.when(
        F.isnan(col) | (F.abs(col) * s >= F.lit(float(2**63))), col
    ).otherwise(signed)


def duck_round_sql(expr: str, decimals: int = 6) -> str:
    """DuckDB SQL twin of :func:`round_half_away` — the identical IEEE ops
    on the identical double, so the two engines can never disagree at a
    representation midpoint the way ROUND vs F.round do."""
    s = f"{10**decimals}.0"
    mag = f"floor(abs({expr}) * {s} + 0.5) / {s}"
    return (
        f"(CASE WHEN isnan({expr}) OR abs({expr}) * {s} >= {float(2**63)!r} "
        f"THEN {expr} "
        f"WHEN {expr} < 0 THEN -({mag}) ELSE {mag} END)"
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision (left-to-right fold — deterministic
    summation order, unlike a shuffle-order-dependent SUM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Raw cosine — UNDEFINED (ANSI divide-by-zero) when either norm is 0.
    Callers must exclude NULL/zero-norm vectors first; every operator in
    ``operators.similarity`` does (filter ``norm > 0`` at norm-compute
    time), so one dirty embedding cannot abort a corpus-scale job."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine rounded for deterministic cross-engine comparison AND
    deterministic top-k tie-breaking (rank on the rounded value).
    Portable rounding — see :func:`round_half_away`."""
    return round_half_away(cosine(a, b), decimals)


def cosine_rounded_prenorm(
    a: Column, b: Column, norm_a: Column, norm_b: Column, decimals: int = 6
) -> Column:
    """:func:`cosine_rounded` with the norms supplied as columns.

    HOF folds run OUTSIDE whole-stage codegen, so per-PAIR work dominates
    similarity joins; computing each vector's norm once per ROW before the
    join and passing it here cuts the per-pair folds from three to one
    (~2x measured on the near-dup query). Bit-identical to cosine_rounded:
    the norm is the same left-to-right fold + sqrt, just hoisted."""
    return round_half_away(dot(a, b) / (norm_a * norm_b), decimals)
