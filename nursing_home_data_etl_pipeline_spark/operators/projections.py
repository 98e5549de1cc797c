"""Projection operators (SURVEY.md §2.2 P4-P8), incl. the reference's
name-predicate projection (P7: keep columns whose NAME matches keywords —
how ``nh-etl-provider-transform.py:68-82`` splits the provider frame).
Name inspection is driver-side metadata; the result is one Catalyst
Project that prunes the parquet scan."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

#: Keyword families used by the provider transform (provider-transform.py:68-82).
STAFFING_KEYWORDS = ("staffing", "hours_per", "turnover", "case_mix", "adjusted")
RATING_KEYWORDS = ("rating", "footnote")
SURVEY_KEYWORDS = (
    "rating_cycle",
    "health_deficiency",
    "revisit_score",
    "total_weighted_health_survey_score",
)


def select_columns(df: DataFrame, columns: Sequence[str], strict: bool = True) -> DataFrame:
    """P4-P6: explicit projection. ``strict=False`` skips absent columns
    (dynamic-schema tolerance, matching the reference's header-driven model).
    """
    if strict:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            raise ValueError(f"projection references absent columns: {missing}")
        return df.select(*columns)
    return df.select(*[c for c in columns if c in df.columns])


def select_columns_matching(
    df: DataFrame,
    keywords: Sequence[str],
    always_include: Sequence[str] = (),
    sort_output: bool = True,
) -> DataFrame:
    """P7: keep columns whose name contains any keyword (substring match,
    names already normalized lower-case), plus ``always_include`` (the PK).

    ``sort_output=True`` emits columns in sorted name order so the output
    schema is deterministic regardless of input column order — required for
    stable golden hashes (SURVEY.md §7.3 hard part d); the reference instead
    inherits source order (provider-transform.py:68-82).
    """
    keep = [c for c in always_include if c in df.columns]
    keep += [
        c
        for c in df.columns
        if c not in keep and any(k in c for k in keywords)
    ]
    if sort_output:
        keep = sorted(keep)
    return df.select(*keep)


def drop_columns_if_present(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P8: drop denormalized/PII columns where present
    (provider-transform.py:31,70,75,82,85,105; quality-transform.py:34-35).
    Spark's ``drop`` already ignores absent names; the explicit filter keeps
    the emitted plan free of no-op references.
    """
    present = [c for c in columns if c in df.columns]
    return df.drop(*present) if present else df
