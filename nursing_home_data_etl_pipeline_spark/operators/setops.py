"""Set operators (SURVEY.md §2.8 — absent from the reference).

Thin, name-safe wrappers: always union BY NAME (positional union is the
classic silent-corruption bug when schemas drift), SQL-semantics
intersect/except (distinct) plus the multiset variants.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, allow_missing_columns: bool = False) -> DataFrame:
    """UNION ALL by column name."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs
    )


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """SQL UNION (dedup) — one extra shuffle over union_all."""
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL INTERSECT (distinct semantics)."""
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (distinct semantics)."""
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
