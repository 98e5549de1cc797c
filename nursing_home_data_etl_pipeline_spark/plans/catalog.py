"""Registry mapping query names -> (Spark callable, DuckDB oracle SQL).
Driver contract (``__spark_entry__.py``): callable(spark, sf_dir) ->
DataFrame; oracle = ANSI SQL over the same parquet views. The driver
hashes column-name-sorted values, so computed columns are aliased and
float aggregates rounded IDENTICALLY on both sides."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry {name!r}")
        if fn.__name__ != name:  # r14: a helper def between decorator and
            # query def silently became the entry — make that impossible
            raise ValueError(
                f"catalog entry {name!r} must register a function of the "
                f"same name, got {fn.__name__!r}")
        _REGISTRY[name] = CatalogEntry(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def tag_union(df: DataFrame, variant: str, types: dict, **cols) -> DataFrame:
    """Pad one branch of a tagged-union query to the shared schema: named
    columns pass through, the rest NULL-fill at the declared type. The
    repeating select scaffolding of every multi-variant catalog entry."""
    from pyspark.sql import functions as F

    unknown = set(cols) - set(types)
    if unknown:  # a typoed kwarg would otherwise NULL-fill silently
        raise ValueError(f"tag_union: kwargs not in types: {sorted(unknown)}")
    return df.select(
        F.lit(variant).alias("variant"),
        *[
            (cols[k] if k in cols else F.lit(None).cast(t)).alias(k)
            for k, t in types.items()
        ],
    )


def entries() -> dict[str, CatalogEntry]:
    return dict(_REGISTRY)


def queries() -> dict[str, SparkQuery]:
    return {n: e.spark for n, e in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {n: e.oracle for n, e in _REGISTRY.items() if e.oracle is not None}
