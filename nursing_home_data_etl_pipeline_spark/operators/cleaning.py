"""Universal cleaning operators (SURVEY.md §2.2 P1-P3, §2.6 F1-F3):
column-name normalization (``nh-etl-universal-cleaning.py:35-39``),
case-insensitive semantic rename map (:23-30,46-52), whole-row trim
(:41-44). Deliberate difference (reference bug B7): the reference loops
withColumnRenamed per column — O(columns) nested plan nodes; every
operator here emits ONE select/toDF — constant-depth plan at any width."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def col_exact(name: str):
    """Column reference by exact name — backtick-quoted so raw headers
    containing ``.`` (or other specials) are not parsed as struct access."""
    return F.col("`" + name.replace("`", "``") + "`")


#: CMS source name -> warehouse name, as in nh-etl-universal-cleaning.py:23-30.
DEFAULT_RENAME_MAP: dict[str, str] = {
    "cms_certification_number_ccn": "facility_number",
    "provider_name": "facility_name",
    "provider_address": "facility_address",
    "provider_type": "facility_type",
    "deficiency_tag_number": "deficiency_tag",
    "scope_severity_code": "severity_level",
}


def normalize_name(name: str) -> str:
    """Normalize one column name — exact reference semantics
    (nh-etl-universal-cleaning.py:37): strip, lower, ``" " / - .`` each
    become ``_``, parentheses are REMOVED (not replaced)."""
    out = name.strip().lower()
    out = out.replace("(", "").replace(")", "")
    for ch in (" ", "/", "-", "."):
        out = out.replace(ch, "_")
    # Final strip: paren removal can re-expose trailing whitespace the
    # initial strip couldn't see (e.g. "0\r)" -> "0\r"). The reference
    # stops after the first strip and would keep the dirty tail.
    return out.strip()


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P1: rename every column to its normalized form (single plan node).

    Raises on post-normalization collisions (e.g. ``"a b"`` and ``"a_b"``)
    instead of silently producing a duplicate-name frame.
    """
    cleaned = [normalize_name(c) for c in df.columns]
    dupes = {c for c in cleaned if cleaned.count(c) > 1}
    if dupes:
        raise ValueError(f"column-name normalization collides on {sorted(dupes)}")
    return df.toDF(*cleaned)


def rename_columns(df: DataFrame, rename_map: dict[str, str] | None = None) -> DataFrame:
    """P2: case-insensitive semantic rename (nh-etl-universal-cleaning.py:46-52).

    Keys are matched against ``lower(strip(col))``; absent keys are ignored.
    """
    rename_map = DEFAULT_RENAME_MAP if rename_map is None else rename_map
    wanted = {k.lower().strip(): v for k, v in rename_map.items()}
    new_names = [wanted.get(c.lower().strip(), c) for c in df.columns]
    dupes = {c for c in new_names if new_names.count(c) > 1}
    if dupes:
        # e.g. both 'provider_name' and 'facility_name' present while the
        # map renames provider_name -> facility_name: toDF would silently
        # build a duplicate-name frame that fails with AMBIGUOUS_REFERENCE
        # (or worse, picks positionally) far from the cause.
        raise ValueError(f"rename produces duplicate column name(s) {sorted(dupes)}")
    if new_names == df.columns:
        return df
    return df.toDF(*new_names)


def trim_all(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """P3/F1: trim whitespace on every (or the given) string column —
    StringType ONLY (the reference's all-string ingest trims everything,
    nh-etl-universal-cleaning.py:41-44; F.trim would cast typed columns).
    Explicit non-string names are left untouched; absent names RAISE
    instead of silently trimming nothing. One Project node."""
    string_cols = {
        f.name for f in df.schema.fields if f.dataType.typeName() == "string"
    }
    if columns is not None:
        missing = set(columns) - set(df.columns)
        if missing:
            raise ValueError(f"trim_all: columns not in frame: {sorted(missing)}")
        targets = set(columns) & string_cols
    else:
        targets = string_cols
    return df.select(
        *[
            F.trim(col_exact(c)).alias(c) if c in targets else col_exact(c).alias(c)
            for c in df.columns
        ]
    )


def cast_all_to_string(df: DataFrame) -> DataFrame:
    """Untyped-ingest parity: the reference reads CSV with no inferSchema so
    every source column is StringType (nh-etl-universal-cleaning.py:75).
    Casting a typed frame to all-string reproduces that data model.
    """
    return df.select(*[col_exact(c).cast("string").alias(c) for c in df.columns])


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """F3: typed-cast escape hatch (column -> Spark SQL type name) —
    promotes string staging columns to native types for aggregation and
    pushdown. Absent cast keys RAISE (trim_all's contract): a typo'd name
    must fail here at the cause, not downstream as string aggregation."""
    missing = set(casts) - set(df.columns)
    if missing:
        raise ValueError(f"cast_columns: columns not in frame: {sorted(missing)}")
    return df.select(
        *[
            col_exact(c).cast(casts[c]).alias(c) if c in casts else col_exact(c).alias(c)
            for c in df.columns
        ]
    )


def promote_types(
    df: DataFrame,
    candidates: tuple[str, ...] = ("bigint", "double", "date", "timestamp"),
    null_token: str = "",
) -> DataFrame:
    """Post-hoc type promotion for untyped (all-string) staging tables.
    Design notes: docs/DESIGN.md#cleaning-promote-types"""
    string_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    if not string_cols:
        return df
    numeric = {"bigint", "double", "decimal", "int", "float"}
    # The token rides as a BOUND LITERAL (F.lit), never interpolated into
    # SQL text: string-splicing needed quote AND backslash escaping (Spark
    # treats backslash as an escape in string literals), and any missed
    # case corrupted the profiling predicate silently.
    tok = F.lit(null_token)
    aggs = []
    for c in string_cols:
        col = col_exact(c)
        non_null = col.isNotNull() & (col != tok)
        aggs.append(
            F.sum(F.when(non_null, 1).otherwise(0)).alias(f"{c}__n")
        )
        # Leading-zero guard: "015009" (a CMS CCN) parses as 15009 but is an
        # IDENTIFIER — numeric promotion would corrupt it. Any value with a
        # leading zero — including sign-prefixed like "-03" — blocks
        # numeric candidates for the column.
        aggs.append(
            F.sum(
                F.when(non_null & col.rlike("^[+-]?0[0-9]"), 1).otherwise(0)
            ).alias(f"{c}__lz")
        )
        for t in candidates:
            ok = col.try_cast(t).isNotNull()
            if t.split("(")[0] not in numeric:
                # Spark parses '015009' as a DATE (year 15009); a pure-digit
                # string is never a calendar value.
                ok = ok & ~col.rlike("^[0-9]+$")
            if t == "date":
                # try_cast accepts '2023-01-05 10:30:00' (and '2023-01') AS
                # date and TRUNCATES — promoting such columns to date
                # destroys the time component. Only pure yyyy-MM-dd values
                # qualify; datetime strings fall through to timestamp.
                ok = ok & col.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
            if t == "timestamp":
                # Guard: try_cast FABRICATES the day for partial dates
                # ('2023-01'); require a full y-m-d, optional time part
                # (date -> midnight is the lossless MIXED-column widening).
                ok = ok & col.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T].*)?$")
            aggs.append(
                F.sum(F.when(non_null & ok, 1).otherwise(0)).alias(f"{c}__{t}")
            )
    profile = df.agg(*aggs).collect()[0].asDict()
    casts: dict[str, str] = {}
    for c in string_cols:
        n = profile[f"{c}__n"]
        if not n:
            continue
        for t in candidates:
            if t.split("(")[0] in numeric and profile[f"{c}__lz"]:
                continue
            if profile[f"{c}__{t}"] == n:
                casts[c] = t
                break
    if not casts:
        return df
    # Plain cast (not try_cast) on the NULLIF'd column: profiling proved
    # every remaining value parses, so a cast failure here means the input
    # changed between profile and materialization — fail loudly.
    def promote(c: str):
        return F.nullif(col_exact(c), tok).cast(casts[c]).alias(c)

    return df.select(
        *[promote(c) if c in casts else col_exact(c).alias(c) for c in df.columns]
    )


def clean_table(
    df: DataFrame,
    rename_map: dict[str, str] | None = None,
) -> DataFrame:
    """The full universal-cleaning transform: normalize names -> semantic
    rename -> trim values (nh-etl-universal-cleaning.py:81-83). Metadata
    stamping (row_id/etl_date) is separate — see :mod:`.ids`.
    """
    return trim_all(rename_columns(normalize_column_names(df), rename_map))
