"""Count-Min Sketch and friends — mergeable sublinear-state sketches: a
d x w counter table built with ONE hash aggregate (no UDF, no driver
counting), ``estimate >= true count`` with error <= eN/w at confidence
1-(1/2)^d; sketches merge by summing counters, so per-partition/per-day
sketches roll up without re-reading raw data. Bucket hashing is
md5-derived via conv(), never murmur3 — reproducible from the spec alone.
Full module rationale: docs/DESIGN.md#sketches-module."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_might_contain",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "hll_partial",
    "hll_rollup",
    "kll_partial",
    "kll_rollup_quantiles",
    "theta_partial",
    "theta_rollup",
    "theta_set_estimates",
]


def _bucket_sql(item_sql: str, row: int, width: int) -> str:
    """SQL text of the bucket of ``item_sql`` under hash row ``row``:
    first 12 hex chars of md5(row|item) mod width (48 hash bits >> any
    sane width, negligible mod bias). String form = one parse per probe
    vs ~8 py4j calls (r15); chr(0) spells the NUL sentinel the parser
    can't hold in a literal. Design: docs/DESIGN.md#sketches--bucket"""
    safe = f"coalesce({item_sql}, concat(chr(0), '<null>'))"
    return (
        f"CAST(CAST(conv(substring(md5(concat('{row}|', {safe})), 1, 12),"
        f" 16, 10) AS BIGINT) % {width} AS INT)"
    )


def _row_bucket_explode(item_sql: str, depth: int, width: int) -> Column:
    """``explode(array(struct(row, bucket)...))`` over the ``depth`` hash
    rows as ONE parsed expression — shared by cms_build and cms_estimate."""
    structs = ", ".join(
        f"struct({r} AS row, {_bucket_sql(item_sql, r, width)} AS bucket)"
        for r in range(depth)
    )
    return F.expr(f"explode(array({structs}))")


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a CMS over ``df[item_col]`` (one occurrence per input row;
    pre-weight upstream). ``item_col`` must be a TOP-LEVEL column name —
    it is backtick-quoted whole, so a dotted name means a literal column,
    never a struct-field path (ADVICE r15; same contract in cms_estimate).
    Output (row, bucket, cnt), at most depth*width rows; plan = one
    Expand (depth copies) + one hash aggregate with map-side partials
    before the single shuffle."""
    item_sql = f"CAST(`{item_col.replace('`', '``')}` AS STRING)"
    rows = _row_bucket_explode(item_sql, depth, width).alias("rb")
    return (
        df.select(rows)
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        # (depth, width) ride as column metadata so estimate/merge detect a
        # parameter mismatch (wrong-width probes can UNDER-estimate, round-8
        # hunt); metadata survives select/parquet round-trips.
        .agg(
            F.count(F.lit(1)).alias(
                "cnt", metadata={"cms_depth": depth, "cms_width": width}
            )
        )
    )


def _pair_params(
    frame: DataFrame, col: str, names: tuple, given: tuple, defaults: tuple,
    caller: str, hazard: str,
) -> tuple:
    """Reconcile embedded parameter-pair metadata with caller parameters:
    metadata is authoritative when present — omitted params resolve from
    it, explicit conflicts raise, a PARTIAL pair raises rather than
    half-skipping (round-9 ADVICE); metadata-less sketches use the
    parameters / build defaults."""
    meta = frame.schema[col].metadata if col in frame.columns else {}
    vals = tuple(meta.get(n) for n in names)
    if (vals[0] is None) != (vals[1] is None):
        raise ValueError(
            f"{caller}: sketch metadata is partial "
            f"({names[0]}={vals[0]}, {names[1]}={vals[1]}) — both keys "
            "must be present together or absent together"
        )
    if vals[0] is not None and any(
        g is not None and g != v for g, v in zip(given, vals)
    ):
        raise ValueError(
            f"{caller}: sketch was built with {names[0]}={vals[0]}, "
            f"{names[1]}={vals[1]} but got {given[0]}, {given[1]} — {hazard}"
        )
    return tuple(
        v if v is not None else (g if g is not None else d)
        for v, g, d in zip(vals, given, defaults)
    )


_CMS_KEYS = ("cms_depth", "cms_width")


def _cms_params(
    sketch: DataFrame, depth: int | None, width: int | None, caller: str
) -> tuple[int, int]:
    return _pair_params(
        sketch, "cnt", _CMS_KEYS, (depth, width), (4, 1024), caller,
        "a mismatched probe addresses wrong counters and can UNDER-estimate",
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counters add.
    Embedded (depth, width) metadata must agree when both sides carry it
    (summing counters across different geometries is meaningless); the
    merged sketch keeps the metadata."""
    # each side validated ATOMICALLY first: a partial pair raised nowhere
    # before and propagated into the merged sketch, making every later
    # cms_estimate raise far from the cause (round-9 review)
    none2 = (None, None)
    ga = _pair_params(a, "cnt", _CMS_KEYS, none2, none2, "cms_merge", "")
    gb = _pair_params(b, "cnt", _CMS_KEYS, none2, none2, "cms_merge", "")
    if None not in ga and None not in gb and ga != gb:
        raise ValueError(
            f"cms_merge: geometry mismatch — a is {ga}, b is {gb}"
        )
    meta = dict(zip(_CMS_KEYS, ga if None not in ga else gb)) \
        if (None not in ga or None not in gb) else {}
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt", metadata=meta))
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point-query each DISTINCT probe row: estimate = MIN over the d hash
    rows of the addressed counter (absent = 0). ``item_col`` must be a
    TOP-LEVEL column name (backtick-quoted whole — see cms_build). The
    depth*width sketch side always broadcasts; the items side streams — a
    10^9-row candidate list is a map-side join + small aggregate, never a
    corpus shuffle. Design notes: docs/DESIGN.md#sketches-cms-estimate"""
    depth, width = _cms_params(cms, depth, width, "cms_estimate")
    clash = {"row", "bucket", "cnt", "rb", "est"} & set(items.columns)
    if clash:
        raise ValueError(f"items columns collide with CMS internals: {clash}")
    item_sql = f"CAST(`{item_col.replace('`', '``')}` AS STRING)"
    # Three Datasets, not five (r16): the probe struct joins by its FIELDS
    # (no flattening projection) and the absent-counter zero rides inside
    # the aggregate (min(coalesce(cnt, 0)) == fillna(0) then min) — each
    # dropped op was a full re-analysis of the probe-side tree.
    probes = items.select(
        "*",
        _row_bucket_explode(item_sql, depth, width).alias("rb"),
    )
    joined = probes.join(
        F.broadcast(cms),
        (F.col("rb.row") == F.col("row")) & (F.col("rb.bucket") == F.col("bucket")),
        "left",
    )
    return (
        joined.groupBy(*items.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Mergeable Datasketches state (HLL / KLL / theta) — Spark 4.x built-ins:
# sketch each shard/day ONCE, answer rollups by MERGING partials (one
# shuffle of sketch bytes, not rows) — docs/DESIGN.md#sketches-module.
# ---------------------------------------------------------------------------


def _fold_binary(sketch_col: str, merge_fn: str) -> Column:
    """Fold a grouped collection of binary sketches with a pairwise merge
    function via the higher-order ``reduce`` — used for families (KLL)
    that ship pairwise merges but no union aggregate. Sketch lists are
    tiny (#partials per group), so the collect_list never approaches row
    scale. Design notes: docs/DESIGN.md#sketches--fold-binary"""
    # backtick-quote the identifier (doubling embedded backticks): the raw
    # interpolation broke on any column name needing quoting (round-9 review)
    q = f"`{sketch_col.replace('`', '``')}`"
    return F.expr(
        f"""reduce(
              slice(collect_list({q}), 2, 2147483646),
              try_element_at(collect_list({q}), 1),
              (acc, x) -> {merge_fn}(acc, x))"""
    )


def hll_partial(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog partial sketch of ``item_col`` (binary column
    ``hll_sketch``). lgk=12 -> 4 KiB registers, ~1.6% rsd. Build once per
    shard/day; roll up later with :func:`hll_rollup`."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(item_col).cast("string"), lgk).alias("hll_sketch")
    )


def hll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge partial HLL sketches up to a coarser grouping; output keeps the
    merged binary (``hll_sketch``) for further rollups plus the point
    estimate (``distinct_est`` long)."""
    merged = F.hll_union_agg(sketch_col, True)
    return df.groupBy(*group_cols).agg(
        merged.alias("hll_sketch"),
    ).select(
        *group_cols,
        "hll_sketch",
        F.hll_sketch_estimate("hll_sketch").alias("distinct_est"),
    )


def kll_partial(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-group KLL quantile partial sketch of ``value_col`` (binary column
    ``kll_sketch``). k=200 -> ~1.65% rank error, a few KB of state."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll_sketch"
        )
    )


def kll_rollup_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Merge partial KLL sketches to a coarser grouping and read quantiles
    off the merged sketch: output ``q_<percent>`` double per requested
    quantile. KLL has no union aggregate in Spark, so the fold is the
    higher-order reduce over the group's partials (cheap: #partials per
    group, not #rows)."""
    folded = _fold_binary(sketch_col, "kll_sketch_merge_double").alias("_merged")
    out = df.groupBy(*group_cols).agg(folded)
    cols = [
        # a group whose every value was NULL yields an EMPTY (non-NULL)
        # sketch buffer, and get_quantile on an empty sketch raises
        # KLL_INVALID_INPUT_SKETCH_BUFFER instead of returning NULL —
        # quantile-of-nothing is NULL, matching percentile()
        F.expr(
            f"CASE WHEN _merged IS NULL OR kll_sketch_get_n_double(_merged) = 0 "
            f"THEN NULL ELSE kll_sketch_get_quantile_double(_merged, {q}) END"
        ).alias(
            # 0.5 -> q_5, 0.95 -> q_95; any residual dot (q=1.0, float
            # noise) becomes an underscore so the name stays selectable
            # without backticks.
            f"q_{str(q).replace('0.', '').replace('.', '_')}"
        )
        for q in quantiles
    ]
    return out.select(*group_cols, *cols)


def theta_partial(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    lg_nom_entries: int = 12,
) -> DataFrame:
    """Per-group theta partial sketch (binary column ``theta_sketch``).
    Unlike HLL, theta sketches also support intersection/difference
    (:func:`theta_set_estimates`) — cohort overlap at sketch cost."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(item_col).cast("string"), lg_nom_entries).alias(
            # lgk rides along so a rollup with a smaller value — which
            # silently degrades the precision the partials paid state for —
            # is loud instead (round-9 review; same pattern as cms/bloom)
            "theta_sketch", metadata={"theta_lgk": lg_nom_entries}
        )
    )


def theta_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "theta_sketch",
    lg_nom_entries: int | None = None,
) -> DataFrame:
    """Merge partial theta sketches to a coarser grouping; keeps the merged
    binary plus ``distinct_est``. ``lg_nom_entries`` normally resolves from
    the metadata :func:`theta_partial` embeds; an explicit conflicting
    value raises (the union CAPS nominal entries, so a smaller value
    silently degrades the precision the partials paid state for)."""
    meta = df.schema[sketch_col].metadata if sketch_col in df.columns else {}
    mlgk = meta.get("theta_lgk")
    if mlgk is not None and lg_nom_entries is not None and lg_nom_entries != mlgk:
        raise ValueError(
            f"theta_rollup: partials were built with lg_nom_entries={mlgk} "
            f"but got {lg_nom_entries} — a smaller union cap silently "
            "degrades the precision the partials paid state for"
        )
    lgk = mlgk if mlgk is not None else (
        lg_nom_entries if lg_nom_entries is not None else 12
    )
    return df.groupBy(*group_cols).agg(
        F.theta_union_agg(sketch_col, lgk).alias(
            "theta_sketch", metadata={"theta_lgk": lgk}
        ),
    ).select(
        *group_cols,
        "theta_sketch",
        F.theta_sketch_estimate("theta_sketch").alias("distinct_est"),
    )


def theta_set_estimates(a: Column, b: Column) -> list[Column]:
    """Set-algebra estimates between two theta sketch columns:
    ``[union_est, intersection_est, a_minus_b_est]`` (all long). The piece
    HLL cannot do — e.g. \"users in cohort A but never in cohort B\" from
    per-cohort sketches alone, no raw-data join."""
    return [
        F.theta_sketch_estimate(F.theta_union(a, b)).alias("union_est"),
        F.theta_sketch_estimate(F.theta_intersection(a, b)).alias("intersection_est"),
        F.theta_sketch_estimate(F.theta_difference(a, b)).alias("a_minus_b_est"),
    ]


# ---------------------------------------------------------------------------
# Bloom filter as a DataFrame (word-indexed bitmap) — membership pre-filter
# ---------------------------------------------------------------------------


def _bloom_probes(item: Column, n_bits: int, k: int) -> Column:
    """Array of k (word, mask) probe structs for ``item``: bit position j =
    pmod(xxhash64(item, seed=j), n_bits), split into a 64-bit word index and
    an in-word mask. Pure JVM hash/bit expressions."""
    probes = []
    for j in range(k):
        pos = F.pmod(F.xxhash64(item, F.lit(j)), F.lit(n_bits))
        probes.append(
            F.struct(
                (pos / 64).cast("long").alias("word"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
                ).alias("mask"),
            )
        )
    return F.array(*probes)


def bloom_build(
    df: DataFrame, item_col: str, n_bits: int = 1 << 23, k: int = 5
) -> DataFrame:
    """Build a Bloom filter over ``df[item_col]`` as a (word long, bits long)
    DataFrame — at most ``n_bits/64`` rows regardless of input size.
    Design notes: docs/DESIGN.md#sketches-bloom-build"""
    item = F.col(item_col).cast("string")
    return (
        df.filter(item.isNotNull())
        .select(F.explode(_bloom_probes(item, n_bits, k)).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        # (n_bits, k) metadata, like cms_build: a build/probe geometry
        # mismatch moves probe positions — FALSE NEGATIVES, the one error
        # a Bloom filter promises never to make (round-9 review)
        .agg(F.bit_or("p.mask").alias(
            "bits", metadata={"bloom_n_bits": n_bits, "bloom_k": k}
        ))
    )


def bloom_probe_local(
    bits_rows,
    df: DataFrame,
    item_col: str,
    n_bits: int = 1 << 23,
    k: int = 5,
    out_col: str = "might_contain",
) -> DataFrame:
    """Row-local Bloom probe against a DRIVER-HELD bitmap (the rows of
    ``bloom_build(...).collect()``) embedded as ONE literal long array:
    zero joins and zero exchanges on the probed side, vs. the k chained
    broadcast joins of :func:`bloom_might_contain`. Only for bitmaps small
    enough to live in the plan (n_bits/64 longs; ~8 KB at 2^16 bits) —
    the DataFrame probe remains the scale path for multi-GB filters.
    Caller owns the (n_bits, k) geometry match (same-constants call site);
    probe positions and NULL semantics are byte-identical by construction
    (same ``_bloom_probes``, same isNotNull gate)."""
    n_words = n_bits // 64
    words = [0] * n_words
    for r in bits_rows:
        words[int(r[0])] = int(r[1])
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    item = F.col(item_col).cast("string")
    hit = F.forall(
        _bloom_probes(item, n_bits, k),
        lambda p: F.element_at(arr, (p["word"] + 1).cast("int"))
        .bitwiseAND(p["mask"])
        != 0,
    )
    # NULL items probe to FALSE (never "maybe") — same rationale as
    # bloom_might_contain's gate.
    return df.withColumn(out_col, item.isNotNull() & hit)


def bloom_might_contain(
    bloom: DataFrame,
    df: DataFrame,
    item_col: str,
    n_bits: int | None = None,
    k: int | None = None,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append boolean ``out_col``: true iff every probe bit of the item is
    set in ``bloom``. No false negatives; FPs at the filter's FPP.
    ``n_bits``/``k`` resolve from bloom_build's embedded metadata;
    conflicting explicit values raise (a mismatched probe makes false
    NEGATIVES); metadata-less bitmaps use the parameters / defaults.
    Design notes: docs/DESIGN.md#sketches-bloom-might-contain"""
    n_bits, k = _pair_params(
        bloom, "bits", ("bloom_n_bits", "bloom_k"), (n_bits, k),
        (1 << 23, 5), "bloom_might_contain",
        "mismatched probe positions turn true members into FALSE NEGATIVES",
    )
    internals = {"_probes", out_col}
    for j in range(k):
        internals |= {f"_w{j}", f"_m{j}", f"_b{j}"}
    clash = internals & set(df.columns)
    if clash:
        raise ValueError(f"df columns collide with bloom internals: {clash}")
    item = F.col(item_col).cast("string")
    out = df.select("*", _bloom_probes(item, n_bits, k).alias("_probes"))
    hits = []
    for j in range(k):
        word_j, mask_j = f"_w{j}", f"_m{j}"
        bloom_j = bloom.select(
            F.col("word").alias(word_j), F.col("bits").alias(f"_b{j}")
        )
        out = out.withColumns(
            {
                word_j: F.col("_probes")[j]["word"],
                mask_j: F.col("_probes")[j]["mask"],
            }
        ).join(F.broadcast(bloom_j), word_j, "left")
        hits.append(
            F.col(f"_b{j}").isNotNull()
            & (F.col(f"_b{j}").bitwiseAND(F.col(mask_j)) != 0)
        )
    all_hit = hits[0]
    for h in hits[1:]:
        all_hit = all_hit & h
    # NULL items probe to FALSE (never "maybe"): xxhash64 would otherwise
    # hash the bare seed and give NULLs a stable — and likely set — position.
    all_hit = item.isNotNull() & all_hit
    return out.select(*df.columns, all_hit.alias(out_col))
