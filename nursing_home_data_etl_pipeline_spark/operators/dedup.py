"""Deduplication operators (north star), five cost/recall points: exact
hash-groupBy; MinHash+LSH banding (the 100 TB near-dup path — no O(n^2)
pair join); 60-bit SimHash with banded Hamming search; exact Jaccard over
an inverted-index join with a hot-shingle cap; embedding near-dup in
:mod:`.similarity`. Every hash is md5-derived (bit-identical anywhere),
never murmur3; MinHash is Kirsch-Mitzenmacher double hashing with exact
<2^53 arithmetic. Full module rationale: docs/DESIGN.md#dedup-module."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalize_text, words
from ..functions.vectors import round_half_away


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(id, shingle) long table of distinct word-k-grams. Design notes:
    docs/DESIGN.md#dedup-shingle-table"""
    # Normalize ONCE into a projected column, filter on that, then shingle
    # the bound attribute — repeating normalize_text in the filter and the
    # shingler would run the regex chain twice per row.
    base = (
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
        .filter(F.col("_norm").isNotNull() & (F.col("_norm") != ""))
    )
    norm = F.col("_norm")
    # word count = spaces + 1 on the collapsed text — no array needed
    nw = F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    # Overlapping k-gram extraction in ONE codegen'd regex pass (replaces
    # the interpreted transform+slice HOF, r15): lookahead captures k
    # words, the match consumes one word+space so the scan steps word
    # start to word start (mid-word retries only occur where <k words
    # remain, where the lookahead fails anyway); the sentinel trailing
    # space keeps the LAST word consumable (k=1 needs it). Multiset
    # equality vs the HOF reference: test_shingle_table_matches_hof_reference.
    pat = rf"(?=((?:\S+ ){{{k - 1}}}\S+))\S+ "
    shingles = F.when(nw < k, F.array(norm)).otherwise(
        F.array_distinct(
            F.regexp_extract_all(F.concat(norm, F.lit(" ")), F.lit(pat), 1)
        )
    )
    return base.select(F.col(id_col), F.explode(shingles).alias("_shingle"))

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on the normalized-content fingerprint: keeps the min-id
    row per fingerprint. min_by keeps it a single hash aggregate (one
    shuffle on the fingerprint — never a window over the whole corpus).
    Design notes: docs/DESIGN.md#dedup-exact-dedup"""
    keyed = df.withColumn("_fp", fingerprint(F.col(text_col)))
    checked_id = F.when(F.col(id_col).isNotNull(), F.col(id_col)).otherwise(
        F.raise_error(
            F.lit(
                "exact_dedup: NULL id; the keep-one rule (min id per "
                "fingerprint) and the NULL-text pass-through both need a "
                "non-null id — filter or key NULL-id rows upstream"
            )
        ).cast(df.schema[id_col].dataType)
    )
    # ONE scan, ONE shuffle: NULL-text rows take a per-row sentinel
    # group key (chr(0)-prefixed id, uncollidable with md5 hex) and ride
    # the same aggregate — the old union branch re-read the corpus.
    group_key = F.coalesce(
        F.col("_fp"), F.concat(F.lit("\x00row\x00"), checked_id.cast("string"))
    )
    others = [c for c in df.columns if c != id_col]
    row = F.struct(*[F.col(c).alias(c) for c in others])
    return (
        keyed.groupBy(group_key.alias("_k"))
        .agg(
            F.min(checked_id).alias(id_col),
            F.min_by(row, checked_id).alias("_r"),
        )
        .select(
            F.col(id_col),
            *[F.col("_r").getField(c).alias(c) for c in others],
        )
        .select(*df.columns)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


#: Largest prime below 2^48 — the modulus of the double-hashing family.
MINHASH_P = 281474976710597

#: Default stop-shingle guard for ngram_jaccard_pairs: shingles appearing
#: in more than this many documents are dropped from PAIRING (still count
#: in set sizes). Exposed as a constant so the DuckDB oracle twin
#: (plans.queries_northstar) mirrors the same cap.
HOT_SHINGLE_CAP = 1000


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-document MinHash signature: hash ``s`` of a shingle is ``(h1 +
    s*h2) mod MINHASH_P`` where h1/h2 are the two 48-bit halves of one md5
    digest (Kirsch-Mitzenmacher double hashing — one digest instead of
    ``num_hashes``); the signature is the per-hash MIN over the document's
    distinct word-k-gram shingles. Output: (id_col, mh_0..mh_{n-1}) as
    longs. s*h2 < 2^52 for s < 16, so the arithmetic never overflows a
    64-bit integer (num_hashes is capped accordingly). Design notes:
    docs/DESIGN.md#dedup-minhash-signatures"""
    if num_hashes > 16:
        raise ValueError("num_hashes > 16 would overflow the 2^53 bound")
    sh = shingle_table(
        df.filter(F.col(id_col).isNotNull()), text_col, id_col, shingle_k
    )
    m = F.md5("_shingle")
    hashed = sh.select(
        id_col,
        F.conv(F.substring(m, 1, 12), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(m, 13, 12), 16, 10).cast("long").alias("_h2"),
    )
    # String-expr construction for the same py4j reason as
    # simhash_signatures (one parse per aggregate, not ~6 Column calls).
    aggs = [
        F.expr(f"min((_h1 + {s} * _h2) % {MINHASH_P}) AS mh_{s}")
        for s in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; documents agreeing on ALL rows of any band
    become a candidate pair. Jaccard ~ (1/bands)^(bands/num_hashes) is the
    ~50%-recall threshold (12 hashes / 4 bands -> ~0.63).

    Implementation: unpivot to (band_idx, band_key) and self-join on the
    band bucket — only colliding pairs materialize, never the n^2 grid.
    Output: distinct (id_a, id_b) with id_a < id_b.
    """
    buckets = _band_buckets(signatures, id_col, num_hashes, bands)
    return _band_self_join(buckets, id_col).distinct()


def _band_self_join(buckets: DataFrame, id_col: str, *extra) -> DataFrame:
    """Self-join an (id, band, key, ...) bucket table on the band bucket
    with ``id_a < id_b`` — only colliding pairs materialize, never the n^2
    grid. ``extra`` columns (expressions over the ``a``/``b`` aliases) ride
    along; shared by the MinHash and SimHash banders."""
    a, b = buckets.alias("a"), buckets.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *extra,
    )


def _band_buckets(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, key) bucket table from a signature frame. ``bands`` must
    divide ``num_hashes``: silent floor division would ignore the trailing
    hashes (changing recall), and bands > num_hashes would degenerate to
    zero-row bands whose md5('') key collides EVERYTHING — an O(n^2) pair
    grid, or for decontaminate a scrub that drops the whole corpus."""
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must be a positive divisor of num_hashes={num_hashes}"
        )
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("key"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Cross-corpus near-dup removal: drop training documents that LSH-
    collide with ANY benchmark document — the train/test contamination
    scrub of an LLM data pipeline.
    Design notes: docs/DESIGN.md#dedup-decontaminate"""
    t_sig = minhash_signatures(train, text_col, id_col, num_hashes, shingle_k)
    b_keyed = benchmark.select(
        F.monotonically_increasing_id().alias(id_col), F.col(text_col)
    )
    b_sig = minhash_signatures(b_keyed, text_col, id_col, num_hashes, shingle_k)
    t_buckets = _band_buckets(t_sig, id_col, num_hashes, bands)
    b_buckets = _band_buckets(b_sig, id_col, num_hashes, bands).select("band", "key")
    contaminated = (
        t_buckets.join(F.broadcast(b_buckets), on=["band", "key"], how="left_semi")
        .select(id_col)
        .distinct()
    )
    return train.join(contaminated, on=id_col, how="left_anti")


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """End-to-end MinHash LSH near-dup candidates.

    Signatures are cached: the LSH band self-join consumes them twice, and
    exchange reuse is not guaranteed under AQE. One row per document —
    small; at extreme corpus sizes persist to disk instead. The cache
    outlives this call because the RETURNED plan executes over it; its
    cleanup is deliberately left to Spark's LRU storage eviction (a
    long-lived service would checkpoint and own the lifecycle).
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).cache()
    return lsh_candidate_pairs(sig, id_col, num_hashes, bands)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit long


def hex_to_bigint_sql(expr: str, start: int = 1, n_chars: int = 15) -> str:
    """SQL text turning ``n_chars`` hex chars of ``expr`` (1-based
    ``start``) into a BIGINT via digit arithmetic — the portable stand-in
    for ``conv()``, which DuckDB lacks. The single source of this expansion:
    the simhash token hash and the minhash h1/h2 oracles all build on it."""
    return "( " + " + ".join(
        f"(CAST(instr('0123456789abcdef', substr({expr}, {start + i}, 1)) AS BIGINT)"
        f" - 1) * CAST({16 ** (n_chars - 1 - i)} AS BIGINT)"
        for i in range(n_chars)
    ) + " )"


#: Engine-portable token hash: interpret the first 15 hex chars of md5 as a
#: 60-bit integer via digit arithmetic (no conv(): DuckDB lacks it).
_TOKEN_HASH_SQL = hex_to_bigint_sql("md5({col})")


def token_hash_sql(col: str) -> str:
    """SQL text for the 60-bit portable token hash (same string runs in
    Spark SQL and DuckDB — identical semantics guaranteed by construction)."""
    return _TOKEN_HASH_SQL.format(col=col)


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """60-bit SimHash over the document's distinct words: bit j of the
    signature is set iff the sum over tokens of (2*bit_j(h(token))-1) > 0.

    Plan shape: explode distinct words -> one hash aggregate with 60
    conditional-sum columns -> rebuild the signature in a single project.
    """
    # The aggregate emits reserved internals b0..b59 and n alongside
    # id_col; an id_col with one of those names would make the signature
    # rebuild's references ambiguous at analysis (ADVICE r15).
    reserved = {"n"} | {f"b{j}" for j in range(SIMHASH_BITS)}
    if id_col in reserved:
        raise ValueError(
            f"simhash_signatures: id_col {id_col!r} collides with the "
            "aggregate's internal columns (b0..b59, n); rename it upstream"
        )
    # NULL/blank texts emit no signature (n blank docs would simhash-pair
    # O(n^2); blanks are exact_dedup's job), NULL-id docs excluded (GROUP
    # BY would chimera-merge them) — same contracts as minhash_signatures.
    norm = normalize_text(F.col(text_col))
    df = df.filter(
        norm.isNotNull() & (norm != "") & F.col(id_col).isNotNull()
    )
    # words(): blank-safe tokenizer (trim+split injected a phantom ''
    # token whose md5 voted in all 60 bit sums — docs/DESIGN.md#dedup-
    # module). Hash via the JVM conv() intrinsic, 2x the instr() digit
    # form the oracle keeps (DuckDB lacks conv; equality unit-pinned).
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(words(F.lower(F.col(text_col))))
        ).alias("_tok"),
    ).withColumn(
        "_h", F.conv(F.substring(F.md5("_tok"), 1, 15), 16, 10).cast("long")
    )
    # SQL strings, not Column objects (~1.3 s of py4j per build otherwise,
    # r15), and BRANCH-FREE: Σ(±1) > 0 ⟺ 2*Σbit_j > n, so each update is
    # a shift+mask add instead of a CASE (1.6 -> 1.0 s, bit-identical).
    bit_sums = [
        F.expr(f"sum(shiftright(_h, {j}) & 1) AS b{j}")
        for j in range(SIMHASH_BITS)
    ] + [F.expr("count(1) AS n")]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sig_sql = "CAST(" + " + ".join(
        f"(CASE WHEN 2 * b{j} > n THEN CAST({2 ** j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    ) + " AS BIGINT)"
    return agg.select(F.col(id_col), F.expr(sig_sql).alias("simhash"))


def simhash_near_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Hamming-near pairs via banding (pigeonhole: distance <= bands-1
    guarantees some band matches; with max_hamming < bands recall is exact).
    Self-join on (band_idx, band_bits), verify with bit_count(xor).
    """
    if bands < 1 or SIMHASH_BITS % bands != 0:
        # Same guard class as lsh_candidate_pairs: a non-divisor silently
        # leaves SIMHASH_BITS % bands high bits in NO band (breaking the
        # pigeonhole recall guarantee), and bands > SIMHASH_BITS gives
        # zero-bit bands where EVERY doc collides — the full n^2 grid.
        raise ValueError(
            f"bands must be a divisor of SIMHASH_BITS={SIMHASH_BITS}; "
            f"got {bands}"
        )
    bits_per = SIMHASH_BITS // bands
    mask = (1 << bits_per) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"(simhash div {2 ** (b * bits_per)}) % {mask + 1}").alias("key"),
        )
        for b in range(bands)
    ]
    buckets = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return (
        _band_self_join(
            buckets,
            id_col,
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    hot_shingle_cap: int = HOT_SHINGLE_CAP,
) -> DataFrame:
    """Exact Jaccard similarity over word-k-gram shingle sets, computed only
    for pairs sharing >= 1 shingle (inverted-index self-join). Design
    notes: docs/DESIGN.md#dedup-ngram-jaccard-pairs"""
    # cache: four consumers (sizes, doc-freq, both join sides); distinct()
    # because exact Jaccard COUNTS — duplicated doc rows must pay the one
    # set-dedup exchange: docs/DESIGN.md#dedup-ngram-jaccard-pairs.
    sh = (
        shingle_table(df, text_col, id_col, shingle_k)
        .withColumnRenamed("_shingle", "s")
        .distinct()
        .cache()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    doc_freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    cold = sh.join(
        F.broadcast(doc_freq.filter(F.col("df") > hot_shingle_cap)), "s", "left_anti"
    )
    a, b = cold.alias("a"), cold.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # sizes is one row per document — NOT broadcastable at corpus scale;
    # plain equi-joins let AQE pick broadcast only when it actually fits.
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            # portable rounding: jaccard is a ratio of COUNTS, exactly the
            # class where F.round's repr-based HALF_UP diverges from
            # DuckDB's binary ROUND at 7-decimal midpoints (41/640 —
            # round-8 hunt); see functions.vectors.round_half_away
            "jaccard",
            round_half_away(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
